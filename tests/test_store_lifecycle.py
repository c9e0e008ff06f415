"""Store lifecycle TCK port (AbstractFactStoreTest.kt:99-132, 1422-1443,
1479-1497; StoreNameTest.kt)."""

import pytest

from factstore_spark import FactInput, FactPayload
from factstore_spark.model import validate_store_name
from factstore_spark.results import (
    FactsFound,
    StoreCreated,
    StoreNameAlreadyExists,
    StoreNotFound,
    StoreRemoved,
)


def test_create_and_find_store(fs):
    res = fs.create("default-test-store")
    assert isinstance(res, StoreCreated)
    assert res.metadata.name == "default-test-store"
    assert fs.exists_by_name("default-test-store")
    assert fs.find_by_name("default-test-store").id == res.metadata.id


def test_create_duplicate_name_rejected(fs):
    fs.create("test")
    res = fs.create("test")
    assert isinstance(res, StoreNameAlreadyExists)


def test_list_all_stores(fs):
    fs.create("store-1")
    fs.create("store-2")
    names = [m.name for m in fs.list_all()]
    assert set(names) == {"store-1", "store-2"}


def test_store_name_validation():
    assert validate_store_name("a")
    assert validate_store_name("store-1")
    assert validate_store_name("A_b-c9")
    assert not validate_store_name("9starts-with-digit")
    assert not validate_store_name("ends-with-dash-")
    assert not validate_store_name("")
    assert not validate_store_name("x" * 256)
    assert validate_store_name("a" + "b" * 254)


def test_invalid_store_name_raises(fs):
    with pytest.raises(ValueError):
        fs.create("-bad")


def test_stores_are_isolated(fs):
    """AbstractFactStoreTest.kt:1422-1443 — same subject, two stores."""
    fs.create("store-1")
    fs.create("store-2")
    fs.append("store-1", FactInput(type="T1", subject="USER:ALICE", payload=FactPayload(b"1")))
    fs.append("store-2", FactInput(type="T2", subject="USER:ALICE", payload=FactPayload(b"2")))
    r1 = fs.find_by_subject("store-1", "USER:ALICE")
    r2 = fs.find_by_subject("store-2", "USER:ALICE")
    assert [f.type for f in r1.facts] == ["T1"]
    assert [f.type for f in r2.facts] == ["T2"]


def test_remove_store(fs):
    """AbstractFactStoreTest.kt:1479-1497."""
    fs.create("store-to-delete")
    fs.append("store-to-delete", FactInput(type="T", subject="S"))
    res = fs.remove("store-to-delete")
    assert isinstance(res, StoreRemoved)
    assert not fs.exists_by_name("store-to-delete")
    assert isinstance(fs.find_by_subject("store-to-delete", "S"), StoreNotFound)
    # Re-creating the name yields an empty store.
    fs.create("store-to-delete")
    res2 = fs.find_by_subject("store-to-delete", "S")
    assert isinstance(res2, FactsFound) and res2.facts == ()


def test_remove_missing_store(fs):
    assert isinstance(fs.remove("non-existing-store"), StoreNotFound)


def test_operations_on_missing_store_return_store_not_found(fs):
    from factstore_spark import FactInput, TimeRange

    assert isinstance(fs.append("non-existing-store", FactInput(type="T", subject="S")), StoreNotFound)
    assert isinstance(fs.find_by_id("non-existing-store", "some-id"), StoreNotFound)
    assert isinstance(fs.find_by_subject("non-existing-store", "S"), StoreNotFound)
    assert isinstance(fs.find_in_time_range("non-existing-store", TimeRange()), StoreNotFound)


def test_register_views_exposes_sql_surface(fs, spark):
    from factstore_spark.model import FactInput

    fs.create("sqlview-store")
    fs.append("sqlview-store", FactInput(type="T", subject="U:1", tags={"env": "prod", "app": "web"}))
    fs.append("sqlview-store", FactInput(type="T", subject="U:2", tags={"env": "dev"}))
    fs.append("sqlview-store", FactInput(type="T", subject="U:3"))

    views = fs.register_views("sqlview-store", prefix="sv")
    assert views == ["sv_facts", "sv_tags"]
    assert spark.sql("SELECT COUNT(*) AS n FROM sv_facts").collect()[0].n == 3
    # tag algebra as plain SQL: AND of two tags via self-join
    got = spark.sql("""
        SELECT f.subject FROM sv_facts f
        JOIN sv_tags a ON a.position = f.position AND a.tag_key = 'env' AND a.tag_value = 'prod'
        JOIN sv_tags b ON b.position = f.position AND b.tag_key = 'app' AND b.tag_value = 'web'
    """).collect()
    assert [r.subject for r in got] == ["U:1"]
    # untagged facts still appear in sv_facts but contribute NULL tag rows
    n_tag_rows = spark.sql("SELECT COUNT(*) AS n FROM sv_tags WHERE tag_key IS NOT NULL").collect()[0].n
    assert n_tag_rows == 3
    # results agree with the native finder
    from factstore_spark.model import TagQuery, TagOnlyQueryItem
    native = fs.find_by_tags("sqlview-store", {"env": "prod", "app": "web"})
    assert [f.subject for f in native.facts] == ["U:1"]

    assert fs.register_views("no-such-store") is None


def test_describe_store_health_card(fs):
    from factstore_spark.results import StoreNotFound

    assert isinstance(fs.describe_store("nope"), StoreNotFound)
    fs.create("desc-store")
    from factstore_spark import FactInput

    fs.append(
        "desc-store",
        [FactInput(type="A", subject="s", tags={"k": "v"}) for _ in range(3)],
    )
    fs.append("desc-store", FactInput(type="B", subject="s2"))
    d = fs.describe_store("desc-store")
    assert d["n_commits"] == 2 and d["n_rows"] == 4
    assert d["n_data_files"] == 2 and d["data_bytes"] > 0
    assert d["head_position"] >= 0
    assert d["compacted_through"] is None
    assert d["commits_since_checkpoint"] == 2
    assert d["tag_index_fresh"] is False  # never built yet

    # compact WITHOUT checkpoint: the log now holds both the original
    # append records and the compaction summary — n_rows must not
    # double-count (ADVICE r4: describe_store reported ~2x here).
    fs.compact("desc-store")
    d_mid = fs.describe_store("desc-store")
    assert d_mid["n_rows"] == 4
    assert d_mid["compacted_through"] is not None

    # a post-compact append lands on top of the compacted total
    fs.append("desc-store", FactInput(type="C", subject="s3"))
    assert fs.describe_store("desc-store")["n_rows"] == 5

    fs.maintain("desc-store")
    d2 = fs.describe_store("desc-store")
    assert d2["tag_index_fresh"] is True
    assert d2["compacted_through"] is not None
    assert d2["n_rows"] == 5


def test_maintain_all_covers_every_store(fs):
    from factstore_spark import FactInput

    fs.create("ma-a")
    fs.create("ma-b")
    fs.append("ma-a", FactInput(type="T", subject="s"))
    fs.append("ma-b", FactInput(type="T", subject="s"))
    stats = fs.maintain_all()
    assert set(stats) >= {"ma-a", "ma-b"}
    for s in ("ma-a", "ma-b"):
        assert stats[s]["compact"].get("compacted") is True
        assert fs.describe_store(s)["tag_index_fresh"] is True


def test_catalog_writer_refuses_unreadable_file(spark, tmp_path):
    """A transiently unreadable/corrupted catalog must never be
    rewritten from an empty view — that would erase every registered
    store. Writers raise; plain readers degrade gracefully."""
    import pytest as _pytest

    from factstore_spark import FactStore

    fs = FactStore(spark, str(tmp_path / "root"))
    fs.create("a")
    fs.create("b")
    path = fs.catalog._path()
    with open(path, "w") as f:
        f.write("{corrupted json")
    assert fs.list_all() == []  # reader view degrades, no crash
    with _pytest.raises(RuntimeError, match="refusing to rewrite"):
        fs.create("c")
    # repair: both original entries still present (file untouched)
    import json as _json

    raw = open(path).read()
    assert raw.startswith("{corrupted")  # writer never clobbered it
