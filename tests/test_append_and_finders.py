"""Append + finder TCK port (AbstractFactStoreTest.kt:135-335, 473-773,
969-1227)."""

import pytest

from factstore_spark import (
    FactInput,
    FactPayload,
    ReadDirection,
    TagOnlyQueryItem,
    TagQuery,
    TagTypeItem,
    TimeRange,
)
from factstore_spark.results import (
    Appended,
    DoesNotExist,
    Exists,
    FactFound,
    FactNotFound,
    FactsFound,
)

STORE = "default-test-store"


def user_input(name: str, role: str, region: str, type_: str = "USER_CREATED") -> FactInput:
    """The canonical TCK generator (AbstractFactStoreTest.kt:65-75)."""
    return FactInput(
        type=type_,
        subject=f"USER:{name.upper()}",
        payload=FactPayload(('{ "username": "%s" }' % name).encode(), format="json"),
        tags={"role": role, "region": region},
    )


@pytest.fixture()
def seeded(fs):
    """fact1=alice(admin,eu), fact2=bob(user,us), fact3=charlie(admin,us)."""
    fs.create(STORE)
    ids = []
    for fi in (
        user_input("Alice", "admin", "eu"),
        user_input("Bob", "user", "us"),
        user_input("Charlie", "admin", "us"),
    ):
        res = fs.append(STORE, fi)
        assert isinstance(res, Appended)
        ids.append(res.fact_ids[0])
    return fs, ids


# -- append basics ----------------------------------------------------------


def test_append_and_read_back_canonical_shape(fs):
    """AbstractFactStoreTest.kt:135-153."""
    fs.create(STORE)
    fi = FactInput(
        type="USER_CREATED",
        subject="USER:ALICE",
        payload=FactPayload(b'{ "username": "Alice" }', format="json"),
        metadata={"test": "123", "loc": "world"},
        tags={"role": "admin", "region": "eu"},
    )
    res = fs.append(STORE, fi)
    assert isinstance(res, Appended) and len(res.fact_ids) == 1
    got = fs.find_by_id(STORE, res.fact_ids[0])
    assert isinstance(got, FactFound)
    f = got.fact
    assert f.type == "USER_CREATED"
    assert f.subject == "USER:ALICE"
    assert f.payload.data == b'{ "username": "Alice" }'
    assert f.payload.format == "json"
    assert f.metadata == {"test": "123", "loc": "world"}
    assert f.tags == {"role": "admin", "region": "eu"}
    assert f.appended_at == res.appended_at


def test_atomic_multi_fact_append_shares_instant_and_orders_ids(fs):
    """AbstractFactStoreTest.kt:423-444; AppendResult.kt:20-29."""
    fs.create(STORE)
    inputs = [user_input(f"U{i}", "user", "us") for i in range(5)]
    res = fs.append(STORE, inputs)
    assert isinstance(res, Appended) and len(res.fact_ids) == 5
    facts = fs.find_in_time_range(STORE, TimeRange()).facts
    assert [f.id for f in facts] == list(res.fact_ids)  # order preserved
    assert {f.appended_at for f in facts} == {res.appended_at}  # shared instant
    assert [f.position for f in facts] == sorted(f.position for f in facts)


def test_subject_is_trimmed(fs):
    fs.create(STORE)
    res = fs.append(STORE, FactInput(type="T", subject="  USER:X  "))
    f = fs.find_by_id(STORE, res.fact_ids[0]).fact
    assert f.subject == "USER:X"


def test_blank_type_or_subject_rejected():
    with pytest.raises(ValueError):
        FactInput(type=" ", subject="S")
    with pytest.raises(ValueError):
        FactInput(type="T", subject="   ")


# -- find_by_id / exists_by_id ---------------------------------------------


def test_find_by_id_found_and_not_found(seeded):
    fs, ids = seeded
    assert isinstance(fs.find_by_id(STORE, ids[1]), FactFound)
    assert isinstance(fs.find_by_id(STORE, "11111111-1111-1111-1111-111111111111"), FactNotFound)


def test_exists_by_id(seeded):
    fs, ids = seeded
    assert isinstance(fs.exists_by_id(STORE, ids[0]), Exists)
    assert isinstance(fs.exists_by_id(STORE, "nope"), DoesNotExist)


# -- find_by_subject --------------------------------------------------------


def test_subject_history_in_position_order(fs):
    """AbstractFactStoreTest.kt:473-506."""
    fs.create(STORE)
    types = ["USER_CREATED", "USER_UPDATED", "USER_LOCKED", "USER_ONBOARDED"]
    for t in types:
        fs.append(STORE, user_input("Alice", "admin", "eu", type_=t))
    res = fs.find_by_subject(STORE, "USER:ALICE")
    assert [f.type for f in res.facts] == types


def test_subject_limit_direction_matrix(fs):
    """Limit applies AFTER direction (AbstractFactStoreTest.kt:509-576)."""
    fs.create(STORE)
    types = ["A", "B", "C", "D"]
    for t in types:
        fs.append(STORE, FactInput(type=t, subject="USER:ALICE"))
    fwd2 = fs.find_by_subject(STORE, "USER:ALICE", limit=2)
    assert [f.type for f in fwd2.facts] == ["A", "B"]  # two oldest
    bwd2 = fs.find_by_subject(STORE, "USER:ALICE", limit=2, direction=ReadDirection.BACKWARD)
    assert [f.type for f in bwd2.facts] == ["D", "C"]  # two newest, newest first
    bwd = fs.find_by_subject(STORE, "USER:ALICE", direction=ReadDirection.BACKWARD)
    assert [f.type for f in bwd.facts] == ["D", "C", "B", "A"]


def test_limit_larger_than_result(seeded):
    """AbstractFactStoreTest.kt:754-773."""
    fs, _ = seeded
    res = fs.find_by_subject(STORE, "USER:ALICE", limit=100)
    assert len(res.facts) == 1


def test_limit_validation(fs):
    fs.create(STORE)
    with pytest.raises(ValueError):
        fs.find_by_subject(STORE, "S", limit=0)
    with pytest.raises(ValueError):
        fs.find_by_subject(STORE, "S", limit=-1)


# -- find_in_time_range (half-open) ----------------------------------------


def test_time_range_half_open_boundaries(seeded):
    """Start inclusive, end EXCLUSIVE at exact fact timestamps
    (AbstractFactStoreTest.kt:203-229)."""
    fs, ids = seeded
    facts = fs.find_in_time_range(STORE, TimeRange()).facts
    t1, t3 = facts[0].appended_at, facts[2].appended_at
    res = fs.find_in_time_range(STORE, TimeRange(start=t1, end=t3))
    assert [f.id for f in res.facts] == [ids[0], ids[1]]  # fact3 excluded


def test_time_range_open_bounds(seeded):
    """AbstractFactStoreTest.kt:232-256."""
    fs, ids = seeded
    facts = fs.find_in_time_range(STORE, TimeRange()).facts
    t2 = facts[1].appended_at
    only_end = fs.find_in_time_range(STORE, TimeRange(end=t2))
    assert [f.id for f in only_end.facts] == [ids[0]]
    only_start = fs.find_in_time_range(STORE, TimeRange(start=t2))
    assert [f.id for f in only_start.facts] == [ids[1], ids[2]]
    unbounded = fs.find_in_time_range(STORE, TimeRange())
    assert len(unbounded.facts) == 3


def test_time_range_limit_direction(seeded):
    """AbstractFactStoreTest.kt:274-335."""
    fs, ids = seeded
    res = fs.find_in_time_range(STORE, TimeRange(), limit=2, direction=ReadDirection.BACKWARD)
    assert [f.id for f in res.facts] == [ids[2], ids[1]]


# -- find_by_tags (AND) -----------------------------------------------------


def test_tags_and_semantics(seeded):
    """AbstractFactStoreTest.kt:596-644; FIXTURES.md §2."""
    fs, ids = seeded
    admins = fs.find_by_tags(STORE, {"role": "admin"})
    assert [f.id for f in admins.facts] == [ids[0], ids[2]]
    admin_eu = fs.find_by_tags(STORE, {"role": "admin", "region": "eu"})
    assert [f.id for f in admin_eu.facts] == [ids[0]]
    asia = fs.find_by_tags(STORE, {"region": "asia"})
    assert asia.facts == ()


def test_tags_limit_direction(seeded):
    fs, ids = seeded
    res = fs.find_by_tags(STORE, {"role": "admin"}, limit=1, direction=ReadDirection.BACKWARD)
    assert [f.id for f in res.facts] == [ids[2]]


def test_empty_value_tag_presence(fs):
    """Tag values may be empty (presence-only) — Fact.kt:200-236."""
    fs.create(STORE)
    res = fs.append(STORE, FactInput(type="T", subject="S", tags={"flag": ""}))
    found = fs.find_by_tags(STORE, {"flag": ""})
    assert [f.id for f in found.facts] == [res.fact_ids[0]]


# -- find_by_tag_query (OR-of-AND algebra) ---------------------------------


def test_tag_query_single_item_matrix(seeded):
    """The 9-case matrix core (AbstractFactStoreTest.kt:969-1108)."""
    fs, ids = seeded
    # TagOnly: role=admin -> alice, charlie
    r = fs.find_by_tag_query(STORE, TagQuery([TagOnlyQueryItem({"role": "admin"})]))
    assert [f.id for f in r.facts] == [ids[0], ids[2]]
    # TagOnly multi-tag AND: role=admin & region=us -> charlie only (spec AND)
    r = fs.find_by_tag_query(
        STORE, TagQuery([TagOnlyQueryItem({"role": "admin", "region": "us"})])
    )
    assert [f.id for f in r.facts] == [ids[2]]
    # TagType: type match + tag match
    r = fs.find_by_tag_query(
        STORE, TagQuery([TagTypeItem({"USER_CREATED"}, {"role": "user"})])
    )
    assert [f.id for f in r.facts] == [ids[1]]
    # TagType: wrong type -> empty
    r = fs.find_by_tag_query(
        STORE, TagQuery([TagTypeItem({"USER_DELETED"}, {"role": "user"})])
    )
    assert r.facts == ()


def test_tag_query_multi_type_or(fs):
    """OR across types within one item (AbstractFactStoreTest.kt:1111-1136)."""
    fs.create(STORE)
    a = fs.append(STORE, user_input("Alice", "admin", "eu", type_="USER_CREATED"))
    b = fs.append(STORE, user_input("Alice", "admin", "eu", type_="USER_LOCKED"))
    fs.append(STORE, user_input("Alice", "admin", "eu", type_="USER_DELETED"))
    r = fs.find_by_tag_query(
        STORE,
        TagQuery([TagTypeItem({"USER_CREATED", "USER_LOCKED"}, {"role": "admin"})]),
    )
    assert [f.id for f in r.facts] == [a.fact_ids[0], b.fact_ids[0]]


def test_tag_query_multi_item_or_union(seeded):
    """OR across items, position-ordered union (AbstractFactStoreTest.kt:1139-1203)."""
    fs, ids = seeded
    r = fs.find_by_tag_query(
        STORE,
        TagQuery(
            [
                TagOnlyQueryItem({"region": "eu"}),   # alice
                TagOnlyQueryItem({"role": "user"}),   # bob
            ]
        ),
    )
    assert [f.id for f in r.facts] == [ids[0], ids[1]]


def test_tag_query_no_match(seeded):
    """AbstractFactStoreTest.kt:1206-1227."""
    fs, _ = seeded
    r = fs.find_by_tag_query(STORE, TagQuery([TagOnlyQueryItem({"role": "nobody"})]))
    assert r.facts == ()


def test_tag_query_validation():
    with pytest.raises(ValueError):
        TagQuery([])
    with pytest.raises(ValueError):
        TagOnlyQueryItem({})
    with pytest.raises(ValueError):
        TagTypeItem(set(), {"a": "b"})
    with pytest.raises(ValueError):
        TagTypeItem({"T"}, {})


def test_payload_format_and_schema_ref_round_trip(fs):
    """Payload hints are pass-through (Fact.kt:98-130)."""
    fs.create(STORE)
    res = fs.append(
        STORE,
        FactInput(
            type="T",
            subject="S",
            payload=FactPayload(b"\x00\x01\xffbinary", format="avro", schema_ref="schemas/v1/T"),
        ),
    )
    f = fs.find_by_id(STORE, res.fact_ids[0]).fact
    assert f.payload.data == b"\x00\x01\xffbinary"
    assert f.payload.format == "avro"
    assert f.payload.schema_ref == "schemas/v1/T"


def test_empty_payload_allowed_at_engine_level(fs):
    fs.create(STORE)
    res = fs.append(STORE, FactInput(type="T", subject="S"))
    f = fs.find_by_id(STORE, res.fact_ids[0]).fact
    assert f.payload.data == b"" and f.payload.format is None
