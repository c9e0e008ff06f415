"""Derived tag index: indexed tag queries must agree with the scan-path
finder on randomized corpora, go stale safely, and refresh."""

import random

from factstore_spark import FactInput, TagOnlyQueryItem, TagQuery, TagTypeItem

STORE = "default-test-store"


def seed_random(fs, rnd, n=120):
    fs.create(STORE)
    keys, vals, types = ["k1", "k2", "k3"], ["", "a", "b"], ["T1", "T2", "T3"]
    batch = [
        FactInput(
            type=rnd.choice(types),
            subject=f"S{i % 7}",
            tags={k: rnd.choice(vals) for k in rnd.sample(keys, rnd.randint(0, 3))},
        )
        for i in range(n)
    ]
    fs.append(STORE, batch)


def queries_under_test():
    return [
        TagQuery([TagOnlyQueryItem({"k1": "a"})]),
        TagQuery([TagOnlyQueryItem({"k1": "a", "k2": "b"})]),
        TagQuery([TagTypeItem({"T1", "T3"}, {"k3": ""})]),
        TagQuery(
            [
                TagOnlyQueryItem({"k2": "a"}),
                TagTypeItem({"T2"}, {"k1": "b", "k3": "a"}),
            ]
        ),
    ]


def test_indexed_tag_query_matches_scan_path(fs):
    rnd = random.Random(42)
    seed_random(fs, rnd)
    stats = fs.build_tag_index(STORE)
    assert stats["built"]
    for q in queries_under_test():
        scan = fs.find_by_tag_query(STORE, q)
        indexed = fs.find_by_tag_query_indexed(STORE, q)
        assert [f.id for f in indexed.facts] == [f.id for f in scan.facts], q


def test_stale_index_falls_back_to_scan(fs):
    rnd = random.Random(7)
    seed_random(fs, rnd, n=30)
    fs.build_tag_index(STORE)
    # New append makes the index stale; finder must still be correct.
    fs.append(STORE, FactInput(type="T1", subject="SX", tags={"k1": "a"}))
    q = TagQuery([TagOnlyQueryItem({"k1": "a"})])
    scan = fs.find_by_tag_query(STORE, q)
    indexed = fs.find_by_tag_query_indexed(STORE, q)
    assert [f.id for f in indexed.facts] == [f.id for f in scan.facts]
    # Rebuild restores the indexed path.
    fs.build_tag_index(STORE)
    indexed2 = fs.find_by_tag_query_indexed(STORE, q)
    assert [f.id for f in indexed2.facts] == [f.id for f in scan.facts]


def test_incremental_refresh_covers_new_commits(fs):
    """refresh() after appends must (a) run incrementally (not a full
    rebuild), (b) make the index fresh, (c) keep indexed == scan."""
    rnd = random.Random(7)
    seed_random(fs, rnd, n=60)
    assert fs.build_tag_index(STORE)["built"]

    fs.append(
        STORE,
        [
            FactInput(type="T9", subject="S-new", tags={"k1": "a", "k9": "z"})
            for _ in range(5)
        ],
    )
    res = fs.refresh_tag_index(STORE)
    assert res["built"] and res.get("mode") == "incremental"
    # fresh again: second refresh is a no-op
    res2 = fs.refresh_tag_index(STORE)
    assert res2.get("reason") == "fresh"

    for q in queries_under_test() + [TagQuery([TagOnlyQueryItem({"k9": "z"})])]:
        scan = [f.id for f in fs.find_by_tag_query(STORE, q).facts]
        idx = [f.id for f in fs.find_by_tag_query_indexed(STORE, q).facts]
        assert idx == scan


def test_refresh_without_existing_index_builds(fs):
    rnd = random.Random(9)
    seed_random(fs, rnd, n=20)
    res = fs.refresh_tag_index(STORE)
    assert res["built"] and res.get("mode") != "incremental"


def test_empty_store_index(fs):
    fs.create(STORE)
    assert fs.build_tag_index(STORE) == {"built": False, "rows": 0}
