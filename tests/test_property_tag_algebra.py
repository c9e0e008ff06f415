"""Property-based check: the Catalyst predicates in plans/predicates.py
must agree with the pure-Python spec matcher (model.fact_matches_tag_query,
which mirrors MemoryFactStore.kt:302-305) on arbitrary tag/type corpora
and arbitrary tag queries.

One Spark job per example is too slow for hypothesis, so examples are
generated up front and evaluated in a single DataFrame pass per case
batch — the property still covers the full algebra (OR of items, AND of
tags, type membership, presence-only values, missing keys).
"""

import random

from pyspark.sql import functions as F

from factstore_spark.model import (
    TagOnlyQueryItem,
    TagQuery,
    TagTypeItem,
    fact_matches_tag_query,
    fact_matches_tags,
)
from factstore_spark.plans.predicates import tag_query_predicate, tags_all_match

KEYS = ["k1", "k2", "k3"]
VALS = ["", "a", "b"]
TYPES = ["T1", "T2", "T3"]


def random_tags(rnd):
    return {k: rnd.choice(VALS) for k in rnd.sample(KEYS, rnd.randint(0, 3))}


def random_query(rnd) -> TagQuery:
    items = []
    for _ in range(rnd.randint(1, 3)):
        tags = {k: rnd.choice(VALS) for k in rnd.sample(KEYS, rnd.randint(1, 3))}
        if rnd.random() < 0.5:
            items.append(TagOnlyQueryItem(tags))
        else:
            items.append(
                TagTypeItem(set(rnd.sample(TYPES, rnd.randint(1, 3))), tags)
            )
    return TagQuery(items)


def test_tag_query_predicate_matches_spec_matcher(spark):
    rnd = random.Random(1234)
    facts = [
        (i, rnd.choice(TYPES), random_tags(rnd)) for i in range(300)
    ]
    df = spark.createDataFrame(
        facts, "position long, type string, tags map<string,string>"
    ).cache()
    for trial in range(25):
        query = random_query(rnd)
        spark_ids = {
            r.position
            for r in df.filter(tag_query_predicate(query)).select("position").collect()
        }
        spec_ids = {
            pos for pos, t, tags in facts if fact_matches_tag_query(t, tags, query)
        }
        assert spark_ids == spec_ids, f"trial {trial}: query {query}"


def test_tags_all_match_predicate_matches_spec(spark):
    rnd = random.Random(99)
    facts = [(i, random_tags(rnd)) for i in range(300)]
    df = spark.createDataFrame(facts, "position long, tags map<string,string>").cache()
    for trial in range(15):
        wanted = {k: rnd.choice(VALS) for k in rnd.sample(KEYS, rnd.randint(1, 3))}
        spark_ids = {
            r.position
            for r in df.filter(tags_all_match(wanted)).select("position").collect()
        }
        spec_ids = {pos for pos, tags in facts if fact_matches_tags(tags, wanted)}
        assert spark_ids == spec_ids, f"trial {trial}: wanted {wanted}"


def test_tags_all_match_empty_matches_all(spark):
    """Reference fact_matches_tags: empty wanted-tags matches every
    fact. The predicate builder must be total (reduce with a lit(True)
    initializer), not crash — API layers that forbid empty queries
    validate separately."""
    from factstore_spark.plans.predicates import tags_all_match

    df = spark.createDataFrame(
        [({"a": "1"},), ({},), (None,)], "tags map<string,string>"
    )
    assert df.filter(tags_all_match({})).count() == 3
