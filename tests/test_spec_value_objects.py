"""Spec value-object invariants, property-based (hypothesis) — the port
of the reference's spec unit tests (SURVEY.md §5.3:
StoreNameTest.kt, LimitTest.kt, TimeRangeTest.kt, FactQueryTest.kt).
Pure Python, no Spark session needed."""

import re
from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from factstore_spark.model import (
    FactInput,
    TagOnlyQueryItem,
    TagQuery,
    TagTypeItem,
    TimeRange,
    fact_matches_tag_query,
    fact_matches_tags,
    validate_limit,
    validate_store_name,
)

# -- StoreName (StoreName.kt:7-9) ------------------------------------------

VALID_NAME = st.from_regex(r"[a-zA-Z]([a-zA-Z0-9_-]{0,100}[a-zA-Z0-9])?", fullmatch=True)


@given(VALID_NAME)
def test_valid_store_names_accepted(name):
    assert validate_store_name(name)


@given(st.text(max_size=40))
@settings(max_examples=200)
def test_store_name_oracle_matches_reference_regex(name):
    """Arbitrary strings: our validator == the reference regex applied
    with fullmatch + length cap."""
    ref = re.compile(r"^[a-zA-Z]([a-zA-Z0-9_-]{0,253}[a-zA-Z0-9])?$|^[a-zA-Z]$")
    expected = len(name) <= 255 and bool(ref.fullmatch(name))
    assert validate_store_name(name) == expected


def test_store_name_edge_cases():
    assert not validate_store_name("abc\n")  # $-anchor trap
    assert not validate_store_name("a" * 256)
    assert validate_store_name("a" * 255)
    assert not validate_store_name("_starts")
    assert not validate_store_name("ends_")
    assert validate_store_name("a-b_c")


# -- Limit (Limit.kt:12-34) -------------------------------------------------


@given(st.integers(min_value=1, max_value=10**9))
def test_positive_limits_pass(n):
    assert validate_limit(n) == n


@given(st.integers(max_value=0))
def test_non_positive_limits_rejected(n):
    with pytest.raises(ValueError):
        validate_limit(n)


def test_none_limit_is_unbounded():
    assert validate_limit(None) is None


# -- TimeRange (TimeRange.kt:5-37) -----------------------------------------

INSTANTS = st.datetimes(
    min_value=datetime(2000, 1, 1),
    max_value=datetime(2100, 1, 1),
).map(lambda d: d.replace(tzinfo=timezone.utc))


@given(INSTANTS, st.timedeltas(min_value=timedelta(microseconds=1), max_value=timedelta(days=999)))
def test_ordered_ranges_accepted(start, delta):
    TimeRange(start=start, end=start + delta)


@given(INSTANTS, st.timedeltas(min_value=timedelta(0), max_value=timedelta(days=999)))
def test_inverted_or_degenerate_ranges_rejected(start, delta):
    """Strictly before, matching TimeRange.kt's require(start.isBefore(end)):
    start == end (delta 0) must raise, like any inverted range."""
    with pytest.raises(ValueError):
        TimeRange(start=start, end=start - delta)


def test_open_bounds_allowed():
    TimeRange()
    TimeRange(start=datetime.now(timezone.utc))
    TimeRange(end=datetime.now(timezone.utc))


# -- FactInput / TagQuery construction (FactQueryTest.kt analog) ------------


@given(st.sampled_from(["", " ", "\t", "  \n"]))
def test_blank_type_and_subject_rejected(blank):
    with pytest.raises(ValueError):
        FactInput(type=blank, subject="S")
    with pytest.raises(ValueError):
        FactInput(type="T", subject=blank)


def test_empty_query_components_rejected():
    with pytest.raises(ValueError):
        TagQuery([])
    with pytest.raises(ValueError):
        TagOnlyQueryItem({})
    with pytest.raises(ValueError):
        TagTypeItem(set(), {"k": "v"})
    with pytest.raises(ValueError):
        TagTypeItem({"T"}, {})


# -- Matcher algebra properties --------------------------------------------

TAGS = st.dictionaries(st.sampled_from("abcde"), st.sampled_from(["", "x", "y"]), max_size=4)


@given(TAGS)
def test_empty_wanted_tags_match_everything(fact_tags):
    assert fact_matches_tags(fact_tags, {})


@given(TAGS, TAGS)
def test_tags_matching_is_subset_semantics(fact_tags, wanted):
    assert fact_matches_tags(fact_tags, wanted) == (
        set(wanted.items()) <= set(fact_tags.items())
    )


@given(TAGS, st.sampled_from(["T1", "T2"]))
@settings(max_examples=100)
def test_query_or_monotonicity(tags, fact_type):
    """Adding an item to a query can only widen the match set."""
    item1 = TagOnlyQueryItem({"a": "x"})
    item2 = TagTypeItem({fact_type}, {"b": "y"})
    one = fact_matches_tag_query(fact_type, tags, TagQuery([item1]))
    both = fact_matches_tag_query(fact_type, tags, TagQuery([item1, item2]))
    assert both or not one  # one => both


def test_as_utc_disambiguates_naive_timestamp_sources():
    """Two naive-timestamp sources with OPPOSITE meanings flow through
    row_to_fact: Spark collect() renders instants as driver-LOCAL wall
    time, pyarrow INT96 reads as UTC wall time. On a UTC host both
    coincide (which is how either bug hides); pin a non-UTC TZ and
    assert each is converted by its own rule."""
    import os
    import time as _time
    from datetime import datetime, timezone

    from factstore_spark.schema import _as_utc

    prev = os.environ.get("TZ")
    os.environ["TZ"] = "Europe/Berlin"  # CET (+1) on the winter date below
    _time.tzset()
    try:
        naive = datetime(2024, 1, 1, 13, 0, 0)
        assert _as_utc(naive, naive_is_local=True) == datetime(
            2024, 1, 1, 12, 0, tzinfo=timezone.utc
        )
        assert _as_utc(naive, naive_is_local=False) == datetime(
            2024, 1, 1, 13, 0, tzinfo=timezone.utc
        )
        aware = datetime(2024, 1, 1, 13, 0, tzinfo=timezone.utc)
        assert _as_utc(aware) == aware
    finally:
        if prev is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev
        _time.tzset()
