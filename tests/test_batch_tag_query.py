"""Set-at-a-time tag-query evaluation (batch_matches_tag_query) must
agree with the scalar matcher on every row — including sliced batches
(non-zero array offset) and null/empty tag maps. Pure pyarrow, no Spark."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from factstore_spark.model import (
    TagOnlyQueryItem,
    TagQuery,
    TagTypeItem,
    batch_matches_tag_query,
    fact_matches_tag_query,
)

SCHEMA = pa.schema(
    [
        ("type", pa.string()),
        ("tags", pa.map_(pa.string(), pa.string())),
    ]
)


def _batch(rows):
    return pa.RecordBatch.from_pylist(
        [{"type": t, "tags": list((tags or {}).items()) if tags is not None else None} for t, tags in rows],
        schema=SCHEMA,
    )


def _scalar_any(rows, query):
    return any(fact_matches_tag_query(t, dict(tags or {}), query) for t, tags in rows)


Q_TAG_ONLY = TagQuery([TagOnlyQueryItem({"env": "prod", "app": "web"})])
Q_TAG_TYPE = TagQuery([TagTypeItem({"A", "B"}, {"env": "prod"})])
Q_OR = TagQuery(
    [TagOnlyQueryItem({"k1": "v1"}), TagTypeItem({"C"}, {"k2": "v2"})]
)


@pytest.mark.parametrize("query", [Q_TAG_ONLY, Q_TAG_TYPE, Q_OR])
def test_matches_scalar_on_fixed_rows(query):
    rows = [
        ("A", {"env": "prod", "app": "web"}),
        ("B", {"env": "prod"}),
        ("C", {"k2": "v2", "x": "y"}),
        ("D", {"k1": "v1"}),
        ("E", {}),
        ("F", None),
        ("A", {"env": "dev", "app": "web"}),
    ]
    for lo in range(len(rows)):
        sub = rows[lo:]
        assert batch_matches_tag_query(_batch(sub), query) == _scalar_any(sub, query)


def test_sliced_batch_offsets():
    rows = [
        ("X", {"no": "match"}),
        ("A", {"env": "prod", "app": "web"}),
        ("X", {"no": "match"}),
    ]
    b = _batch(rows)
    assert batch_matches_tag_query(b.slice(1, 1), Q_TAG_ONLY) is True
    assert batch_matches_tag_query(b.slice(2, 1), Q_TAG_ONLY) is False
    assert batch_matches_tag_query(b.slice(0, 1), Q_TAG_ONLY) is False


def test_empty_batch():
    assert batch_matches_tag_query(_batch([]), Q_TAG_ONLY) is False


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.one_of(
                st.none(),
                st.dictionaries(
                    st.sampled_from(["k1", "k2", "env"]),
                    st.sampled_from(["v1", "v2", "prod"]),
                    max_size=3,
                ),
            ),
        ),
        max_size=12,
    )
)
def test_property_matches_scalar(rows):
    for query in (Q_TAG_ONLY, Q_TAG_TYPE, Q_OR):
        assert batch_matches_tag_query(_batch(rows), query) == _scalar_any(rows, query)
