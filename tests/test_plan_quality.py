"""Plan-quality regression tests: lock in the physical-plan properties
the 100 TB design depends on. These parse `.explain` output — crude but
effective at catching a silently introduced shuffle, a lost pushdown,
or a join that stopped broadcasting."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from factstore_spark import FactInput, ReadDirection
from factstore_spark.queries import REGISTRY

STORE = "default-test-store"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_finder_plan_pushdown_and_topk(fs):
    fs.create(STORE)
    fs.append(STORE, [FactInput(type=f"T{i}", subject=f"S{i%3}") for i in range(20)])
    df = fs.find_by_subject_df(STORE, "S1", limit=5, direction=ReadDirection.BACKWARD)
    plan = plan_of(df)
    # subject filter reaches the parquet scan; limit+order fuse into
    # TakeOrderedAndProject (the limit/reverse-pushdown analog).
    assert "PushedFilters" in plan and "subject" in plan.split("PushedFilters", 1)[1][:200]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle for a point-subject top-k


def test_replay_position_filter_pushdown(fs):
    fs.create(STORE)
    fs.append(STORE, [FactInput(type=f"T{i}", subject="S") for i in range(10)])
    df = fs.facts_df(STORE, max_position=5).filter(F.col("position") > 1)
    plan = plan_of(df)
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "position" in pushed


def test_q3_broadcasts_dimensions(spark):
    df = REGISTRY["q3_top_orders"][0](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not sort-merge at this size


def test_text_ops_are_map_only(spark):
    df = REGISTRY["text_token_stats"][0](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "Exchange" not in plan  # pure projection: no shuffle at all
    assert "WholeStageCodegen" in plan or "Project" in plan


def test_bulk_position_assignment_no_global_sort(spark):
    """The bulk-ingest default position path must stay map-only: no
    Window, no Sort, no Exchange (the old implementation collapsed the
    whole batch onto one partition via row_number over a global order)."""
    from factstore_spark.store import assign_contiguous_positions

    df = spark.range(1000).repartition(8).select(
        F.lit("T").alias("type"), F.col("id").cast("string").alias("subject")
    )
    staged = assign_contiguous_positions(df, base=1_000_000)
    plan = plan_of(staged)
    tree = plan.split("\n\n", 1)[0]  # the operator tree, not the detail dump
    assert "Window" not in plan
    assert "Sort" not in tree
    # the only Exchange allowed is the repartition we asked for in the
    # input plan itself, never one introduced by position assignment
    assert tree.count("Exchange") == 1


def test_embedding_lsh_candidates_are_ids_only(spark):
    """The LSH/IVF candidate dedup must be a HashAggregate over id
    longs — dragging the vectors through the self-join forces a
    sort-based aggregate on array keys and shuffles the payload once
    per band (the measured 10x regression this guards against)."""
    df = REGISTRY["dedup_embedding_lsh"][0](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_pq_probe_join_broadcasts(spark):
    """IVF-PQ: the probe side (queries x probed cells) must broadcast;
    the corpus scan must never shuffle for cell assignment."""
    df = REGISTRY["ann_pq_topk"][0](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_contamination_probe_broadcasts_benchmark(spark):
    """Decontamination: benchmark fingerprints broadcast; the corpus is
    probed map-side, never shuffled."""
    df = REGISTRY["curation_contamination"][0](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_ngrams_uses_take_ordered(spark):
    """Corpus top-k must fuse orderBy+limit into TakeOrderedAndProject
    — never a full global sort of the ngram counts."""
    from factstore_spark.operators.text import top_ngrams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(top_ngrams(docs, n=2, k=20))
    assert "TakeOrderedAndProject" in plan


def test_scan_prunes_columns(spark):
    """A 2-column projection must not read the full fact schema."""
    df = REGISTRY["fs_find_by_tags"][0](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "props" not in read_schema and "value" not in read_schema
