"""Continuous rollup (hypertable/continuous-aggregate analog): the
incrementally-maintained table must equal the batch recomputation
after every refresh, including across a second catch-up run."""

from factstore_spark import FactInput, StartPosition
from factstore_spark.streaming.rollup import read_rollup, start_continuous_rollup

STORE = "rollup-store"


def _batch_truth(fs, spark):
    from pyspark.sql import functions as F

    return {
        (r.bucket_start, r.key): r.n
        for r in fs.facts_df(STORE)
        .groupBy(
            F.window("appended_at", "1 minute").alias("w"), F.col("type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("bucket_start"), F.col("type").alias("key"), "n")
        .collect()
    }


def _refresh(fs, spark, tmp_path):
    q = start_continuous_rollup(
        fs.subscribe_stream(STORE, StartPosition.Beginning()),
        out_dir=str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    out = read_rollup(spark, str(tmp_path / "rollup"))
    return {(r.bucket_start, r.key): r.n for r in out.collect()}


def test_rollup_matches_batch_and_updates_incrementally(fs, spark, tmp_path):
    fs.create(STORE)
    fs.append(STORE, [FactInput(type="A", subject="s1"),
                      FactInput(type="A", subject="s2"),
                      FactInput(type="B", subject="s3")])
    got = _refresh(fs, spark, tmp_path)
    assert got == _batch_truth(fs, spark)
    assert sum(got.values()) == 3

    # later appends: the SAME checkpoint resumes and upserts only the
    # changed cells; the published table equals the full recomputation
    fs.append(STORE, [FactInput(type="A", subject="s4"),
                      FactInput(type="C", subject="s5")])
    got2 = _refresh(fs, spark, tmp_path)
    assert got2 == _batch_truth(fs, spark)
    assert sum(got2.values()) == 5
