"""Continuous rollup (hypertable/continuous-aggregate analog): the
incrementally-maintained table must equal the batch recomputation
after every refresh, including across a second catch-up run — and a
refresh must NOT rewrite (or even touch) date partitions that contain
no changed cells."""

import datetime
import hashlib
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from factstore_spark import FactInput, StartPosition
from factstore_spark.streaming.rollup import (
    current_manifest,
    read_rollup,
    start_continuous_rollup,
)

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


def _ts(day, minute):
    return datetime.datetime(2024, 1, day, 10, minute, 0)


def _write_src(spark, src_dir, rows):
    spark.createDataFrame(
        [Row(ts=t, k=k, v=v) for t, k, v in rows]
    ).coalesce(1).write.mode("append").parquet(src_dir)


def _partition_digest(out_dir, relpath):
    """(filename, md5, size) for every data file of one published
    date-partition directory."""
    root = os.path.join(out_dir, relpath)
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out.append(
                    (os.path.relpath(p, root), hashlib.md5(fh.read()).hexdigest())
                )
    return sorted(out)


def _file_refresh(spark, src_dir, tmp_path):
    stream = (
        spark.readStream.schema("ts timestamp, k string, v long").parquet(src_dir)
    )
    q = start_continuous_rollup(
        stream,
        out_dir=str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        time_col="ts",
        key_col="k",
        aggs=[("count", "*", "n"), ("sum", "v", "v_sum"), ("max", "v", "v_max")],
        available_now=True,
    )
    q.awaitTermination(120)


def test_rollup_with_watermark_matches_batch_when_no_late_data(spark, tmp_path):
    """The state-bounding watermark must not change results for
    in-order data (late arrivals are the only trade)."""
    src = str(tmp_path / "src")
    _write_src(
        spark,
        src,
        [(_ts(1, 0), "A", 2), (_ts(1, 0), "A", 3), (_ts(1, 9), "B", 4)],
    )
    stream = spark.readStream.schema("ts timestamp, k string, v long").parquet(src)
    q = start_continuous_rollup(
        stream,
        out_dir=str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        time_col="ts",
        key_col="k",
        aggs=[("count", "*", "n"), ("sum", "v", "v_sum")],
        watermark="10 minutes",
        available_now=True,
    )
    q.awaitTermination(120)
    got = {
        (str(r.bucket_start), r.key): (r.n, r.v_sum)
        for r in read_rollup(spark, str(tmp_path / "rollup")).collect()
    }
    assert got == {
        ("2024-01-01 10:00:00", "A"): (2, 5),
        ("2024-01-01 10:09:00", "B"): (1, 4),
    }


def test_refresh_rewrites_only_changed_date_partitions(spark, tmp_path):
    """O(changed cells) write amplification: after a second batch that
    only touches day 2, day 1's published partition directory is the
    SAME directory with byte-identical files."""
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "rollup")
    _write_src(
        spark,
        src,
        [(_ts(1, 0), "A", 10), (_ts(1, 0), "A", 5), (_ts(1, 5), "B", 7),
         (_ts(2, 0), "A", 1)],
    )
    _file_refresh(spark, src, tmp_path)
    m1 = current_manifest(out_dir)
    assert set(m1) == {"2024-01-01", "2024-01-02"}
    d1_digest = _partition_digest(out_dir, m1["2024-01-01"])
    assert d1_digest

    # second batch: day 2 only
    _write_src(spark, src, [(_ts(2, 0), "A", 3), (_ts(2, 7), "C", 2)])
    _file_refresh(spark, src, tmp_path)
    m2 = current_manifest(out_dir)

    # untouched day-1 partition: same directory, same bytes
    assert m2["2024-01-01"] == m1["2024-01-01"]
    assert _partition_digest(out_dir, m2["2024-01-01"]) == d1_digest
    # day-2 partition was rewritten into a new version
    assert m2["2024-01-02"] != m1["2024-01-02"]

    # and the published table (count + sum + max cells) still equals
    # the batch recomputation
    truth = {
        (r.bucket_start, r.key): (r.n, r.v_sum, r.v_max)
        for r in spark.read.parquet(src)
        .groupBy(F.window("ts", "1 minute").alias("w"), "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v_sum"),
            F.max("v").alias("v_max"),
        )
        .select(
            F.col("w.start").alias("bucket_start"), F.col("k").alias("key"),
            "n", "v_sum", "v_max",
        )
        .collect()
    }
    got = {
        (r.bucket_start, r.key): (r.n, r.v_sum, r.v_max)
        for r in read_rollup(spark, out_dir)
        .select("bucket_start", "key", "n", "v_sum", "v_max")
        .collect()
    }
    assert got == truth
    assert sum(n for n, _, _ in got.values()) == 6


def test_vacuum_drops_only_aged_unreferenced_versions(spark, tmp_path):
    import os
    import time

    from factstore_spark.streaming.rollup import vacuum_rollup

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "rollup")
    _write_src(spark, src, [(_ts(1, 0), "A", 1)])
    _file_refresh(spark, src, tmp_path)
    _write_src(spark, src, [(_ts(1, 1), "A", 2)])
    _file_refresh(spark, src, tmp_path)
    versions = [n for n in os.listdir(out_dir) if n.startswith("v=")]
    assert len(versions) == 2  # one superseded, one live

    # inside the grace window: nothing removed
    assert vacuum_rollup(out_dir, retain_seconds=3600)["removed"] == []
    # age everything: only the unreferenced version goes
    for n in versions:
        old = time.time() - 7200
        os.utime(os.path.join(out_dir, n), (old, old))
    res = vacuum_rollup(out_dir, retain_seconds=3600)
    live = set(res["live"])
    assert len(res["removed"]) == 1 and res["removed"][0] not in live
    # published table still reads fine
    assert read_rollup(spark, out_dir).count() == 2


def test_unpublished_version_dir_is_invisible_and_vacuumable(spark, tmp_path):
    """Crash between version-dir write and manifest publish: readers
    keep the previous state (the manifest is the ONLY publish step),
    and the orphan dir ages out via vacuum without ever being read."""
    import os
    import time

    from factstore_spark.streaming.rollup import vacuum_rollup

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "rollup")
    _write_src(spark, src, [(_ts(1, 0), "A", 1)])
    _file_refresh(spark, src, tmp_path)
    before = {
        (str(r.bucket_start), r.key): r.n
        for r in read_rollup(spark, out_dir).collect()
    }
    m_before = current_manifest(out_dir)

    # simulate the crash: a fully-written version dir, no manifest swap
    orphan = os.path.join(out_dir, "v=99-deadbeef")
    os.makedirs(os.path.join(orphan, "bucket_date=2024-01-03"))
    with open(
        os.path.join(orphan, "bucket_date=2024-01-03", "part-0.parquet"), "wb"
    ) as fh:
        fh.write(b"not even parquet")  # never read, so never parsed

    assert current_manifest(out_dir) == m_before
    after = {
        (str(r.bucket_start), r.key): r.n
        for r in read_rollup(spark, out_dir).collect()
    }
    assert after == before  # reader state unchanged by the orphan

    old = time.time() - 7200
    os.utime(orphan, (old, old))
    res = vacuum_rollup(out_dir, retain_seconds=3600)
    assert "v=99-deadbeef" in res["removed"]
    assert not os.path.exists(orphan)
