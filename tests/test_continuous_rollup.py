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


def _age_tree(path, old):
    """Age EVERY entry under a version dir — vacuum now ages by the
    newest file anywhere in the tree, not the top-level dir alone."""
    for dirpath, dirs, files in os.walk(path, topdown=False):
        for f in files:
            os.utime(os.path.join(dirpath, f), (old, old))
        os.utime(dirpath, (old, old))


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
        _age_tree(os.path.join(out_dir, n), time.time() - 7200)
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

    _age_tree(orphan, time.time() - 7200)
    res = vacuum_rollup(out_dir, retain_seconds=3600)
    assert "v=99-deadbeef" in res["removed"]
    assert not os.path.exists(orphan)


def test_rollup_partition_dates_survive_session_tz_change(spark, tmp_path):
    """bucket_date comes from UTC epoch arithmetic, not session-TZ
    date_format: a stream resumed under a different session timezone
    must keep mapping existing cells to the SAME date partitions, or
    the anti-join misses prior versions and duplicates cells."""
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "rollup")
    # 23:30 UTC — a cell whose local date differs by timezone
    late = datetime.datetime(2024, 1, 1, 23, 30, 0)
    _write_src(spark, src, [(late, "A", 10)])
    _file_refresh(spark, src, tmp_path)
    m1 = current_manifest(out_dir)
    assert set(m1) == {"2024-01-01"}

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")  # UTC+9
    try:
        _write_src(spark, src, [(late, "A", 5)])  # update the SAME cell
        _file_refresh(spark, src, tmp_path)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    m2 = current_manifest(out_dir)
    assert set(m2) == {"2024-01-01"}  # not a phantom 2024-01-02
    rows = read_rollup(spark, out_dir).collect()
    assert len(rows) == 1  # one cell, upserted — no stale duplicate
    assert rows[0].n == 2 and rows[0].v_sum == 15


def test_vacuum_spares_inflight_version_with_fresh_nested_files(spark, tmp_path):
    """An in-flight refresh writes into NESTED bucket_date dirs without
    bumping the version dir's own mtime; vacuum must age by the newest
    file anywhere under the version, not the top-level dir."""
    from factstore_spark.streaming.rollup import vacuum_rollup

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "rollup")
    _write_src(spark, src, [(_ts(1, 0), "A", 1)])
    _file_refresh(spark, src, tmp_path)

    # unpublished in-flight version: top-level dir mtime aged, but a
    # nested partition file is brand new (the long-running write)
    inflight = os.path.join(out_dir, "v=42-inflight")
    nested = os.path.join(inflight, "bucket_date=2024-01-01")
    os.makedirs(nested)
    with open(os.path.join(nested, "part-0.parquet"), "wb") as fh:
        fh.write(b"fresh")
    old = 10_000.0
    os.utime(inflight, (old, old))  # top dir looks ancient

    res = vacuum_rollup(out_dir, retain_seconds=3600)
    assert "v=42-inflight" not in res["removed"]
    assert os.path.exists(inflight)

    # once every nested file is old too, it ages out
    os.utime(os.path.join(nested, "part-0.parquet"), (old, old))
    os.utime(nested, (old, old))
    res2 = vacuum_rollup(out_dir, retain_seconds=3600)
    assert "v=42-inflight" in res2["removed"]


def test_rollup_kept_cells_survive_session_tz_change(spark, tmp_path):
    """The KEPT side of the refresh (prior rows surviving the
    anti-join) must re-derive bucket_date with the same UTC epoch
    arithmetic as the changed side: under a non-UTC session TZ,
    date_format would relabel a 23:30-UTC kept cell into the next
    local date — written to a partition dir the manifest remap never
    covers and silently dropped from the published table."""
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "rollup")
    late = datetime.datetime(2024, 1, 1, 23, 30, 0)
    _write_src(spark, src, [(late, "A", 10)])
    _file_refresh(spark, src, tmp_path)

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")  # UTC+9
    try:
        # a DIFFERENT cell on the same date: cell A must ride the
        # kept path (anti-join keeps it) and stay on 2024-01-01
        _write_src(spark, src, [(late, "B", 5)])
        _file_refresh(spark, src, tmp_path)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    m = current_manifest(out_dir)
    assert set(m) == {"2024-01-01"}
    rows = {r.key: (r.n, r.v_sum) for r in read_rollup(spark, out_dir).collect()}
    assert rows == {"A": (1, 10), "B": (1, 5)}
