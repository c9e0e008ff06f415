"""Z-order layout (operators/layout.py): Morton math + the actual
file-stat pruning benefit it exists for."""

import random

from pyspark.sql import functions as F

from factstore_spark.operators.layout import write_zordered, zorder_value


def _py_morton(a: int, b: int) -> int:
    z = 0
    for i in range(21):
        z |= ((a >> i) & 1) << (3 * i) | ((b >> i) & 1) << (3 * i + 1)
    return z


def test_zorder_value_matches_reference_morton(spark):
    rnd = random.Random(9)
    rows = [(rnd.randint(0, (1 << 21) - 1), rnd.randint(0, (1 << 21) - 1)) for _ in range(200)]
    rows += [(0, 0), ((1 << 21) - 1, (1 << 21) - 1), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", zorder_value(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r.z == _py_morton(r.a, r.b), (r.a, r.b)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The point of the op: a day-sorted layout cannot prune a
    user-range predicate at all (every ~2-day file spans the full user
    domain), while the z-ordered layout keeps BOTH columns' per-file
    min/max narrow — fewer candidate files for a narrow-user/any-day
    query, and identical query results."""
    from factstore_spark.queries import load_events

    ev = load_events(spark, "/root/testdata/sf0.01").select(
        "event_id", "user_id", F.expr("ts_ns div 1000 div 86400000000").alias("day")
    )
    n_files = 16
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(ev, ["user_id", "day"], zpath, num_files=n_files)
    (
        ev.repartitionByRange(n_files, F.col("day"), F.col("user_id"))
        .sortWithinPartitions("day", "user_id")
        .write.parquet(spath)
    )

    def candidate_files(path, lo_u, hi_u, lo_d, hi_d):
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
                F.min("day").alias("dlo"), F.max("day").alias("dhi"),
            )
            .collect()
        )
        assert len(stats) == n_files
        return sum(
            1 for r in stats
            if r.uhi >= lo_u and r.ulo <= hi_u and r.dhi >= lo_d and r.dlo <= hi_d
        )

    (ulo, uhi), = [tuple(r) for r in ev.agg(F.min("user_id"), F.max("user_id")).collect()]
    (dlo, dhi), = [tuple(r) for r in ev.agg(F.min("day"), F.max("day")).collect()]
    uw = (uhi - ulo) // 8 or 1
    q = (ulo + 3 * uw, ulo + 4 * uw, dlo, dhi)  # narrow user, ALL days
    z_files = candidate_files(zpath, *q)
    s_files = candidate_files(spath, *q)
    # day-sorted files each span ~the whole user domain: no pruning
    assert s_files == n_files, s_files
    assert z_files < s_files, (z_files, s_files)

    def rows(path):
        return sorted(
            tuple(r) for r in spark.read.parquet(path)
            .filter(
                (F.col("user_id").between(q[0], q[1]))
                & (F.col("day").between(q[2], q[3]))
            ).collect()
        )

    assert rows(zpath) == rows(spath)


def test_zorder_normalization_survives_sentinel_outlier(spark, tmp_path):
    """Equi-depth bucket normalization must be outlier-immune: one
    sentinel id (2^40 'unknown') among small ids would collapse an
    affine min/max domain to bucket 0 everywhere and silently erase
    that dimension's pruning."""
    df = spark.range(20000).select(
        (F.col("id") % 997).alias("a"),
        (F.col("id") % 31 + 19000).alias("b"),
        F.col("id").alias("v"),
    ).union(spark.createDataFrame([(1 << 40, 19010, -1)], "a long, b long, v long"))
    from factstore_spark.operators.layout import candidate_files

    d = str(tmp_path / "z")
    write_zordered(df, ["a", "b"], d, num_files=16)
    n, ca = candidate_files(d, {"a": (100, 200)})
    _, cb = candidate_files(d, {"b": (19010, 19013)})
    assert n == 16 and ca < n and cb < n, (n, ca, cb)
    # and the relayout loses nothing, sentinel row included
    assert spark.read.parquet(d).count() == 20001


def test_zorder_value_clamps_instead_of_wrapping(spark):
    """Values beyond 21 bits must CLAMP to the domain edge — a bare
    mask wraps k and k+2^21 onto identical spread bits, interleaving
    unrelated ranges and silently erasing the layout's pruning."""
    lim = (1 << 21) - 1
    df = spark.createDataFrame(
        [(lim, 0), (lim + 5, 0), ((1 << 22) + 7, 0), (-3, 0), (0, 0)],
        "a long, b long",
    )
    got = {r.a: r.z for r in df.select(
        "a", zorder_value(F.col("a"), F.col("b")).alias("z")).collect()}
    assert got[lim + 5] == got[lim] and got[(1 << 22) + 7] == got[lim]
    assert got[-3] == got[0]
