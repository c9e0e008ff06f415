"""Full-battery sf1-scale CORRECTNESS certification (VERDICT r11 #1).

selfcheck.py proves value-equality vs DuckDB at sf0.01; this script
proves it at sf1-ish scale (K=10 x sf0.1: ~6M lineitem / 1M events /
50k docs / 20k vectors) — the scale class where cap-vs-corpus-size
interactions live. The round-11 self-review found exactly one such
bug (media_real_frame_dup's hot-frame cap vs fixture frequency growth)
by adversarial reading; this gate TESTS the whole class instead:
every entry whose plan embeds a cap, probe sample, fixture-size rule,
or top-k boundary gets its full value comparison re-run against the
oracle on the amplified corpus.

Usage:
    python scripts/sf1_selfcheck.py [K] [out_dir] [entry ...]

Defaults: K=10, out_dir=/tmp/sf1_battery, all REGISTRY entries.
Prints one `| entry | kind | sf1 s | verdict |` markdown row per
entry (for docs/SCALE.md) and exits nonzero on any mismatch.

Reuses sf1_battery_bench's amplification (key-consistent replication,
crash-safe K marker) and selfcheck's compare (dtype-drift + value
normalization), so a divergence here means the ENTRY is wrong at
scale, not that the harness drifted from the driver's."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb  # noqa: E402

from factstore_spark.queries import REGISTRY  # noqa: E402
from factstore_spark.session import get_spark  # noqa: E402
from selfcheck import TABLES, dtype_drift, norm_rows  # noqa: E402
from sf1_battery_bench import ensure_build  # noqa: E402


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_battery"
    only = set(sys.argv[3:])
    unknown = only - set(REGISTRY)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark(app_name="sf1-selfcheck")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_build(spark, k, out, reuse=True)
    for t in TABLES:
        spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
    con = duckdb.connect()
    for t in TABLES:
        # dims are copied as single files; amplified tables are Spark
        # output DIRECTORIES — glob their part files for DuckDB
        p = os.path.join(out, f"{t}.parquet")
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )
    print(f"| entry | kind | sf1 s | verdict |")
    print(f"|---|---|---|---|")
    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, out)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
        except Exception as e:
            dt = time.time() - t0
            print(f"| {name} | spark | {dt:.1f} | FAIL spark error: "
                  f"{type(e).__name__}: {str(e)[:150]} |", flush=True)
            failures.append(name)
            continue
        if sql is None:
            bad = []
            for r in s_rows:
                d = dict(zip(s_cols, r))
                for col, v in d.items():
                    if (col == "match_bp" or col.endswith("_match_bp")) and v != 10000:
                        bad.append(f"{col}={v}")
                    elif col.endswith("_ok") and not v:
                        bad.append(f"{col}={v}")
                    elif col.endswith("_problems") and v != 0:
                        bad.append(f"{col}={v}")
            dt = time.time() - t0
            if bad:
                print(f"| {name} | rows-only | {dt:.1f} | FAIL contract: "
                      f"{sorted(set(bad))} |", flush=True)
                failures.append(name)
            else:
                print(f"| {name} | rows-only | {dt:.1f} | ok "
                      f"({len(s_rows)} rows, contract green) |", flush=True)
            continue
        try:
            tbl = con.execute(sql).fetch_arrow_table()
            d_cols = list(tbl.column_names)
            col_vals = [tbl.column(j).to_pylist() for j in range(tbl.num_columns)]
            d_rows = [tuple(col[i] for col in col_vals) for i in range(tbl.num_rows)]
        except Exception as e:
            dt = time.time() - t0
            print(f"| {name} | oracle | {dt:.1f} | FAIL duckdb error: "
                  f"{type(e).__name__}: {str(e)[:150]} |", flush=True)
            failures.append(name)
            continue
        dt = time.time() - t0
        drift = dtype_drift(sdf.dtypes, tbl.schema)
        if drift:
            print(f"| {name} | oracled | {dt:.1f} | FAIL dtype drift: {drift} |",
                  flush=True)
            failures.append(name)
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"| {name} | oracled | {dt:.1f} | FAIL columns "
                  f"{sc} vs {dc} |", flush=True)
            failures.append(name)
        elif len(sr) != len(dr):
            print(f"| {name} | oracled | {dt:.1f} | FAIL rows "
                  f"{len(sr)} vs {len(dr)} |", flush=True)
            failures.append(name)
        elif sr != dr:
            diff = next(
                (i for i, (a, b) in enumerate(zip(sr, dr)) if a != b),
                min(len(sr), len(dr)),
            )
            print(f"| {name} | oracled | {dt:.1f} | FAIL values at sorted row "
                  f"{diff}: {sr[diff] if diff < len(sr) else '<end>'} vs "
                  f"{dr[diff] if diff < len(dr) else '<end>'} |", flush=True)
            failures.append(name)
        else:
            print(f"| {name} | oracled | {dt:.1f} | ok ({len(sr)} rows match) |",
                  flush=True)
    print(("ALL MATCH" if not failures else f"FAILURES: {sorted(failures)}"),
          flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
