"""Per-entry profiling harness for the optimization rounds.

For each named registry entry (or the N most expensive from
BENCH_DETAIL.json), runs the entry exactly the way bench.py does
(count action, warm session) and records:

- wall seconds (per run, 2 runs)
- Spark JOB COUNT delta (dagScheduler.numTotalJobs) — the fixed-
  overhead-bound entries (storage_*, scd2) are job-count-bound, not
  data-bound, so this is the lever the optimization guide's §1 says to
  measure first
- cumulative task time delta (executorRunTime across stages) via the
  status store when available
- optionally a driver-side cProfile (--profile) separating plan
  construction / py4j wait from everything else

Usage: python scripts/perf_probe.py [--profile] [--sf DIR] name [name...]
       python scripts/perf_probe.py --top N
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from factstore_spark.queries import REGISTRY  # noqa: E402
from factstore_spark.session import get_spark  # noqa: E402
from factstore_spark.session import sweep_checkpoint_blocks as _sweep  # noqa: E402


def _num_jobs(spark) -> int:
    try:
        return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    except Exception:
        return -1


def main() -> None:
    args = sys.argv[1:]
    profile = "--profile" in args
    if profile:
        args.remove("--profile")
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names: list[str] = []
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_DETAIL.json")) as fh:
            det = json.load(fh)["entries"]
        names = sorted(det, key=lambda k: det[k]["sec"], reverse=True)[:top_n]
    names += args
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown entries: {unknown}")
        sys.exit(2)

    spark = get_spark(app_name="perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    import pandas as pd  # noqa: F401

    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    import gc

    results = {}
    for name in names:
        fn, _ = REGISTRY[name]
        spark.catalog.clearCache()
        gc.collect()
        _sweep(spark)
        runs = []
        for run_i in range(2):
            j0 = _num_jobs(spark)
            t0 = time.time()
            if profile and run_i == 1:
                import cProfile
                import pstats

                pr = cProfile.Profile()
                pr.enable()
                fn(spark, sf_dir).count()
                pr.disable()
                dt = time.time() - t0
                st = pstats.Stats(pr)
                st.sort_stats("cumulative")
                print(f"==== cProfile {name} (run 2, {dt:.2f}s) ====")
                st.print_stats(25)
            else:
                fn(spark, sf_dir).count()
                dt = time.time() - t0
            jobs = _num_jobs(spark) - j0
            runs.append({"sec": round(dt, 3), "jobs": jobs})
        results[name] = runs
        print(
            f"# {name}: run1={runs[0]['sec']}s/{runs[0]['jobs']}jobs "
            f"run2={runs[1]['sec']}s/{runs[1]['jobs']}jobs",
            flush=True,
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
