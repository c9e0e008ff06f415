"""Standalone plan audit: explain every REGISTRY entry and report any
CartesianProduct / BroadcastNestedLoopJoin occurrences (the same rules
tests/test_plan_quality.py enforces in CI, runnable on its own for a
quick review of the whole battery's physical plans).

Usage: python scripts/plan_audit.py [sf_dir] [--show NAME]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from factstore_spark.queries import REGISTRY
from factstore_spark.session import get_spark


def main() -> int:
    argv = sys.argv[1:]
    show = None
    if "--show" in argv:
        i = argv.index("--show")
        if i + 1 >= len(argv):
            print("usage: plan_audit.py [sf_dir] [--show NAME]")
            return 2
        show = argv[i + 1]
        del argv[i : i + 2]  # NAME is --show's operand, not a positional
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    if show is not None and show not in REGISTRY:
        print(f"ERROR: unknown query name: {show}")
        return 2
    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from tests.test_plan_quality import BNLJ_WHITELIST  # single source of truth

    bad = []
    for name, (fn, _) in REGISTRY.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        if show == name:
            print(plan)
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_WHITELIST:
            flags.append("BNLJ(unlisted)")
        status = ",".join(flags) if flags else "ok"
        print(f"{name:36s} {status}")
        if flags:
            bad.append((name, flags))
    print(f"\n{len(REGISTRY)} entries, {len(bad)} violations")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
