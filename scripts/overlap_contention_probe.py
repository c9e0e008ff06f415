"""§2.6 overlap-under-contention probe (VERDICT r14 #8).

Round 14 overlapped independent driver actions in the fixed-overhead
probe entries, validated only on an idle local[32]; the open question
was whether the overlap inverts when cores are scarce (two saturating
stages fighting instead of back-filling). This probe runs the biggest
beneficiary — dedup_stream_sink, whose witnesses overlap the stream
and whose per-batch writes run concurrently — at LOW parallelism
(local[4], 1/8 of the bench cores) with the shipped overlap vs the
same code forced serial (every ThreadPoolExecutor submits inline),
interleaved reps in one warm session.

Result on the round-15 builder host (committed in OPTIMIZATION_r15.md):
overlap [13.17, 14.03] s vs serial [17.03, 19.03] s — the overlap is
a ~25% win even at 4 cores, because the overlapped actions are
driver/latency-bound (streaming micro-batch scheduling, bounded
witnesses), not core-saturating stages. The two genuinely saturating
cases (validate_scd2, zorder writes) were already reverted to serial
in round 14.

Usage: python scripts/overlap_contention_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import concurrent.futures as cf


class SerialExecutor(cf.ThreadPoolExecutor):
    """submit() runs the fn inline; Future already resolved."""

    def submit(self, fn, *a, **kw):  # noqa: D102
        f = cf.Future()
        try:
            f.set_result(fn(*a, **kw))
        except BaseException as e:  # noqa: BLE001 — mirror real future
            f.set_exception(e)
        return f


def main() -> None:
    from factstore_spark import queries as q
    from factstore_spark.session import get_spark, sweep_checkpoint_blocks

    spark = get_spark(
        app_name="overlap-probe", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn, _ = q.REGISTRY["dedup_stream_sink"]

    def run(serial: bool) -> float:
        import concurrent.futures

        saved = concurrent.futures.ThreadPoolExecutor
        if serial:
            concurrent.futures.ThreadPoolExecutor = SerialExecutor
        try:
            spark.catalog.clearCache()
            sweep_checkpoint_blocks(spark)
            t0 = time.time()
            fn(spark, sf).count()
            return round(time.time() - t0, 2)
        finally:
            concurrent.futures.ThreadPoolExecutor = saved

    fn(spark, sf).count()  # warm both paths' machinery once
    res = {"overlap": [], "serial": []}
    for _rep in range(2):
        res["serial"].append(run(True))
        res["overlap"].append(run(False))
    print(f"local[4] dedup_stream_sink: {res}")
    spark.stop()


if __name__ == "__main__":
    main()
