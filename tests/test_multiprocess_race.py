"""Cross-PROCESS conditional-append race: the commit protocol must give
exactly one winner even when contenders are separate OS processes (the
flock is the FDB-transaction stand-in; threads share too much to prove
it). Workers use pure pyarrow engine paths (no Spark needed to append)."""

import json
import subprocess
import sys

from factstore_spark import ExpectedLastFact, FactInput
from factstore_spark.results import Appended

WORKER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from factstore_spark.model import ExpectedLastFact, FactInput
from factstore_spark.store import FactStore

root, seed_id, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
fs = FactStore(spark=None, root=root)  # append path never touches spark
results = []
for i in range(n):
    res = fs.append(
        "race-store",
        FactInput(type=f"W{i}", subject="USER:RACE"),
        condition=ExpectedLastFact("USER:RACE", seed_id),
    )
    results.append(type(res).__name__)
print(json.dumps(results))
"""


def test_multiprocess_exactly_one_winner(fs, store_root):
    fs.create("race-store")
    seed = fs.append("race-store", FactInput(type="SEED", subject="USER:RACE"))
    assert isinstance(seed, Appended)
    seed_id = seed.fact_ids[0]

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, store_root, seed_id, "3"],
            stdout=subprocess.PIPE,
        )
        for _ in range(4)
    ]
    outcomes = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        outcomes.extend(json.loads(out))

    assert outcomes.count("Appended") == 1
    assert outcomes.count("AppendConditionViolated") == len(outcomes) - 1
    history = fs.find_by_subject("race-store", "USER:RACE")
    assert len(history.facts) == 2  # seed + the one winner
