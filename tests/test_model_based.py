"""Model-based randomized testing: drive the Spark engine and a tiny
pure-Python in-memory model (the MemoryFactStore analog) through the
same random operation sequence and require identical observable
behavior — the same cross-backend strategy the reference's TCK uses
(memory backend as the executable spec)."""

import random

from factstore_spark import (
    AllConditions,
    ExpectedLastFact,
    FactInput,
    ReadDirection,
    TagOnlyQueryItem,
    TagQuery,
    TagQueryBased,
    TagTypeItem,
)
from factstore_spark.model import fact_matches_tag_query, fact_matches_tags
from factstore_spark.results import Appended, AppendConditionViolated, FactsFound

STORE = "default-test-store"
KEYS, VALS, TYPES = ["k1", "k2"], ["", "x", "y"], ["T1", "T2", "T3"]
SUBJECTS = ["S1", "S2", "S3"]


class MemoryModel:
    """Executable spec: list of (id, type, subject, tags) in append order."""

    def __init__(self):
        self.facts = []

    def last_of_subject(self, subject):
        for fid, _t, s, _tags in reversed(self.facts):
            if s == subject:
                return fid
        return None

    def check(self, cond):
        if cond is None:
            return True
        if isinstance(cond, ExpectedLastFact):
            return self.last_of_subject(cond.subject) == cond.expected_last_fact_id
        if isinstance(cond, AllConditions):
            return all(self.check(c) for c in cond.conditions)
        if isinstance(cond, TagQueryBased):
            start = 0
            if cond.after is not None:
                idx = [i for i, f in enumerate(self.facts) if f[0] == cond.after]
                if not idx:
                    return False
                start = idx[0] + 1
            return not any(
                fact_matches_tag_query(t, tags, cond.fail_if_facts_match)
                for _fid, t, _s, tags in self.facts[start:]
            )
        raise TypeError(cond)

    def append(self, fid, fi, cond):
        if not self.check(cond):
            return False
        self.facts.append((fid, fi.type, fi.subject, dict(fi.tags)))
        return True

    def by_subject(self, subject, limit, direction):
        hits = [f[0] for f in self.facts if f[2] == subject]
        if direction == ReadDirection.BACKWARD:
            hits.reverse()
        return hits[:limit] if limit else hits

    def by_tags(self, tags, limit, direction):
        hits = [f[0] for f in self.facts if fact_matches_tags(f[3], tags)]
        if direction == ReadDirection.BACKWARD:
            hits.reverse()
        return hits[:limit] if limit else hits

    def by_query(self, q):
        return [f[0] for f in self.facts if fact_matches_tag_query(f[1], f[3], q)]


def rand_tags(rnd):
    return {k: rnd.choice(VALS) for k in rnd.sample(KEYS, rnd.randint(0, 2))}


def rand_condition(rnd, model):
    roll = rnd.random()
    if roll < 0.4:
        return None
    if roll < 0.7:
        subject = rnd.choice(SUBJECTS)
        # sometimes the true last fact, sometimes stale/None
        expected = model.last_of_subject(subject) if rnd.random() < 0.6 else None
        return ExpectedLastFact(subject, expected)
    item = (
        TagOnlyQueryItem({rnd.choice(KEYS): rnd.choice(VALS)})
        if rnd.random() < 0.5
        else TagTypeItem({rnd.choice(TYPES)}, {rnd.choice(KEYS): rnd.choice(VALS)})
    )
    after = rnd.choice([f[0] for f in model.facts]) if model.facts and rnd.random() < 0.5 else None
    return TagQueryBased(TagQuery([item]), after=after)


def test_random_ops_match_memory_model(fs):
    rnd = random.Random(20260813)
    fs.create(STORE)
    model = MemoryModel()

    appends = rejects = 0
    for step in range(40):
        fi = FactInput(
            type=rnd.choice(TYPES), subject=rnd.choice(SUBJECTS), tags=rand_tags(rnd)
        )
        cond = rand_condition(rnd, model)
        res = fs.append(
            STORE, fi, condition=cond if cond is not None else __default_cond()
        )
        if isinstance(res, Appended):
            appends += 1
            ok = model.append(res.fact_ids[0], fi, cond)
            assert ok, f"step {step}: engine appended, model rejected cond={cond}"
        else:
            rejects += 1
            assert isinstance(res, AppendConditionViolated), res
            assert not model.check(cond), f"step {step}: engine rejected, model allowed cond={cond}"
    # Both branches must have been exercised — a drift in the condition
    # generator could otherwise silently skip the rejection semantics.
    assert appends > 0 and rejects > 0, (appends, rejects)

    # Observable state comparison across the finder surface.
    for subject in SUBJECTS:
        for direction in (ReadDirection.FORWARD, ReadDirection.BACKWARD):
            for limit in (None, 2):
                got = fs.find_by_subject(STORE, subject, limit=limit, direction=direction)
                assert isinstance(got, FactsFound)
                assert [f.id for f in got.facts] == model.by_subject(subject, limit, direction)
    for k in KEYS:
        for v in VALS:
            got = fs.find_by_tags(STORE, {k: v})
            assert [f.id for f in got.facts] == model.by_tags({k: v}, None, ReadDirection.FORWARD)
    q = TagQuery(
        [TagOnlyQueryItem({"k1": "x"}), TagTypeItem({"T1", "T2"}, {"k2": "y"})]
    )
    got = fs.find_by_tag_query(STORE, q)
    assert [f.id for f in got.facts] == model.by_query(q)


def __default_cond():
    from factstore_spark import NoCondition

    return NoCondition()
