"""Peak concurrent sessions: the sweep-line entry must equal a pure-
Python simulation on hand-built events covering the tricky shapes —
a session spanning midnight (day split), touching sessions at an
identical timestamp (+1-before--1 tie rule), and point sessions."""

import pytest

from factstore_spark.queries import events_peak_concurrency

H = 3_600_000_000  # one hour in microseconds
DAY = 86_400_000_000


@pytest.fixture()
def sf_dir(spark, tmp_path):
    # (event_id, user, t_us): 30-min-gap sessionization gives
    #  A: [0, 0.2h] and [2h, 2h]        (gap 1.8h > 30min splits)
    #  B: [0.1h, 0.1h]                   (point session)
    #  C: [23.9h, 24.1h]                 (crosses midnight -> both days)
    #  D: [0.2h, 0.2h]                   (starts exactly at A's end: tie)
    rows = [
        (1, "A", 0),
        (2, "A", H // 5),
        (3, "A", 2 * H),
        (4, "B", H // 10),
        (5, "C", DAY - H // 10),
        (6, "C", DAY + H // 10),
        (7, "D", H // 5),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        [(e, u, t * 1000) for e, u, t in rows],
        "event_id long, user_id string, ts long",  # bigint nanos branch
    ).write.parquet(f"{d}/events.parquet")
    return d, rows


def _brute(rows):
    # sessionize per user with the 30-min gap rule
    by_user = {}
    for e, u, t in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        by_user.setdefault(u, []).append(t)
    sessions = []
    for ts in by_user.values():
        s = e = ts[0]
        for t in ts[1:]:
            if t - e > 1_800_000_000:
                sessions.append((s, e))
                s = t
            e = t
        sessions.append((s, e))
    # split at day boundaries, sweep per day
    out = {}
    for s, e in sessions:
        for day in range(s // DAY, e // DAY + 1):
            cs, ce = max(s, day * DAY), min(e, (day + 1) * DAY - 1)
            out.setdefault(day, []).append((cs, ce))
    want = {}
    for day, ivals in out.items():
        bounds = [(cs, -1) for cs, _ in ivals] + [(ce, 1) for _, ce in ivals]
        # sort by (t, delta): -1 encodes "+1 first" at equal t
        cum = peak = 0
        peak_ts = None
        for t, d in sorted(bounds):
            cum += 1 if d == -1 else -1
            if cum > peak:
                peak, peak_ts = cum, t
        want[day] = (len(ivals), peak, peak_ts)
    return want


def test_peak_concurrency_matches_simulation(spark, sf_dir):
    d, rows = sf_dir
    got = {
        r.day: (r.n_sessions, r.peak, r.peak_ts_us)
        for r in events_peak_concurrency(spark, d).collect()
    }
    want = _brute(rows)
    assert got == want
    # shape checks that make the fixture non-vacuous:
    assert 1 in want                # C crosses into day 1
    # at t=0.2h A's session END meets D's START: both concurrent -> peak >= 2
    assert want[0][1] >= 2


def test_fixture_day0_composition(spark, sf_dir):
    # pin the exact day-0 interval multiset so the simulation itself
    # is checked against hand counting: A[0,0.2h], A[2h,2h], B point,
    # D point at 0.2h, C clipped [23.9h, day-end] -> 5 intervals
    _, rows = sf_dir
    want = _brute(rows)
    assert want[0][0] == 5
    # concurrency: at 0.1h A+B = 2; at 0.2h A(end)+D(start) = 2;
    # first time peak=2 is reached is B's start at 0.1h
    assert want[0][1] == 2 and want[0][2] == H // 10
    # day 1: only C's tail -> peak 1 at midnight
    assert want[1] == (1, 1, DAY)
