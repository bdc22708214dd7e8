"""funnel_steps / retention_cohorts unit tests.

Both references are independent brute-force re-derivations over plain
python dicts (sequential scan per user; calendar math via datetime).
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from paperslicer_spark.operators.temporal import (funnel_steps,
                                                  retention_cohorts)

T0 = dt.datetime(2024, 1, 3, 12, 0, 0)  # a Wednesday


def _mk_events(n_users=40, n_events=600, seed=81):
    rng = random.Random(seed)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    for i in range(n_events):
        rows.append((f"u{rng.randrange(n_users)}",
                     T0 + dt.timedelta(minutes=rng.randrange(60 * 24 * 40)),
                     types[rng.randrange(len(types))]))
    return rows


def _ref_funnel(rows, steps):
    by_user = {}
    for u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, ty))
    counts = [0] * len(steps)
    for evs in by_user.values():
        prev = None
        for k, s in enumerate(steps):
            cand = [ts for ts, ty in evs
                    if ty == s and (prev is None or ts > prev)]
            if not cand:
                break
            prev = min(cand)
            counts[k] += 1
    return counts


def _monday(d):
    day = d.date()
    return day - dt.timedelta(days=day.weekday())


def _ref_retention(rows):
    cohort = {}
    for u, ts, ty in rows:
        if ty == "signup" and (u not in cohort or ts < cohort[u]):
            cohort[u] = ts
    cells = {}
    seen = set()
    for u, ts, ty in rows:
        if u not in cohort:
            continue
        cw, w = _monday(cohort[u]), _monday(ts)
        if w < cw or (u, w) in seen:
            continue
        seen.add((u, w))
        key = (str(cw), (w - cw).days // 7)
        cells[key] = cells.get(key, 0) + 1
    return cells


def test_funnel_vs_bruteforce(spark):
    rows = _mk_events()
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, "
                                     "event_type string")
    steps = ["view", "click", "purchase"]
    got = {r["step"]: (r["step_name"], r["n_users"])
           for r in funnel_steps(df, "user_id", "ts", "event_type",
                                 steps).collect()}
    ref = _ref_funnel(rows, steps)
    assert got == {k + 1: (s, ref[k]) for k, s in enumerate(steps)}
    # monotone non-increasing by construction
    assert ref[0] >= ref[1] >= ref[2]


def test_funnel_strict_order_ties(spark):
    ts = T0
    rows = [  # same-timestamp click does NOT advance past view
        ("a", ts, "view"), ("a", ts, "click"),
        ("b", ts, "view"), ("b", ts + dt.timedelta(seconds=1), "click"),
        ("c", ts, "click"), ("c", ts + dt.timedelta(seconds=1), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, "
                                     "event_type string")
    got = {r["step_name"]: r["n_users"]
           for r in funnel_steps(df, "user_id", "ts", "event_type",
                                 ["view", "click"]).collect()}
    assert got == {"view": 3, "click": 1}


def test_retention_vs_bruteforce(spark):
    rows = _mk_events(seed=82)
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, "
                                     "event_type string")
    out = retention_cohorts(df, "user_id", "ts", "event_type").collect()
    got = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in out}
    assert got == _ref_retention(rows)
    # offset 0 rows exist (signup week itself counts as active)
    assert any(k[1] == 0 for k in got)


def _ref_sessions(rows, gap_us=1_800_000_000):
    from collections import defaultdict
    by_user = defaultdict(list)
    for u, ts, _ in rows:
        by_user[u].append(ts)
    out = {}
    for u, tss in by_user.items():
        tss.sort()
        sid, start, prev, n = 0, None, None, 0
        epoch = dt.datetime(1970, 1, 1)
        us = [int((t - epoch).total_seconds() * 1_000_000) for t in tss]
        for t in us:
            if prev is None or t - prev > gap_us:
                if sid:
                    out[(u, sid)] = (prev - start, n)
                sid += 1
                start, n = t, 0
            prev = t
            n += 1
        out[(u, sid)] = (prev - start, n)
    return out


def test_session_durations_vs_bruteforce(spark):
    from paperslicer_spark.operators.temporal import session_durations
    rows = _mk_events(seed=85)
    # strip type; give each row a unique tiebreak id
    evs = [(u, ts, i) for i, (u, ts, _) in enumerate(rows)]
    df = spark.createDataFrame(
        evs, "user_id string, ts timestamp, event_id bigint")
    got = {(r["user_id"], r["session_id"]): (r["dur_us"], r["n_events"])
           for r in session_durations(df, "user_id", "ts",
                                      tiebreak_cols=["event_id"])
           .collect()}
    assert got == _ref_sessions(evs)
    assert all(d >= 0 for d, _ in got.values())
