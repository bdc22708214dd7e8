"""transition_counts / score_deciles unit tests (brute-force refs)."""

import datetime as dt
import random
from collections import Counter

from pyspark.sql import functions as F

from paperslicer_spark.operators.metrics import score_deciles
from paperslicer_spark.operators.temporal import transition_counts

T0 = dt.datetime(2024, 3, 1)


def _mk(seed=83, n=500, users=25):
    rng = random.Random(seed)
    types = ["a", "b", "c"]
    return [(i, f"u{rng.randrange(users)}",
             T0 + dt.timedelta(seconds=rng.randrange(50_000)),
             types[rng.randrange(3)]) for i in range(n)]


def _ref_transitions(rows):
    by_user = {}
    for eid, u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, eid, ty))
    c = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            c[(a, b)] += 1
    return c


def test_transitions_vs_bruteforce(spark):
    rows = _mk()
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id string, ts timestamp, "
              "event_type string")
    out = transition_counts(df, "user_id", "ts", "event_type",
                            tiebreak_cols=["event_id"]).collect()
    ref = _ref_transitions(rows)
    got = {(r["from_state"], r["to_state"]): r["n"] for r in out}
    assert got == dict(ref)
    # probabilities row-normalize to ~1 and match n/total
    tot = Counter()
    for (a, _), n in ref.items():
        tot[a] += n
    for r in out:
        assert r["p"] == round(r["n"] / tot[r["from_state"]], 9)


def test_transitions_same_ts_tiebreak(spark):
    ts = T0
    rows = [(1, "u", ts, "a"), (2, "u", ts, "b"), (3, "u", ts, "c")]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id string, ts timestamp, "
              "event_type string")
    got = {(r["from_state"], r["to_state"]): r["n"]
           for r in transition_counts(df, "user_id", "ts", "event_type",
                                      tiebreak_cols=["event_id"])
           .collect()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def _ref_deciles(rows, k=10):
    by_g = {}
    for g, s, i in rows:
        by_g.setdefault(g, []).append((s, i))
    out = {}
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        base, rem = divmod(n, k)
        pos = 0
        for b in range(1, k + 1):
            size = base + (1 if b <= rem else 0)
            chunk = vals[pos:pos + size]
            pos += size
            if chunk:
                ss = [s for s, _ in chunk]
                out[(g, b)] = (len(ss), min(ss), max(ss), sum(ss))
    return out


def test_score_deciles_vs_bruteforce(spark):
    rng = random.Random(84)
    # heavy ties: scores drawn from a small range
    rows = [(f"g{rng.randrange(3)}", rng.randrange(12), i)
            for i in range(257)]
    df = spark.createDataFrame(rows, "src string, score bigint, id bigint")
    got = {(r["src"], r["bucket"]):
           (r["n"], r["min_score"], r["max_score"], r["sum_score"])
           for r in score_deciles(df, "src", "score", "id").collect()}
    assert got == _ref_deciles(rows)
