"""mixture_waterfill + apply_mixture tests."""

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.curation import (
    apply_mixture, mixture_waterfill)

pytestmark = pytest.mark.usefixtures("spark")


def ref_waterfill(rows, budget):
    """Independent recursive form of the same spec: fix every source
    whose proportional integer share meets/exceeds its availability,
    recurse on the rest with the remaining budget."""
    def solve(active, remaining):
        wsum = sum(w for _s, _a, w in active)
        if not active or remaining <= 0 or wsum <= 0:
            return {}
        share = {s: int(remaining * w / wsum) for s, a, w in active}
        over = [(s, a, w) for s, a, w in active if share[s] >= a]
        if not over:
            return share
        fixed = {s: a for s, a, _w in over}
        rest = [t for t in active if t[0] not in fixed]
        out = solve(rest, remaining - sum(fixed.values()))
        out.update(fixed)
        return out
    eligible = [(s, a, w) for s, a, w in rows if a > 0 and w > 0]
    alloc = solve(eligible, budget)
    return {s: alloc.get(s, 0) for s, _a, _w in rows}


CASES = [
    # (rows, budget)
    ([("web", 1000, 1.0), ("code", 100, 1.0), ("books", 50, 2.0)], 400),
    ([("a", 10, 1.0), ("b", 10, 1.0)], 100),          # budget > avail
    ([("a", 10**9, 1.0), ("b", 5, 3.0), ("c", 7, 0.0)], 1000),
    ([("a", 0, 1.0), ("b", 100, 1.0)], 50),           # empty source
    ([("a", 100, 0.0), ("b", 100, 0.0)], 50),         # all-zero weight
]


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "source string, n_tokens bigint, weight double")


@pytest.mark.parametrize("rows,budget", CASES)
def test_waterfill_matches_reference(spark, rows, budget):
    got = {r["source"]: r["alloc_tokens"]
           for r in mixture_waterfill(_src(spark, rows),
                                      budget).collect()}
    assert got == ref_waterfill(rows, budget)


@pytest.mark.parametrize("rows,budget", CASES)
def test_waterfill_invariants(spark, rows, budget):
    res = mixture_waterfill(_src(spark, rows), budget).collect()
    avail = dict((s, a) for s, a, _w in rows)
    assert sum(r["alloc_tokens"] for r in res) <= budget
    for r in res:
        assert 0 <= r["alloc_tokens"] <= avail[r["source"]]
        want = (r["alloc_tokens"] / avail[r["source"]]
                if avail[r["source"]] else 0.0)
        assert r["rate"] == round(want, 9)


def test_waterfill_saturation_and_proportionality(spark):
    rows = [("web", 1000, 1.0), ("code", 100, 1.0), ("books", 50, 2.0)]
    got = {r["source"]: r["alloc_tokens"]
           for r in mixture_waterfill(_src(spark, rows), 400).collect()}
    # books (w=2, avail 50) saturates; code's proportional share of
    # the rest exceeds 100 -> saturates; web soaks the remainder
    assert got["books"] == 50 and got["code"] == 100
    assert got["web"] == 250


def test_apply_mixture_rate_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "web" if i % 3 else "code", f"t{i}") for i in range(9000)],
        "doc_id long, source string, text string")
    counts = {r["source"]: r["n"] for r in docs.groupBy("source")
              .agg(F.count("*").alias("n")).collect()}
    srcs = _src(spark, [("web", counts["web"], 1.0),
                        ("code", counts["code"], 1.0)])
    plan = mixture_waterfill(srcs, 4000)
    kept = apply_mixture(docs, plan, "source", "doc_id")
    got = {r["source"]: r["n"] for r in kept.groupBy("source")
           .agg(F.count("*").alias("n")).collect()}
    rates = {r["source"]: r["rate"] for r in plan.collect()}
    for s in ("web", "code"):
        # seeded-hash sampling: realized count within 5% of target
        assert got[s] == pytest.approx(rates[s] * counts[s],
                                       rel=0.05)
    again = {r["source"]: r["n"] for r in
             apply_mixture(docs, plan, "source", "doc_id")
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert again == got
    # rate 1.0 keeps everything (threshold = denom > any bucket)
    full = mixture_waterfill(srcs, 10**9)
    assert apply_mixture(docs, full, "source",
                         "doc_id").count() == 9000
