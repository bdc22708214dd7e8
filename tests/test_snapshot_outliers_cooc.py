"""robust_outliers / cooccurrence_counts / snapshot_diff unit tests.

Each reference below is an independent brute-force re-derivation:
median/MAD via Python ``statistics``-style interpolation on sorted
lists, co-occurrence via a nested-loop dict, and the snapshot ledger
via plain set algebra on dicts.
"""

import random

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.curation import cooccurrence_counts
from paperslicer_spark.operators.metrics import robust_outliers
from paperslicer_spark.operators.snapshot import diff_summary, snapshot_diff


def _q_cont(sorted_vals, q):
    """R-7 linear interpolation, the quantile_cont rule."""
    n = len(sorted_vals)
    pos = q * (n - 1)
    lo = int(pos)
    frac = pos - lo
    v_lo = sorted_vals[lo]
    v_hi = sorted_vals[min(lo + 1, n - 1)]
    return v_lo + (v_hi - v_lo) * frac


def test_robust_outliers_vs_python(spark):
    rng = random.Random(7)
    rows = []
    for g in ("a", "b"):
        for i in range(200):
            v = rng.randint(50, 150)
            if i % 37 == 0:  # planted heavy tail
                v = 5000 + i
            rows.append((g, i, v))
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    got = {r["g"]: r for r in
           robust_outliers(df, "g", F.col("v")).collect()}

    for g in ("a", "b"):
        vals = sorted(float(v) for gg, _, v in rows if gg == g)
        med = round(_q_cont(vals, 0.5), 6)
        devs = sorted(abs(v - med) for v in vals)
        mad = round(_q_cont(devs, 0.5), 6)
        n_out = sum(1 for v in vals if abs(v - med) > 3.0 * mad)
        r = got[g]
        assert r["med"] == pytest.approx(med, abs=1e-9)
        assert r["mad"] == pytest.approx(mad, abs=1e-9)
        assert r["n"] == len(vals)
        assert r["n_outliers"] == n_out


def test_robust_outliers_drops_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("a", 100)], ["g", "v"])
    r = robust_outliers(df, "g", F.col("v")).collect()[0]
    # NULL ignored: values {1,3,100} -> med 3, devs {0,2,97} -> mad 2
    assert r["med"] == 3.0 and r["mad"] == 2.0
    assert r["n"] == 3 and r["n_outliers"] == 1


def test_cooccurrence_vs_python(spark):
    rng = random.Random(11)
    vocab = ["the", "cat", "sat", "mat", "dog", "ran"]
    docs = [(" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 12))),)
            for _ in range(120)]
    df = spark.createDataFrame(docs, ["text"])

    ref = {}
    for (text,) in docs:
        t = text.strip().lower().split()
        if len(t) < 2:
            continue
        for i in range(len(t) - 1):
            for d in (1, 2, 3):
                if i + d >= len(t):
                    break
                key = (t[i], t[i + d])
                n, w = ref.get(key, (0, 0))
                ref[key] = (n + 1, w + 6 // d)

    got = cooccurrence_counts(df, "text", top_k=10_000).collect()
    assert {(r["w1"], r["w2"]): (r["n"], r["w6"]) for r in got} == ref
    # ordering: (w6 desc, n desc, w1, w2)
    keys = [(-r["w6"], -r["n"], r["w1"], r["w2"]) for r in got]
    assert keys == sorted(keys)


def test_cooccurrence_top_k_edge(spark):
    df = spark.createDataFrame(
        [("a b a b",), ("a b",), ("",), ("solo",)], ["text"])
    got = cooccurrence_counts(df, "text", top_k=2).collect()
    # pairs: (a,b)x3 w6=18? doc1: i=1:(a,b)6,(a,a)3,(a,b)2; i=2:(b,a)6,
    # (b,b)3; i=3:(a,b)6 ; doc2: (a,b)6 -> (a,b): n=4, w6=20
    assert got[0]["w1"] == "a" and got[0]["w2"] == "b"
    assert got[0]["n"] == 4 and got[0]["w6"] == 20
    assert len(got) == 2


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [(1, "one", "s1"), (2, "two", "s1"), (3, "three", "s2"),
         (4, "four", "s2")], ["id", "text", "src"])
    new = spark.createDataFrame(
        [(1, "one", "s1"), (2, "two CHANGED", "s1"),
         (4, "four", "s2"), (9, "nine", "s2")], ["id", "text", "src"])
    diff = snapshot_diff(old, new, "id", F.md5("text"))
    got = {r["id"]: r["change"] for r in diff.collect()}
    assert got == {1: "unchanged", 2: "modified", 3: "removed",
                   4: "unchanged", 9: "added"}

    dims = (old.select("id", "src")
            .unionByName(new.where(F.col("id") == 9)
                         .select("id", "src")))
    summ = {(r["src"], r["change"]): r["n"]
            for r in diff_summary(diff, dims, "id", "src").collect()}
    assert summ == {("s1", "unchanged"): 1, ("s1", "modified"): 1,
                    ("s2", "removed"): 1, ("s2", "unchanged"): 1,
                    ("s2", "added"): 1}
