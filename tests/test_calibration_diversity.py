"""cdf_normalize / ngram_diversity / semantic_decontaminate tests —
each checked against an independent brute-force Python re-derivation.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.curation import ngram_diversity
from paperslicer_spark.operators.metrics import cdf_normalize
from paperslicer_spark.operators.similarity import semantic_decontaminate


def test_cdf_normalize_vs_python(spark):
    rng = random.Random(3)
    rows = [(g, i, rng.randint(0, 20))  # heavy ties on purpose
            for g in ("a", "b") for i in range(50)]
    rows.append(("solo", 999, 7))  # single-row group -> pct 0
    df = spark.createDataFrame(rows, ["g", "id", "s"])
    got = {(r["g"], r["id"]): r["pct"]
           for r in cdf_normalize(df, "g", "s", "id").collect()}

    for g in ("a", "b", "solo"):
        grp = sorted(((s, i) for gg, i, s in rows if gg == g))
        n = len(grp)
        for rank, (s, i) in enumerate(grp):
            want = 0.0 if n == 1 else round(rank / (n - 1), 9)
            assert got[(g, i)] == pytest.approx(want, abs=1e-12)


def test_ngram_diversity_vs_python(spark):
    rng = random.Random(5)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [("s%d" % (i % 2),
             " ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 9))))
            for i in range(80)]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {r["source"]: r for r in
           ngram_diversity(df, "source", "text", n=3).collect()}

    for src in ("s0", "s1"):
        grams = []
        for s, text in rows:
            t = text.strip().lower().split()
            if s != src or not text.strip() or len(t) < 3:
                continue
            grams += [" ".join(t[i:i + 3]) for i in range(len(t) - 2)]
        r = got[src]
        assert r["n_grams"] == len(grams)
        assert r["n_distinct"] == len(set(grams))
        assert r["distinct_ratio"] == pytest.approx(
            round(len(set(grams)) / len(grams), 6), abs=1e-12)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_semantic_decontaminate_vs_python(spark):
    rng = random.Random(9)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)])
              for i in range(60)]
    # bench: scaled copies of every 10th vector (planted hits) plus
    # one random probe unlikely to match anything
    bench = [(1000 + i, [2.0 * x for x in v])
             for i, v in corpus if i % 10 == 0]
    bench.append((2000, [rng.uniform(-1, 1) for _ in range(8)]))
    t = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    b = spark.createDataFrame(bench, ["vec_id", "embedding"])

    got = {r["vec_id"]: (r["bench_id"], r["cos"]) for r in
           semantic_decontaminate(t, b, threshold=0.6).collect()}

    ref = {}
    for i, v in corpus:
        hits = [(round(_cos(v, bv), 6), bid) for bid, bv in bench]
        hits = [(c, bid) for c, bid in hits if c >= 0.6]
        if hits:
            c, bid = max(hits, key=lambda h: (h[0], -h[1]))
            best = min((bid for cc, bid in hits if cc == c))
            ref[i] = (best, c)
    assert got == ref
    assert all(i in got for i, _ in corpus if i % 10 == 0)


def test_semantic_decontaminate_lsh_blocked(spark):
    # the bits path must be a subset of the exact path (recall < 1,
    # precision 1): every blocked hit appears in the exact output
    rng = random.Random(13)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)])
              for i in range(40)]
    bench = [(500 + i, [2.0 * x for x in v])
             for i, v in corpus if i % 5 == 0]
    t = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    b = spark.createDataFrame(bench, ["vec_id", "embedding"])
    exact = {(r["vec_id"], r["bench_id"], r["cos"]) for r in
             semantic_decontaminate(t, b, threshold=0.6).collect()}
    blocked = {(r["vec_id"], r["bench_id"], r["cos"]) for r in
               semantic_decontaminate(t, b, threshold=0.6,
                                      bits=4).collect()}
    assert blocked <= exact
    # scaled copies share every sign -> same bucket -> planted hits
    # survive the blocking
    assert all(any(v == i for v, _, _ in blocked)
               for i, _ in corpus if i % 5 == 0)
