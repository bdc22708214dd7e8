"""key_skew_profile / rate_anomaly / containment_pairs tests — each
against an independent brute-force Python re-derivation.
"""

import math
import random
from collections import Counter
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.dedup import containment_pairs
from paperslicer_spark.operators.metrics import key_skew_profile
from paperslicer_spark.operators.temporal import rate_anomaly


def test_key_skew_profile_vs_python(spark):
    rng = random.Random(17)
    keys = [rng.choice("abcdefgh") * rng.randint(1, 2) for _ in range(400)]
    keys += ["hot"] * 200  # planted skew
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = key_skew_profile(df, F.col("k"), top_k=5).collect()

    c = Counter(keys)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    n_rows, n_keys = len(keys), len(c)
    assert [(r["rank"], r["key"], r["c"]) for r in got] == \
        [(i + 1, k, n) for i, (k, n) in enumerate(top)]
    for r, (k, n) in zip(got, top):
        assert r["frac"] == pytest.approx(round(n / n_rows, 9), abs=1e-12)
        assert r["skew"] == pytest.approx(
            round(n * n_keys / n_rows, 6), abs=1e-12)
    assert got[0]["key"] == "hot"


def test_rate_anomaly_vs_python(spark):
    rng = random.Random(23)
    base = datetime(2024, 1, 1)
    rows = []
    for h in range(60):
        n = rng.randint(5, 8)
        if h == 50:
            n = 60  # planted spike
        for i in range(n):
            rows.append(("k", base + timedelta(hours=h, minutes=i % 60)))
    df = spark.createDataFrame(rows, ["et", "ts"])
    got = {r["hr"]: r for r in rate_anomaly(df, "et", "ts").collect()}

    counts = Counter(int((t - datetime(1970, 1, 1)).total_seconds())
                     // 3600 for _, t in rows)
    hours = sorted(counts)
    for hr in hours:
        base_hrs = [h for h in hours if hr - 24 <= h <= hr - 1]
        n = len(base_hrs)
        s = sum(counts[h] for h in base_hrs)
        ss = sum(counts[h] ** 2 for h in base_hrs)
        r = got[hr]
        assert r["c"] == counts[hr] and r["n_base"] == n
        var_num = n * ss - s * s
        if n >= 12 and var_num > 0:
            want = round((n * counts[hr] - s) / math.sqrt(var_num), 6)
            assert r["z"] == pytest.approx(want, abs=1e-9)
        else:
            assert r["z"] is None
    # the planted spike must be the max z
    spike = max(hours, key=lambda h: got[h]["z"] or -1e9)
    assert counts[spike] == 60


def _grams(text, n=3):
    t = text.strip().lower().split()
    return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}


def test_containment_pairs_vs_python(spark):
    rng = random.Random(29)
    vocab = ["w%d" % i for i in range(40)]
    docs = {}
    for i in range(30):
        docs[i] = " ".join(rng.choice(vocab) for _ in range(30))
    # planted quote: doc 100 embeds doc 3's text inside framing
    docs[100] = "intro text here " + docs[3] + " outro text after"
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): r for r in
           containment_pairs(df, "doc_id", "text", n=3, threshold=0.5,
                             max_doc_freq=1000).collect()}

    ref = {}
    ids = sorted(docs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            ga, gb = _grams(docs[a]), _grams(docs[b])
            inter = len(ga & gb)
            if not ga or not gb or inter == 0:
                continue
            cont = round(inter / min(len(ga), len(gb)), 6)
            if cont >= 0.5:
                ref[(a, b)] = (inter, len(ga), len(gb), cont)
    assert {(k, (v["inter"], v["sz_a"], v["sz_b"], v["cont"]))
            for k, v in got.items()} == set(ref.items())
    # the planted quote pair is found with high containment
    assert (3, 100) in got and got[(3, 100)]["cont"] > 0.9


def test_containment_cap_drops_stop_shingles(spark):
    # a shingle in >max_doc_freq docs must leave intersections AND
    # sizes (same rule as q11)
    common = "the same boiler plate line"
    rows = [(i, common + " unique%d tail%d" % (i, i)) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = containment_pairs(df, "doc_id", "text", n=3, threshold=0.01,
                            max_doc_freq=3).collect()
    # every doc's shingles from `common` appear in 6 docs -> capped;
    # the remaining per-doc shingles are unique -> no intersections
    assert got == []


def test_basket_pairs_vs_python(spark):
    from itertools import combinations

    from paperslicer_spark.operators.metrics import basket_pairs

    rng = random.Random(31)
    items = ["view", "click", "buy", "share"]
    rows = [(u, rng.choice(items)) for u in range(40) for _ in range(5)]
    df = spark.createDataFrame(rows, ["u", "item"])
    got = {(r["item_a"], r["item_b"]):
           (r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"], r["lift"])
           for r in basket_pairs(df, "u", "item").collect()}

    baskets = {}
    for u, it in rows:
        baskets.setdefault(u, set()).add(it)
    nb = len(baskets)
    ic = Counter(it for s in baskets.values() for it in s)
    ref = {}
    pc = Counter()
    for s in baskets.values():
        for a, b in combinations(sorted(s), 2):
            pc[(a, b)] += 1
    for (a, b), n_ab in pc.items():
        ref[(a, b)] = (n_ab, ic[a], ic[b], nb,
                       round(n_ab * nb / (ic[a] * ic[b]), 6))
    assert got == ref
