"""rule_funnel + contrastive_pairs tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.curation import (
    contrastive_pairs, rule_funnel)

pytestmark = pytest.mark.usefixtures("spark")


# ---------- rule_funnel ----------

def _corpus(spark):
    rows = [
        # (id, n_chars, lang, score)
        (0, 500, "en", 0.9),    # passes all
        (1, 10, "en", 0.8),     # fails len only
        (2, 500, "xx", 0.7),    # fails lang only
        (3, 500, "en", 0.1),    # fails score only
        (4, 5, "xx", 0.0),      # fails all three
        (5, 800, "en", None),   # NULL score -> fails closed
    ]
    return spark.createDataFrame(
        rows, "doc_id int, n_chars int, lang string, score double")


RULES = lambda: [
    ("min_len", F.col("n_chars") >= 100),
    ("lang_en", F.col("lang") == "en"),
    ("min_score", F.col("score") >= 0.5),
]


def test_funnel_counts(spark):
    got = {r["rule"]: r.asDict()
           for r in rule_funnel(_corpus(spark), RULES()).collect()}
    # sequential reach: min_len sees all 6; lang_en sees the 4 that
    # passed min_len (0,2,3,5); min_score sees those also en (0,3,5)
    assert got["min_len"]["n_reaching"] == 6
    assert got["min_len"]["n_rejected"] == 2          # ids 1, 4
    assert got["lang_en"]["n_reaching"] == 4
    assert got["lang_en"]["n_rejected"] == 1          # id 2
    assert got["min_score"]["n_reaching"] == 3
    assert got["min_score"]["n_rejected"] == 2        # ids 3, 5
    # unique rejections: fails this rule, passes ALL others
    assert got["min_len"]["n_rejected_unique"] == 1   # id 1
    assert got["lang_en"]["n_rejected_unique"] == 1   # id 2
    assert got["min_score"]["n_rejected_unique"] == 2  # ids 3, 5
    assert got["__survivors__"]["n_reaching"] == 1    # id 0
    assert got["__survivors__"]["pct_of_input"] == round(1 / 6, 9)
    assert [got[k]["step"] for k in
            ("min_len", "lang_en", "min_score", "__survivors__")] == \
        [1, 2, 3, 4]


def test_funnel_null_fails_closed(spark):
    got = {r["rule"]: r for r in rule_funnel(
        _corpus(spark), [("min_score", F.col("score") >= 0.5)]).collect()}
    # id 5 (NULL score) and ids 3, 4 rejected
    assert got["min_score"]["n_rejected"] == 3
    assert got["__survivors__"]["n_reaching"] == 3


def test_funnel_duplicate_rule_names_rejected(spark):
    with pytest.raises(ValueError):
        rule_funnel(_corpus(spark), [("r", F.lit(True)),
                                     ("r", F.lit(False))])
    with pytest.raises(ValueError):
        rule_funnel(_corpus(spark), [])


# ---------- contrastive_pairs ----------

def _assign(spark):
    # clusters: A={0,1,2}, B={3,4}, C={5} (singleton), D={6,7,8,9}
    rows = [(0, "A"), (1, "A"), (2, "A"), (3, "B"), (4, "B"),
            (5, "C"), (6, "D"), (7, "D"), (8, "D"), (9, "D")]
    return spark.createDataFrame(rows, "doc_id int, cluster string")


def test_contrastive_structure(spark):
    got = contrastive_pairs(_assign(spark), "doc_id", "cluster",
                            n_buckets=2).collect()
    cl = {i: c for i, c in [(0, "A"), (1, "A"), (2, "A"), (3, "B"),
                            (4, "B"), (5, "C"), (6, "D"), (7, "D"),
                            (8, "D"), (9, "D")]}
    anchors = [r["anchor"] for r in got]
    assert len(anchors) == len(set(anchors))          # one triple each
    assert 5 not in anchors                           # singleton dropped
    for r in got:
        assert r["positive"] != r["anchor"]
        assert cl[r["positive"]] == r["cluster"]      # same-cluster pos
        assert cl[r["negative"]] != r["cluster"]      # cross-cluster neg
        assert r["negative"] != r["anchor"]


def test_contrastive_positive_ring_matches_reference(spark):
    # replicate the seeded ring in pure python (md5 is engine-neutral)
    got = {r["anchor"]: r["positive"]
           for r in contrastive_pairs(_assign(spark), "doc_id",
                                      "cluster", n_buckets=1).collect()}
    clusters = {"A": [0, 1, 2], "B": [3, 4], "D": [6, 7, 8, 9]}
    for members in clusters.values():
        ring = sorted(members, key=lambda i: (
            hashlib.md5(f"contrast:{i}".encode()).hexdigest(), i))
        for pos_idx, anchor in enumerate(ring):
            want = ring[(pos_idx + 1) % len(ring)]
            if anchor in got:                 # neg join may drop rows
                assert got[anchor] == want


def test_contrastive_null_cluster_excluded(spark):
    rows = [(0, "A"), (1, "A"), (2, None), (3, "B"), (4, "B")]
    df = spark.createDataFrame(rows, "doc_id int, cluster string")
    got = contrastive_pairs(df, "doc_id", "cluster",
                            n_buckets=1).collect()
    ids = {r["anchor"] for r in got} | {r["positive"] for r in got} \
        | {r["negative"] for r in got}
    assert 2 not in ids                    # unassigned row fully out
    assert len(got) > 0


def test_contrastive_deterministic(spark):
    a = sorted(map(tuple, contrastive_pairs(
        _assign(spark), "doc_id", "cluster", n_buckets=1).collect()))
    b = sorted(map(tuple, contrastive_pairs(
        _assign(spark), "doc_id", "cluster", n_buckets=1).collect()))
    assert a == b and len(a) > 0
