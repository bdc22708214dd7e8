"""boilerplate_strip + cohen_kappa tests (independent in-test
references, same differential pattern as test_tokenizer)."""

import itertools
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.curation import boilerplate_strip
from paperslicer_spark.operators.metrics import cohen_kappa

pytestmark = pytest.mark.usefixtures("spark")


# ---------- boilerplate_strip ----------

HEADER = "ACME CORP — all rights reserved"
FOOTER = "unsubscribe | privacy | terms"
DOCS = [
    (0, "s1", f"{HEADER}\nunique zero\n\n{FOOTER}"),
    (1, "s1", f"{HEADER}\nunique one\nalso one\n{FOOTER}"),
    (2, "s1", f"{HEADER}\nunique two\n{FOOTER}"),
    (3, "s1", f"{HEADER}\n{FOOTER}"),                    # all template
    (4, "s2", f"{HEADER}\nlonely in s2"),                # header rare in s2
    (5, "s2", "totally distinct\ntext"),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id int, source string, text string")


def ref_strip(rows, grouped, min_df=0.5, min_docs=2):
    by_g = {}
    for _id, g, text in rows:
        by_g.setdefault(g if grouped else "", []).append((_id, text))
    out = {}
    for g, docs in by_g.items():
        df_count = Counter()
        for _id, text in docs:
            for ln in set(l for l in text.split("\n") if l.strip()):
                df_count[ln] += 1
        boiler = {l for l, c in df_count.items()
                  if c >= min_docs and c >= min_df * len(docs)}
        for _id, text in docs:
            lines = [l for l in text.split("\n") if l.strip()]
            kept = [l for l in lines if l not in boiler]
            out[_id] = ("\n".join(kept), len(lines), len(kept))
    return out


def test_boilerplate_grouped_matches_reference(spark):
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
           for r in boilerplate_strip(_docs(spark), "doc_id", "text",
                                      group_col="source").collect()}
    assert got == ref_strip(DOCS, grouped=True)
    # header/footer hit 4/4 docs in s1 -> stripped there...
    assert got[0][0] == "unique zero"
    assert got[3] == ("", 2, 0)                # all-template doc
    # ...but header is 1/2 docs in s2 at min_df=0.5 AND min_docs=2:
    # df=1 < min_docs -> kept
    assert HEADER in got[4][0]


def test_boilerplate_global_group(spark):
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
           for r in boilerplate_strip(_docs(spark), "doc_id",
                                      "text").collect()}
    assert got == ref_strip(DOCS, grouped=False)
    # globally header is 5/6 docs -> stripped from doc 4 too
    assert got[4][0] == "lonely in s2"


def test_boilerplate_min_docs_guards_tiny_groups(spark):
    solo = spark.createDataFrame(
        [(0, "only doc\nin its group")], "doc_id int, text string")
    r = boilerplate_strip(solo, "doc_id", "text").collect()[0]
    # every line has df-ratio 1.0 but df=1 < min_docs=2 -> untouched
    assert r["clean_text"] == "only doc\nin its group"
    assert (r["n_lines"], r["n_kept"]) == (2, 2)


def test_boilerplate_preserves_line_order(spark):
    df = spark.createDataFrame(
        [(i, f"z common\nline a{i}\nz common\nline b{i}")
         for i in range(3)], "doc_id int, text string")
    r = {x["doc_id"]: x["clean_text"]
         for x in boilerplate_strip(df, "doc_id", "text").collect()}
    assert r[1] == "line a1\nline b1"


# ---------- cohen_kappa ----------

def _ann(spark, rows):
    return spark.createDataFrame(
        rows, "item int, rater string, label string")


def test_kappa_textbook_example(spark):
    # classic 2x2: 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes
    rows = []
    i = 0
    for la, lb, n in [("y", "y", 20), ("n", "n", 15),
                      ("y", "n", 5), ("n", "y", 10)]:
        for _ in range(n):
            rows += [(i, "a", la), (i, "b", lb)]
            i += 1
    got = cohen_kappa(_ann(spark, rows), "item", "rater",
                      "label").collect()[0]
    assert got["n_items"] == 50
    assert got["po"] == 0.7
    assert got["pe"] == 0.5
    assert got["kappa"] == pytest.approx(0.4)


def test_kappa_no_diagonal_cells(spark):
    # raters never coincide on an item, but both use each label:
    # pe must still be 0.5 (the missed-diagonal-cell trap), kappa -1
    rows = [(1, "a", "x"), (1, "b", "y"), (2, "a", "y"), (2, "b", "x")]
    got = cohen_kappa(_ann(spark, rows), "item", "rater",
                      "label").collect()[0]
    assert got["po"] == 0.0 and got["pe"] == 0.5
    assert got["kappa"] == -1.0


def test_kappa_degenerate_single_label(spark):
    rows = [(i, r, "same") for i in range(5) for r in ("a", "b")]
    got = cohen_kappa(_ann(spark, rows), "item", "rater",
                      "label").collect()[0]
    assert got["po"] == 1.0 and got["pe"] == 1.0
    assert got["kappa"] == 1.0


def test_kappa_null_labels_dropped(spark):
    rows = [(1, "a", "x"), (1, "b", "x"),
            (2, "a", None), (2, "b", "x"),      # missing rating
            (3, "a", "y"), (3, "b", "y")]
    got = cohen_kappa(_ann(spark, rows), "item", "rater",
                      "label").collect()[0]
    assert got["n_items"] == 2                  # item 2 not co-rated
    assert got["po"] == 1.0


def ref_kappa(rows, ra, rb):
    la = {i: l for i, r, l in rows if r == ra}
    lb = {i: l for i, r, l in rows if r == rb}
    co = sorted(set(la) & set(lb))
    n = len(co)
    po = sum(la[i] == lb[i] for i in co) / n
    ca, cb = Counter(la[i] for i in co), Counter(lb[i] for i in co)
    pe = sum(ca[l] * cb[l] for l in ca) / (n * n)
    if pe == 1.0:
        return n, po, pe, (1.0 if po == 1.0 else None)
    return n, po, pe, (po - pe) / (1 - pe)


def test_kappa_pairwise_matches_reference(spark):
    rng = random.Random(7)
    raters = ["a", "b", "c", "d"]
    rows = [(i, r, rng.choice("xyz"))
            for i in range(200) for r in raters
            if rng.random() < 0.8]          # partial coverage
    got = {(r["rater_a"], r["rater_b"]):
           (r["n_items"], r["po"], r["pe"], r["kappa"])
           for r in cohen_kappa(_ann(spark, rows), "item", "rater",
                                "label").collect()}
    for ra, rb in itertools.combinations(raters, 2):
        n, po, pe, k = ref_kappa(rows, ra, rb)
        gn, gpo, gpe, gk = got[(ra, rb)]
        assert gn == n
        assert gpo == pytest.approx(round(po, 6))
        assert gpe == pytest.approx(round(pe, 6))
        assert gk == pytest.approx(round(k, 6))
