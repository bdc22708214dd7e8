"""Ground-truth validation join vs the reference scorer.

``_ref_score`` transcribes the reference's scoring loop
(``scripts/validate_extractions.py:96-246``) as an executable spec —
the same pattern as tests/lxml_shim.py: test-only oracle, never used
by the engine. The Spark operator must reproduce it exactly on a grid
of synthetic (record, truth) pairs covering every quirk branch.
"""

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.validate import (
    TRUTH_SCHEMA, fuzzy_similarity, validate_against_truth)


def _ref_fuzzy(text1, text2):
    # validate_extractions.py:44-59
    if not text1 or not text2:
        return 1.0 if text1 == text2 else 0.0
    t1 = " ".join(text1.split())
    t2 = " ".join(text2.split())
    longer_len = max(len(t1), len(t2))
    if longer_len == 0:
        return 1.0
    matches = sum(1 for a, b in zip(t1, t2) if a == b)
    return matches / longer_len


def _ref_score(rec, expected):
    # validate_extractions.py:96-246, minus the Pipeline call
    mc = {
        "title_present": bool(rec["title"]),
        "title_matches": False,
        "doi_present": bool(rec["doi"]),
        "doi_matches": False,
        "journal_present": bool(rec["journal"]),
        "journal_matches": False,
    }
    em = expected["metadata"]
    if rec["title"] and em.get("title"):
        e, a = em["title"].lower(), rec["title"].lower()
        mc["title_matches"] = e in a or a in e
    if rec["doi"] and em.get("doi"):
        mc["doi_matches"] = rec["doi"] == em["doi"]
    if rec["journal"] and em.get("journal"):
        e, a = em["journal"].lower(), rec["journal"].lower()
        mc["journal_matches"] = e in a or a in e
    comps = []
    comps.append(sum(1 for k in ("title_present", "title_matches",
                                 "doi_present", "doi_matches",
                                 "journal_present", "journal_matches")
                     if mc[k]) / 6.0 * 30)
    if expected["abstract"].get("present"):
        abstract_text = rec["sections"].get("abstract", "")
        ac = {"extracted": bool(abstract_text), "first_50_similarity": 0.0,
              "last_50_similarity": 0.0, "word_count_diff": 0}
        if abstract_text:
            if expected["abstract"].get("first_50_chars"):
                ac["first_50_similarity"] = _ref_fuzzy(
                    expected["abstract"]["first_50_chars"], abstract_text[:50])
            if expected["abstract"].get("last_50_chars"):
                ac["last_50_similarity"] = _ref_fuzzy(
                    expected["abstract"]["last_50_chars"], abstract_text[-50:])
            ewc = expected["abstract"].get("word_count", 0)
            if ewc > 0:
                ac["word_count_diff"] = abs(
                    len(abstract_text.split()) - ewc) / ewc
        comps.append((
            (1 if ac["extracted"] else 0) + ac["first_50_similarity"]
            + ac["last_50_similarity"]
            + 1 - min(ac["word_count_diff"], 1)) / 4.0 * 20)
    else:
        comps.append(20)
    exp_sections = expected.get("sections", {})
    canonical = {"introduction", "materials_and_methods", "results",
                 "discussion", "conclusions"}
    extracted_count = sum(1 for k in rec["sections"]
                          if k in canonical and rec["sections"][k])
    if len(exp_sections) > 0:
        comps.append(min(extracted_count / len(exp_sections), 1.0) * 30)
    else:
        comps.append(15)
    for kind, weight in (("figures", 10), ("tables", 10)):
        exp_n = expected["structural_info"].get(f"total_{kind}", 0)
        act_n = len(rec[kind])
        if exp_n > 0:
            comps.append(max(0, 1 - abs(act_n - exp_n) / exp_n) * weight)
        else:
            comps.append(weight)
    return sum(comps)


ABS = ("Background: posterior restorations were evaluated over time. "
       "Outcomes improved significantly across all groups tested.")

CASES = [
    # (name, record-overrides, truth-overrides)
    ("perfect", {}, {}),
    ("no_abstract_extracted", {"sections": {"introduction": "i"}}, {}),
    ("abstract_not_expected", {}, {"abstract": {"present": False}}),
    ("title_mismatch", {"title": "Entirely Different"}, {}),
    ("missing_meta", {"title": None, "doi": None, "journal": None}, {}),
    ("fig_count_off", {"figures": [{"label": "f"}] * 5}, {}),
    ("zero_expected_figs", {},
     {"structural_info": {"total_figures": 0, "total_tables": 2}}),
    ("no_expected_sections", {}, {"sections": {}}),
    ("wc_drift", {}, {"abstract": {"present": True,
                                   "first_50_chars": ABS[:50],
                                   "last_50_chars": ABS[-50:],
                                   "word_count": 40}}),
    ("slice_noise", {}, {"abstract": {"present": True,
                                      "first_50_chars": "Background: anterior restorations were evaluated x",
                                      "last_50_chars": ABS[-50:].upper(),
                                      "word_count": 16}}),
    ("empty_exp_slices", {}, {"abstract": {"present": True,
                                           "first_50_chars": "",
                                           "last_50_chars": None,
                                           "word_count": 0}}),
    ("extra_sections", {"sections": {
        "abstract": ABS, "introduction": "i", "materials_and_methods": "m",
        "results": "r", "discussion": "d", "conclusions": "c",
        "results_and_discussion": "rd"}},
     {"sections": {"introduction": True, "results": True}}),
]


def _base_record():
    return {
        "conv_id": "c0", "title": "A Study of Restorations",
        "doi": "10.1/x", "journal": "J Dent",
        "sections": {"abstract": ABS, "introduction": "intro text",
                     "results": "results text"},
        "figures": [{"label": "Figure 1"}, {"label": "Figure 2"}],
        "tables": [{"label": "Table 1"}],
    }


def _base_truth():
    return {
        "metadata": {"title": "a study of restorations", "doi": "10.1/x",
                     "journal": "Journal of J Dent Research"},
        "abstract": {"present": True, "first_50_chars": ABS[:50],
                     "last_50_chars": ABS[-50:],
                     "word_count": len(ABS.split())},
        "sections": {"introduction": True, "materials_and_methods": True,
                     "results": True},
        "structural_info": {"total_figures": 2, "total_tables": 1},
    }


def _to_spark(spark, pairs):
    recs, truths = [], []
    for cid, rec, tru in pairs:
        recs.append((cid, rec["title"], rec["doi"], rec["journal"],
                     rec["sections"],
                     [{"label": f.get("label")} for f in rec["figures"]],
                     [{"label": t.get("label")} for t in rec["tables"]]))
        truths.append((
            cid, tru["metadata"].get("title"), tru["metadata"].get("doi"),
            tru["metadata"].get("journal"),
            bool(tru["abstract"].get("present")),
            tru["abstract"].get("first_50_chars"),
            tru["abstract"].get("last_50_chars"),
            tru["abstract"].get("word_count", 0) or 0,
            sorted(tru.get("sections", {}).keys()),
            tru["structural_info"].get("total_figures", 0),
            tru["structural_info"].get("total_tables", 0)))
    records = spark.createDataFrame(
        recs, "conv_id string, title string, doi string, journal string, "
              "sections map<string,string>, "
              "figures array<struct<label:string>>, "
              "tables array<struct<label:string>>")
    truth = spark.createDataFrame(truths, TRUTH_SCHEMA)
    return records, truth


def test_truth_scoring_matches_reference(spark):
    pairs = []
    for i, (name, rec_over, tru_over) in enumerate(CASES):
        rec, tru = _base_record(), _base_truth()
        rec.update(rec_over)
        for k, v in tru_over.items():
            tru[k] = v
        pairs.append((f"c{i:02d}_{name}", rec, tru))
    records, truth = _to_spark(spark, pairs)
    got = {r["conv_id"]: r["overall_score"]
           for r in validate_against_truth(records, truth).collect()}
    assert len(got) == len(pairs)
    for cid, rec, tru in pairs:
        assert got[cid] == pytest.approx(_ref_score(rec, tru), abs=1e-3), cid


def test_fuzzy_similarity_fuzz(spark):
    """200 seeded random ASCII pairs (whitespace runs, empties, length
    skew) — the Column implementation must equal the reference formula
    on every one."""
    import random

    rng = random.Random(4242)
    alphabet = "ab cD.,\t 9-"
    pairs = [("", ""), ("", "x"), (" ", "  "), ("a", "a")]
    for _ in range(196):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        b = (a[:rng.randrange(0, len(a) + 1)] if a and rng.random() < 0.5
             else "".join(rng.choice(alphabet)
                          for _ in range(rng.randrange(0, 60))))
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select("a", "b",
                     fuzzy_similarity(F.col("a"), F.col("b")).alias("s")
                     ).collect()
    for r in rows:
        assert r["s"] == pytest.approx(_ref_fuzzy(r["a"], r["b"]),
                                       abs=1e-9), (r["a"], r["b"])


def test_fuzzy_similarity_column(spark):
    cases = [("abc", "abc"), ("abc", "abd"), ("", ""), ("", "x"),
             ("a  b\tc", "a b c"), ("short", "a much longer string")]
    df = spark.createDataFrame(cases, "a string, b string")
    rows = df.select("a", "b",
                     fuzzy_similarity(F.col("a"), F.col("b")).alias("s")
                     ).collect()
    for r in rows:
        assert r["s"] == pytest.approx(_ref_fuzzy(r["a"], r["b"]), abs=1e-9)
