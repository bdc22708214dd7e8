"""Heading-canonicalizer parity (SURVEY.md §7.1 M1).

Layers: (a) the reference's own test assertions verbatim
(``/root/reference/tests/test_sections_mapping.py``), (b) exhaustive
differential vs the reference module over every EXACT_MAP key and many
decorated variants, (c) hypothesis fuzz differential.
"""

import string

from hypothesis import given, settings, strategies as st

from paperslicer_spark.functions.sections import (
    canonical_section_name,
    non_content_keys,
    exact_map,
)


def test_common_synonyms_map_to_methods():
    assert canonical_section_name("Statistical analysis") == "materials_and_methods"
    assert canonical_section_name("Sample Preparation") == "materials_and_methods"
    assert canonical_section_name("Eligibility Criteria") == "materials_and_methods"
    assert canonical_section_name("Inclusion and Exclusion Criteria") == "materials_and_methods"


def test_intro_discussion_conclusions_mappings():
    assert canonical_section_name("Background") == "introduction"
    assert canonical_section_name("Limitations") == "discussion"
    assert canonical_section_name("Clinical Significance") == "conclusions"


def test_non_content_remains_flagged():
    assert canonical_section_name("Funding") in non_content_keys()
    assert canonical_section_name("Acknowledgements") in non_content_keys()


def test_specific_titles_do_not_become_canonical():
    s = canonical_section_name("Epidemiology of benign oesophageal strictures")
    assert s not in {"introduction", "materials_and_methods", "results",
                     "discussion", "conclusions", "results_and_discussion"}


def test_sanitization_and_numbering():
    assert canonical_section_name("| Clinical Examinations") == "materials_and_methods"
    assert canonical_section_name("3.2. Statistical Analysis") == "materials_and_methods"
    assert canonical_section_name("II. Results") == "results"
    assert canonical_section_name("") == ""


def _decorations(head):
    yield head
    yield head.upper()
    yield head.title()
    yield f"| {head}"
    yield f"3.1. {head}"
    yield f"  -- {head}  "
    yield f"IV. {head}"


def test_exhaustive_exact_map_differential(reference_modules):
    _, ref_mapping, _ = reference_modules
    for raw in exact_map():
        for variant in _decorations(raw):
            assert canonical_section_name(variant) == \
                ref_mapping.canonical_section_name(variant), variant


def test_rule_cascade_differential(reference_modules):
    _, ref_mapping, _ = reference_modules
    probes = [
        "Bayesian meta-analysis of outcomes",
        "Patient population and statistics",
        "Aims of the present work",
        "General discussion of findings and results",
        "Concluding remarks",
        "Key results overview",
        "Something entirely novel here",
        "results & discussion",
        "Study aims",  # intro via 'aim'
        "heterogeneity assessment approach",
    ]
    for p in probes:
        assert canonical_section_name(p) == ref_mapping.canonical_section_name(p), p


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits + " .|-–—:&'()",
               max_size=60))
def test_fuzz_differential(reference_modules, s):
    _, ref_mapping, _ = reference_modules
    assert canonical_section_name(s) == ref_mapping.canonical_section_name(s)


def test_spark_column_variant(spark, reference_modules):
    """The JVM-side column expression must agree with the Python path
    on ASCII headings (the engine's declared domain for that variant)."""
    _, ref_mapping, _ = reference_modules
    from paperslicer_spark.functions.sections import canonical_section_col
    from pyspark.sql import functions as F

    heads = sorted(exact_map().keys())
    probes = [v for h in heads[:80] for v in (h, h.title(), f"2. {h}")]
    probes += ["Bayesian framework statistics", "Key results overview", "Novel Protocol"]
    df = spark.createDataFrame([(p,) for p in probes], "head string")
    got = {r["head"]: r["key"] for r in
           df.select("head", canonical_section_col(F.col("head")).alias("key")).collect()}
    for p in probes:
        assert got[p] == ref_mapping.canonical_section_name(p), p
