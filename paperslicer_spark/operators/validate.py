"""Ground-truth validation join (reference
``scripts/validate_extractions.py:62-246`` +
``tests/test_extraction_validation.py:29-67``).

The reference scores each extracted record against a per-document
ground-truth "extraction map" (title/doi/journal, abstract head/tail
slices + word count, expected section keys, figure/table counts) with
weights metadata 30 / abstract 20 / sections 30 / figures 10 /
tables 10. Here the maps become a broadcast ``truth`` dimension table
joined to the extracted records; every scoring rule — including the
reference's quirks — is a JVM column expression (no Python UDF):

- fuzzy similarity is the positional char-match ratio over
  whitespace-normalized strings, ``matches / longer_len``, with the
  PRE-normalization empty check (``validate_extractions.py:44-59``);
- ``word_count_diff`` stays 0 (full credit) when the abstract was NOT
  extracted — the reference only computes it inside
  ``if abstract_text:`` (line 137-152), so a missing abstract still
  earns the 1/4 word-count component;
- a document whose truth expects no abstract gets the flat 20;
  expected_count==0 sections get the flat 15; zero expected
  figures/tables get the flat 10 each;
- ``title/journal_matches`` is bidirectional lowercase containment,
  ``doi_matches`` is exact equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRUTH_SCHEMA = (
    "conv_id string, exp_title string, exp_doi string, exp_journal string, "
    "abs_present boolean, abs_first50 string, abs_last50 string, "
    "abs_word_count int, exp_sections array<string>, "
    "exp_figures int, exp_tables int"
)

# the reference's canonical set for section scoring
# (validate_extractions.py:165) — note: narrower than the section-map
# canon (no abstract, no results_and_discussion)
SCORED_CANONICAL = ["introduction", "materials_and_methods", "results",
                    "discussion", "conclusions"]


def _ws_norm(c: Column) -> Column:
    """``' '.join(s.split())`` on the ASCII-whitespace domain."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def fuzzy_similarity(a: Column, b: Column) -> Column:
    """F12: positional char-match ratio ``matches / longer_len`` over
    whitespace-normalized strings; empties compared RAW first."""
    a = F.coalesce(a, F.lit(""))
    b = F.coalesce(b, F.lit(""))
    na, nb = _ws_norm(a), _ws_norm(b)
    ca, cb = F.split(na, ""), F.split(nb, "")
    matches = F.aggregate(
        F.zip_with(ca, cb,
                   lambda x, y: F.when((x == y) & (x != ""), 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v,
    )
    longer = F.greatest(F.length(na), F.length(nb))
    return (
        F.when((a == "") | (b == ""),
               F.when(a == b, F.lit(1.0)).otherwise(F.lit(0.0)))
        .when(longer == 0, F.lit(1.0))
        .otherwise(matches.cast("double") / longer)
    )


def _b(cond: Column) -> Column:
    return F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))


def validate_against_truth(records: DataFrame, truth: DataFrame) -> DataFrame:
    """Extracted records ⋈ truth maps → per-document component scores +
    overall (0-100). Inner join: like the reference, only documents
    with a ground-truth map are scored. The truth side is a broadcast
    dimension (tiny vs the corpus)."""
    five = F.array(*[F.lit(k) for k in SCORED_CANONICAL])
    r = records.select(
        "conv_id", "title", "doi", "journal",
        F.col("sections").getItem("abstract").alias("abs_text"),
        F.size(F.filter(
            F.map_entries("sections"),
            lambda e: F.array_contains(five, e.getField("key"))
            & (F.length(e.getField("value")) > 0))).alias("n_canon5"),
        F.size("figures").alias("n_figs"),
        F.size("tables").alias("n_tabs"),
    )
    j = r.join(F.broadcast(truth), "conv_id")

    lower_in = lambda x, y: F.instr(F.lower(y), F.lower(x)) > 0  # noqa: E731
    both = lambda x, y: (  # noqa: E731
        x.isNotNull() & (x != "") & y.isNotNull() & (y != ""))
    title_m = both(F.col("title"), F.col("exp_title")) & (
        lower_in(F.col("exp_title"), F.col("title"))
        | lower_in(F.col("title"), F.col("exp_title")))
    journal_m = both(F.col("journal"), F.col("exp_journal")) & (
        lower_in(F.col("exp_journal"), F.col("journal"))
        | lower_in(F.col("journal"), F.col("exp_journal")))
    doi_m = both(F.col("doi"), F.col("exp_doi")) & (
        F.col("doi") == F.col("exp_doi"))
    present = lambda c: c.isNotNull() & (c != "")  # noqa: E731
    meta_score = (
        _b(present(F.col("title"))) + _b(title_m)
        + _b(present(F.col("doi"))) + _b(doi_m)
        + _b(present(F.col("journal"))) + _b(journal_m)
    ) / 6.0 * 30.0

    abs_text = F.coalesce(F.col("abs_text"), F.lit(""))
    extracted = abs_text != ""
    nonblank = lambda c: c.isNotNull() & (c != "")  # noqa: E731 — Python truthiness
    f50 = F.when(extracted & nonblank(F.col("abs_first50")),
                 fuzzy_similarity(F.col("abs_first50"),
                                  F.substring(abs_text, 1, 50))
                 ).otherwise(F.lit(0.0))
    last50 = F.when(F.length(abs_text) <= 50, abs_text).otherwise(
        F.substring(abs_text, -50, 50))
    l50 = F.when(extracted & nonblank(F.col("abs_last50")),
                 fuzzy_similarity(F.col("abs_last50"), last50)
                 ).otherwise(F.lit(0.0))
    wc = F.when(F.trim(abs_text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(abs_text), r"\s+")))
    wc_diff = F.when(
        extracted & (F.coalesce(F.col("abs_word_count"), F.lit(0)) > 0),
        F.abs(wc - F.col("abs_word_count")).cast("double")
        / F.col("abs_word_count"),
    ).otherwise(F.lit(0.0))  # NOT extracted → diff stays 0 (ref quirk)
    abstract_score = F.when(
        ~F.coalesce(F.col("abs_present"), F.lit(False)), F.lit(20.0)
    ).otherwise(
        (_b(extracted) + f50 + l50 + (1.0 - F.least(wc_diff, F.lit(1.0))))
        / 4.0 * 20.0
    )

    exp_n = F.size("exp_sections")
    sections_score = F.when(
        exp_n > 0,
        F.least(F.col("n_canon5").cast("double") / exp_n, F.lit(1.0)) * 30.0,
    ).otherwise(F.lit(15.0))

    def count_score(actual: Column, expected: Column, weight: float) -> Column:
        return F.when(
            F.coalesce(expected, F.lit(0)) > 0,
            F.greatest(
                F.lit(0.0),
                1.0 - F.abs(actual - expected).cast("double") / expected,
            ) * weight,
        ).otherwise(F.lit(weight))

    figures_score = count_score(F.col("n_figs"), F.col("exp_figures"), 10.0)
    tables_score = count_score(F.col("n_tabs"), F.col("exp_tables"), 10.0)

    return j.select(
        "conv_id",
        F.round(meta_score, 4).alias("metadata_score"),
        F.round(abstract_score, 4).alias("abstract_score"),
        F.round(sections_score, 4).alias("sections_score"),
        F.round(figures_score, 4).alias("figures_score"),
        F.round(tables_score, 4).alias("tables_score"),
        F.round(meta_score + abstract_score + sections_score
                + figures_score + tables_score, 4).alias("overall_score"),
    )
