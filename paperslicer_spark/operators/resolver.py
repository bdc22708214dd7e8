"""Abstract backfill — J3 as a lookup join (reference
``metadata/resolver.py:9-49`` + ``providers/{crossref,pubmed}.py``).

The reference calls Crossref/PubMed HTTPS per document; executors must
never make network calls at 10^12-turn scale, so the providers become
static lookup tables joined in (SURVEY.md §2.3 J3):

- ``crossref(doi_lc | title_lc → abstract_jats, doi, title, journal)``
- ``pubmed(doi_lc | title_lc → abstract)``

Semantics preserved: backfill only when the existing abstract is
missing or shorter than 30 chars; Crossref wins over PubMed; a
Crossref hit also backfills missing doi/title/journal; JATS tags are
stripped + whitespace-collapsed + HTML-unescaped (F6,
``providers/crossref.py:19-24``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LOOKUP_SCHEMA = (
    "key string, abstract string, doi string, title string, journal string"
)


def strip_jats(col):
    """F6: remove ``<jats:...>`` tags, collapse whitespace, unescape
    HTML entities. Tag strip + collapse are JVM regexes; unescape of
    the common entities is a translate/replace chain (the general
    ``html.unescape`` lives in Python — rare entities are out of the
    hot path)."""
    s = F.regexp_replace(col, r"<[^>]+>", " ")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'")]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def _norm_key(col):
    return F.lower(F.trim(col))


def ensure_abstract(records: DataFrame, crossref: DataFrame,
                    pubmed: DataFrame) -> DataFrame:
    """Backfill ``sections['abstract']`` (and missing meta fields) from
    broadcast lookup tables. Join priority: crossref by doi → crossref
    by title → pubmed by doi → pubmed by title (resolver.py:21-44)."""
    cr = crossref.select(
        F.col("key").alias("cr_key"),
        strip_jats(F.col("abstract")).alias("cr_abs"),
        F.col("doi").alias("cr_doi"),
        F.col("title").alias("cr_title"),
        F.col("journal").alias("cr_journal"),
    )
    pm = pubmed.select(
        F.col("key").alias("pm_key"),
        F.col("abstract").alias("pm_abs"),
    )
    r = records.withColumn("_doi_k", _norm_key(F.coalesce("doi", F.lit(""))))
    r = r.withColumn("_title_k", _norm_key(F.coalesce("title", F.lit(""))))

    def left(df, lk, key_col, out_prefix):
        renamed = lk
        for c in lk.columns:
            renamed = renamed.withColumnRenamed(c, f"{out_prefix}{c}")
        return df.join(
            F.broadcast(renamed),
            df[key_col] == renamed[f"{out_prefix}{lk.columns[0]}"], "left")

    r = left(r, cr, "_doi_k", "d_")
    r = left(r, cr, "_title_k", "t_")
    r = left(r, pm, "_doi_k", "pd_")
    r = left(r, pm, "_title_k", "pt_")

    existing = F.col("sections").getItem("abstract")
    # materialize the predicate BEFORE sections is overwritten below —
    # otherwise later withColumns would re-evaluate it against the
    # already-backfilled map and skip the meta backfill
    r = r.withColumn("_needs", existing.isNull() | (F.length(existing) < 30))
    needs = F.col("_needs")
    ok = lambda c: F.when(F.length(c) >= 30, c)  # noqa: E731
    has_doi = F.col("_doi_k") != ""
    has_title = F.col("_title_k") != ""
    # reference gating (resolver.py:22-26): the Crossref title search
    # runs ONLY when the DOI lookup returned NO item — a doi-keyed item
    # with a missing/short abstract does NOT fall through to the title
    # hit, it falls through to PubMed. Exactly one "item" is chosen.
    doi_item = has_doi & F.col("d_cr_key").isNotNull()
    title_item = ~doi_item & has_title & F.col("t_cr_key").isNotNull()
    cr_hit = ok(F.when(doi_item, F.col("d_cr_abs"))
                .when(title_item, F.col("t_cr_abs")))
    # PubMed esearch term is the DOI whenever a doi exists (pubmed.py
    # _esearch_term): the title is used only for doi-less records
    pm_hit = ok(F.when(has_doi, F.col("pd_pm_abs"))
                .otherwise(F.col("pt_pm_abs")))
    new_abs = F.coalesce(cr_hit, pm_hit)

    filled = F.when(
        needs & new_abs.isNotNull(),
        F.map_concat(
            F.map_filter(F.col("sections"), lambda k, _: k != "abstract"),
            F.create_map(F.lit("abstract"), new_abs),
        ),
    ).otherwise(F.col("sections"))

    # meta backfill comes from the SAME item that supplied the accepted
    # abstract (resolver.py:30-40), never from the other key's row
    cr_field = lambda d, t: F.when(doi_item, d).when(title_item, t)  # noqa: E731
    backfill_meta = needs & cr_hit.isNotNull()
    out = (
        r.withColumn("sections", filled)
        .withColumn("doi", F.when(
            backfill_meta & F.col("doi").isNull(),
            cr_field(F.col("d_cr_doi"), F.col("t_cr_doi"))).otherwise(F.col("doi")))
        .withColumn("title", F.when(
            backfill_meta & F.col("title").isNull(),
            cr_field(F.col("d_cr_title"), F.col("t_cr_title"))).otherwise(F.col("title")))
        .withColumn("journal", F.when(
            backfill_meta & F.col("journal").isNull(),
            cr_field(F.col("d_cr_journal"), F.col("t_cr_journal"))).otherwise(F.col("journal")))
    )
    drop = [c for c in out.columns if c.startswith(("d_", "t_", "pd_", "pt_", "_"))]
    return out.drop(*drop)
