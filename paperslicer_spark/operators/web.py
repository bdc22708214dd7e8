"""URL hygiene for web-crawl corpus curation.

Crawl-derived training corpora dedup and group pages by CANONICAL URL
(CCNet / RefinedWeb / Dolma all normalize URLs before URL-level dedup
and host-level quality joins): scheme and host are case-insensitive,
default ports are noise, tracking query parameters (utm_*, gclid,
fbclid, ...) vary per crawl path without changing content, query
parameter order is arbitrary, and fragments never reach the server.
The reference repo has no web stage — this module is part of the
training-data-pipeline extension layer, alongside dedup/curation.

Design notes (100 TB shape):

* Pure JVM string expressions — ``regexp_extract`` component split +
  higher-order ``filter``/``array_sort`` over the query params.  Zero
  shuffles, zero Python; whole-stage codegen end to end, so the op
  composes with a scan at full throughput and streams unmodified.
* The tracking-param list enters the HOF lambda as a FOLDABLE literal
  array — constant-folded once, not the per-element re-evaluation
  trap of COMPUTED outer expressions (CLAUDE.md round-4 invariant;
  ``text_stats.bind`` exists for the computed case).
* Canonical form (conservative, lossless for ranking purposes):
  lowercase scheme + host, strip a single leading ``www.``, drop
  scheme-default ports (http:80 / https:443), drop the fragment, drop
  tracking params, sort surviving params bytewise, strip one trailing
  slash from non-root paths, empty path -> ``/``.  Non-URL strings
  yield NULL components (filter or quarantine upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F

#: Query parameters dropped during canonicalization (content-neutral
#: click/campaign trackers).  Shared verbatim with the x79 oracle SQL.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "mc_cid", "mc_eid", "ref",
)

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _canon_query(query: Column) -> Column:
    """Sorted, tracker-free query string ('' when nothing survives)."""
    parts = F.split(query, "&")
    tracking = F.array(*[F.lit(p) for p in TRACKING_PARAMS])
    kept = F.filter(
        parts,
        lambda p: (p != F.lit(""))
        & ~F.array_contains(tracking, F.substring_index(p, "=", 1)),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Add ``host``, ``path_canon``, ``query_canon``, ``url_canon``.

    ``url_canon`` is the dedup/group key; ``host`` feeds host-level
    joins (PageRank priors, blocklists).  Rows whose ``url_col`` does
    not parse as ``scheme://host...`` get NULL in all four columns.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(url, _URL_RE, 2))
    port = F.regexp_extract(url, _URL_RE, 3)
    path0 = F.regexp_extract(url, _URL_RE, 4)
    query = F.regexp_extract(url, _URL_RE, 5)

    host = F.when(host0.startswith("www."),
                  host0.substr(F.lit(5), F.length(host0))
                  ).otherwise(host0)
    # keep only non-default ports
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443"))
    port_part = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port))
    path = F.when(path0 == "", F.lit("/")).otherwise(
        F.when((F.length(path0) > 1) & path0.endswith("/"),
               path0.substr(F.lit(1), F.length(path0) - 1))
        .otherwise(path0))
    qcanon = _canon_query(query)

    parsed = scheme != ""
    canon = F.concat(
        scheme, F.lit("://"), host, port_part, path,
        F.when(qcanon == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qcanon)))
    nul = F.lit(None).cast("string")
    return df.withColumns({
        "host": F.when(parsed, host).otherwise(nul),
        "path_canon": F.when(parsed, path).otherwise(nul),
        "query_canon": F.when(parsed, qcanon).otherwise(nul),
        "url_canon": F.when(parsed, canon).otherwise(nul),
    })


def url_dup_groups(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Canonicalize and annotate each row with its duplicate-group size.

    One window over ``url_canon`` (single shuffle); the first-wins /
    keep-best selection composes downstream exactly like
    ``dedup.exact_dedup``.  Output: ``(id, host, url_canon, n_dups)``.
    """
    from pyspark.sql import Window

    canon = canonicalize_urls(df, url_col)
    return canon.select(
        F.col(id_col), "host", "url_canon",
        F.count("*").over(Window.partitionBy("url_canon"))
        .alias("n_dups"))


def path_prefix_rollup(df: DataFrame, url_col: str,
                       depth: int = 2) -> DataFrame:
    """Crawl-frontier budget rollup: page counts per (host, first
    ``depth`` path segments) — the table a crawl scheduler reads to
    budget politeness quotas and spot infinite calendar/faceted
    traps (one prefix ballooning to millions of URLs).

    Built on :func:`canonicalize_urls`' host/path so tracking params
    and case noise are already gone.  ``prefix`` is ``/seg1/seg2``
    truncated to however many segments exist (root pages roll up to
    ``/``).

    Scale: pure codegen string ops on the base scan + ONE map-side-
    combined groupBy over the prefix-domain-sized key space.
    """
    c = canonicalize_urls(df, url_col)
    segs = F.split(F.regexp_replace(F.col("path_canon"), "^/", ""), "/")
    prefix = F.concat(F.lit("/"), F.array_join(
        F.slice(segs, 1, depth), "/"))
    return (c.where(F.col("host").isNotNull())
            .select("host",
                    F.when(F.col("path_canon") == "/", F.lit("/"))
                     .otherwise(prefix).alias("prefix"))
            .groupBy("host", "prefix")
            .agg(F.count("*").alias("n_pages")))
