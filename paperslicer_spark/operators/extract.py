"""Document extraction: fused Arrow-batched parse UDF + exploded views.

This is the Spark-side replacement for the reference's per-PDF loop
(``project.py:174-192`` → ``pipeline.process``): ONE ``mapInPandas``
stage runs the whole record assembly (DOM-lite parse + table merge +
review profile) per document, so there is exactly one
JVM↔Python/Arrow boundary on the hot path (SURVEY.md §4.6).

Error model mirrors the reference's per-document try/except
(``project.py:57-62``): failures become ``status='error'`` rows, never
task failures — at 10^12-turn scale one malformed payload must not
kill a stage.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, functions as F

RECORD_SCHEMA = (
    "conv_id string, status string, error string, "
    "title string, journal string, doi string, "
    "authors array<struct<name:string,affiliation:string>>, "
    "keywords array<string>, "
    "sections map<string,string>, "
    "other_sections array<struct<head:string,text:string>>, "
    "figures array<struct<label:string,caption:string,path:string,source:string,coords:string>>, "
    "tables array<struct<label:string,caption:string,path:string,source:string,coords:string>>, "
    "references array<struct<index:int,text:string,id:string,title:string,doi:string,year:string,authors:array<string>>>"
)

_EMPTY = {
    "title": None, "journal": None, "doi": None, "authors": [],
    "keywords": [], "sections": {}, "other_sections": [],
    "figures": [], "tables": [], "references": [],
}


def _flatten(conv_id: str, rec: dict) -> dict:
    meta = rec.get("meta") or {}
    return {
        "conv_id": conv_id,
        "status": "ok",
        "error": None,
        "title": meta.get("title"),
        "journal": meta.get("journal"),
        "doi": meta.get("doi"),
        "authors": [
            {"name": a.get("name"), "affiliation": a.get("affiliation")}
            for a in (meta.get("authors") or [])
        ],
        "keywords": list(meta.get("keywords") or []),
        "sections": dict(rec.get("sections") or {}),
        "other_sections": [
            {"head": h, "text": t}
            for h, t in (rec.get("other_sections") or {}).items()
        ],
        "figures": [
            {"label": f.get("label"), "caption": f.get("caption"),
             "path": f.get("path"), "source": f.get("source"),
             "coords": f.get("coords")}
            for f in (rec.get("figures") or [])
        ],
        "tables": [
            {"label": t.get("label"), "caption": t.get("caption"),
             "path": t.get("path"), "source": t.get("source"),
             "coords": t.get("coords")}
            for t in (rec.get("tables") or [])
        ],
        "references": [
            {"index": r.get("index"), "text": r.get("text"),
             "id": r.get("id"), "title": r.get("title"),
             "doi": r.get("doi"), "year": r.get("year"),
             "authors": list(r.get("authors") or [])}
            for r in (rec.get("references") or [])
        ],
    }


def parse_documents(docs: DataFrame, merge_tables: bool = True,
                    review_mode: Optional[bool] = None) -> DataFrame:
    """``(conv_id, payload)`` → typed record rows.

    ``review_mode``: True forces the review profile, False disables it,
    None applies the reference heuristic (``journals/review.py:10-20``).
    """

    _COLS = ["conv_id", "status", "error", "title", "journal", "doi",
             "authors", "keywords", "sections", "other_sections",
             "figures", "tables", "references"]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from paperslicer_spark.extraction.tei import parse_tei
        from paperslicer_spark.extraction.merge import merge_table_entries
        from paperslicer_spark.extraction.review import should_apply, apply_review

        for pdf in batches:
            cols: dict = {c: [] for c in _COLS}
            for conv_id, payload in zip(pdf["conv_id"], pdf["payload"]):
                try:
                    rec = parse_tei(payload, source_path=conv_id)
                    if merge_tables:
                        merge_table_entries(rec)
                    if review_mode is True or (review_mode is None and should_apply(rec)):
                        apply_review(rec)
                    row = _flatten(conv_id, rec)
                except Exception as e:  # noqa: BLE001 — error-row model
                    row = dict(_EMPTY)
                    row.update(conv_id=conv_id, status="error",
                               error=f"{type(e).__name__}: {e}")
                for c in _COLS:
                    cols[c].append(row[c])
            yield pd.DataFrame(cols)

    return docs.mapInPandas(run, schema=RECORD_SCHEMA)


SECTIONS_SCHEMA = (
    "conv_id string, section_label string, clean_text string, "
    "is_canonical boolean"
)


def extract_sections_direct(docs: DataFrame, merge_tables: bool = True,
                            review_mode: Optional[bool] = None) -> DataFrame:
    """``(conv_id, payload)`` → long-form sections rows directly.

    Row-equivalent to ``sections_long(parse_documents(docs))`` but the
    explode happens inside the UDF, so only flat string rows cross the
    Arrow boundary — no nested record structs. Use when downstream
    needs only sections (the common 100 TB case); the full record
    stage remains the source of figures/tables/references/meta.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from paperslicer_spark.extraction.tei import parse_tei
        from paperslicer_spark.extraction.merge import merge_table_entries
        from paperslicer_spark.extraction.review import should_apply, apply_review

        for pdf in batches:
            conv_ids, labels, texts, canon = [], [], [], []
            for conv_id, payload in zip(pdf["conv_id"], pdf["payload"]):
                try:
                    rec = parse_tei(payload, source_path=conv_id)
                    if merge_tables:
                        merge_table_entries(rec)
                    if review_mode is True or (review_mode is None
                                               and should_apply(rec)):
                        apply_review(rec)
                except Exception:  # noqa: BLE001 — error-row model
                    continue
                for k, v in rec["sections"].items():
                    conv_ids.append(conv_id)
                    labels.append(k)
                    texts.append(v)
                    canon.append(True)
                for k, v in rec["other_sections"].items():
                    conv_ids.append(conv_id)
                    labels.append(k)
                    texts.append(v)
                    canon.append(False)
            yield pd.DataFrame({
                "conv_id": conv_ids, "section_label": labels,
                "clean_text": texts, "is_canonical": canon,
            })

    return docs.mapInPandas(run, schema=SECTIONS_SCHEMA)


def sections_long(records: DataFrame) -> DataFrame:
    """Exploded long-form sections table — the north_star's
    ``(conv_id, section_label, is_canonical, clean_text)`` view.

    Single-pass: canonical map entries and other_sections structs are
    concatenated into one array before ONE explode, so the upstream
    parse UDF runs exactly once (a union of two selects would
    re-execute the whole parse stage per branch).
    """
    entry = lambda label, text, canon: F.struct(  # noqa: E731
        label.alias("section_label"), text.alias("clean_text"),
        canon.alias("is_canonical"))
    arr = F.concat(
        F.transform(
            F.map_entries("sections"),
            lambda e: entry(e.getField("key"), e.getField("value"), F.lit(True)),
        ),
        F.transform(
            F.col("other_sections"),
            lambda o: entry(o.getField("head"), o.getField("text"), F.lit(False)),
        ),
    )
    return records.select("conv_id", F.explode(arr).alias("s")).select(
        "conv_id", "s.section_label", "s.clean_text", "s.is_canonical")


def media_long(records: DataFrame) -> DataFrame:
    """Figures+tables exploded with kind + per-document position —
    single explode, same one-parse-pass rationale as sections_long."""
    def tagged(col: str, kind: str):
        return F.transform(
            F.col(col),
            lambda m, i: F.struct(
                F.lit(kind).alias("kind"), i.alias("pos"),
                m.getField("label").alias("label"),
                m.getField("caption").alias("caption"),
                m.getField("path").alias("path"),
                m.getField("source").alias("source"),
                m.getField("coords").alias("coords"),
            ),
        )
    arr = F.concat(tagged("figures", "figure"), tagged("tables", "table"))
    return records.select("conv_id", F.explode(arr).alias("m")).select(
        "conv_id", "m.kind", "m.pos", "m.label", "m.caption", "m.path",
        "m.source", "m.coords")


def references_long(records: DataFrame) -> DataFrame:
    return records.select(
        "conv_id", F.explode("references").alias("r")
    ).select(
        "conv_id",
        F.col("r.index").alias("ref_index"),
        F.col("r.text").alias("text"),
        F.col("r.id").alias("ref_id"),
        F.col("r.title").alias("title"),
        F.col("r.doi").alias("doi"),
        F.col("r.year").alias("year"),
        F.col("r.authors").alias("authors"),
    )
