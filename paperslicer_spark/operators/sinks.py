"""Record sinks (reference K1/K2/K3, ``project.py:51-54,143-205``).

The reference writes one pretty JSON per document and JSONL with a
driver-side first-wins dedup; at scale those become:

- K1: partitioned JSON/Parquet (one-file-per-doc is an anti-pattern;
  a deterministic per-doc filename column is provided instead);
- K2: JSONL with the exact two-keyspace first-wins dedup as a window
  (operators/dedup.first_wins_dedup), then ``df.write.json``;
- K3: tiny exports via ``coalesce(1)`` — explicitly only for small
  result sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from paperslicer_spark.operators.dedup import first_wins_dedup


def with_doc_filename(records: DataFrame) -> DataFrame:
    """K1's ``<stem>.json`` analog: deterministic output name per doc
    (conv_id + 8-hex content-address, F11-style ``_safe_stem``)."""
    return records.withColumn(
        "doc_file",
        F.concat(F.col("conv_id"), F.lit("_"),
                 F.substring(F.sha1(F.col("conv_id")), 1, 8),
                 F.lit(".json")),
    )


def write_records_json(records: DataFrame, path: str,
                       partitions: int | None = None) -> None:
    """K1 at scale: newline-delimited JSON, partitioned."""
    df = with_doc_filename(records)
    if partitions:
        df = df.repartition(partitions, "conv_id")
    df.write.mode("overwrite").json(path)


def write_records_jsonl_dedup(records: DataFrame, path: str) -> None:
    """K2: first-wins dedup by lower(doi) else lower(title) in
    (conv_id) arrival order, then JSONL."""
    deduped = first_wins_dedup(records, "doi", "title", ["conv_id"])
    deduped.write.mode("overwrite").json(path)


def write_mapping_suggestions(suggestions: DataFrame, out_dir: str) -> None:
    """K6 report sink: ``mapping_suggestions.{json,txt}`` in the
    reference's exact shapes (``evaluate_corpus.py:408-412`` — json is
    a head→key object, txt is ``head -> key`` lines, most-frequent
    first). Driver-side single-file write is correct here: the input is
    already a per-head rollup, tiny by construction."""
    import json
    import os

    rows = suggestions.collect()
    sugg = {r["head"]: r["suggestion"] for r in rows}
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "mapping_suggestions.json"), "w",
              encoding="utf-8") as f:
        json.dump(sugg, f, ensure_ascii=False, indent=2)
    with open(os.path.join(out_dir, "mapping_suggestions.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(f"{k} -> {v}" for k, v in sugg.items()))


def write_per_document_csv(per_doc: DataFrame, path: str,
                           partitions: int | None = None) -> None:
    """K6: the reference's ``corpus_quality.csv`` analog — headered CSV
    of per-document metrics (metrics.per_document_metrics). Partitioned
    write; the reference's single file is a ``coalesce(1)`` away for
    small corpora."""
    df = per_doc
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").option("header", True).csv(path)


def write_small_export(df: DataFrame, path: str, max_rows: int = 100_000) -> None:
    """K3: single-file export, guarded against large results."""
    n = df.count()
    if n > max_rows:
        raise ValueError(f"refusing single-file export of {n} rows")
    df.coalesce(1).write.mode("overwrite").json(path)
