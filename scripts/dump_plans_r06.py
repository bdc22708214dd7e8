"""Dump .explain('formatted') for the round-6 optimization targets.

Usage: python scripts/dump_plans_r06.py <before|after> [name ...]

Writes plans/r06/<name>_<tag>.txt for each bench entry (the 5
extraction paths + the 10 registered bench queries) plus any extra
registered query names passed on the command line. Read-only —
plans are captured without executing the queries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from paperslicer_spark.operators.assemble import assemble_documents
from paperslicer_spark.operators.extract import (
    extract_sections_direct,
    extract_sections_fused,
    parse_documents,
    parse_turns_fused,
    sections_long,
)
from paperslicer_spark.operators.spans import extract_turn_spans
from paperslicer_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "plans", "r06")

BENCH_QUERIES = [
    "q01_pricing_summary", "q05_priority_concat", "q11_jaccard_pairs",
    "q12_embedding_topk", "q16_sessionize", "q19_canonical_headings",
    "x27_gopher_quality", "x28_stratified_sample", "x52_c4_line_filter",
    "x58_rolling_agg",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    extra = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_docs = max(int(100000 * sf), 200)
    os.makedirs(OUT, exist_ok=True)

    spark = get_spark(app_name="plans-r06", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = os.path.join(REPO, ".bench_cache", f"transcripts_sf{sf}_n{n_docs}")
    turns = spark.read.parquet(corpus)

    targets = {
        "extract_turn_spans": lambda: extract_turn_spans(turns),
        "extract_records": lambda: sections_long(
            parse_turns_fused(turns, conv_aligned=True)),
        "extract_records_salted_agg": lambda: sections_long(
            parse_documents(assemble_documents(turns, skew_threshold=64))),
        "extract_sections_direct": lambda: extract_sections_direct(
            assemble_documents(turns, skew_threshold=64)),
        "extract_sections_fused": lambda: extract_sections_fused(
            turns, conv_aligned=True),
    }
    qs = entrymod.queries()
    for name in BENCH_QUERIES + extra:
        targets[name] = lambda n=name: qs[n](spark, sf_dir)

    for name, fn in targets.items():
        try:
            plan = fn()._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"{name:34s} -> {os.path.relpath(path, REPO)}")
    spark.stop()


if __name__ == "__main__":
    main()
