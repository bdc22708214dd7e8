"""Structured-Streaming variant of the per-turn extraction.

The reference is strictly batch (SURVEY.md §2.14); this is the
engine's additive streaming surface for transcript turns arriving
continuously: per-turn span extraction is stateless (map-only), so it
composes directly with ``readStream``; the windowed rollup shows the
watermark + tumbling-window pattern for late turns.

Run via tests (file source + memory sink) — no external broker in the
sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from paperslicer_spark.operators.spans import extract_turn_spans
from paperslicer_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def stream_turns(spark: SparkSession, path: str,
                 max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_spans(turns: DataFrame) -> DataFrame:
    """Stateless per-turn span extraction over a stream."""
    return extract_turn_spans(turns)


def streaming_turn_rates(turns: DataFrame, watermark: str = "10 minutes",
                         window: str = "5 minutes") -> DataFrame:
    """Tumbling-window turn counts with a watermark for late arrivals."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"),
             F.sum(F.length("text")).alias("n_chars"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "role",
                "n_turns", "n_chars")
    )


def streaming_dedup(turns: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup for at-least-once turn sources: drop
    re-delivered rows by ``(conv_id, turn_idx, md5(text))`` within the
    watermark. ``dropDuplicatesWithinWatermark`` bounds the dedup
    state by event time (a plain streaming ``dropDuplicates`` grows
    state forever at 10^12-turn scale); a replay arriving later than
    the watermark re-emits — pair with ``dedup_after`` downstream, the
    same remedy as the tombstone-expiry straggler."""
    keyed = turns.withColumn(
        "_fp", F.md5(F.coalesce(F.col("text"), F.lit(""))))
    return (
        keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "_fp"])
        .drop("_fp")
    )
