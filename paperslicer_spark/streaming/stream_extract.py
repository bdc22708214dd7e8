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


def streaming_session_stats(turns: DataFrame,
                            watermark: str = "10 minutes",
                            gap: str = "5 minutes") -> DataFrame:
    """Event-time session windows per conversation: a session extends
    while consecutive turns arrive within ``gap`` of each other and
    closes once the watermark passes the last turn + gap.

    ``F.session_window`` is the built-in dynamic-gap session operator
    (state = one open window per active key, merged on overlap) — the
    declarative twin of the gaps-and-islands batch sessionization
    (q16) and a different state class from the custom
    ``applyInPandasWithState`` assembler: Spark manages merge/expiry
    from the watermark, no user state schema at all. Append mode emits
    each session exactly once, when it closes.
    """
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"),
             F.sum(F.length(F.coalesce("text", F.lit("")))).alias("n_chars"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "conv_id", "n_turns", "n_chars")
    )


def curation_funnel(docs: DataFrame, id_col: str, text_col: str,
                    strata_col: str, rates: dict[str, float],
                    default_rate: float = 0.0,
                    ts_col: str = "ts",
                    watermark: str = "10 minutes",
                    **quality_kw) -> DataFrame:
    """The composed curation pipeline — exact dedup → Gopher quality
    gate → deterministic stratified sample — as ONE plan that runs on
    a batch DataFrame or a ``readStream`` unchanged (round-4 VERDICT
    item #6: each stage was individually streaming-tested; this is the
    end-to-end funnel).

    Streaming-safety by construction: dedup state is watermark-bounded
    (``dropDuplicatesWithinWatermark``), the quality gate is a
    stateless per-row map (zero-shuffle ``F.aggregate`` form), and the
    sample is a map-side seeded-hash filter — so the whole funnel is
    append-mode with exactly one bounded-state operator, and the batch
    and streaming results are identical on the same input (parity test
    in tests/test_sinks_stateful.py).

    Output: ``(doc, word_count, mean_word_len, frac_unique,
    frac_top_bigram, <strata_col>, keep, bucket)`` — quality survivors
    inside their stratum's sample.
    """
    from paperslicer_spark.operators.curation import (gopher_quality,
                                                      stratified_sample)

    keyed = docs.withColumn(
        "_fp", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
    if docs.isStreaming:
        deduped = (
            keyed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([id_col, "_fp"])
            .drop("_fp"))
    else:
        deduped = keyed.dropDuplicates([id_col, "_fp"]).drop("_fp")
    gq = gopher_quality(deduped, id_col, text_col,
                        carry_cols=[strata_col], **quality_kw) \
        .where(F.col("keep"))
    return stratified_sample(gq, "doc", strata_col, rates,
                             default_rate=default_rate)
