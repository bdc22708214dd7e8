"""Turns → documents: order-stable, skew-defused payload assembly.

The reference processes whole documents (one PDF → one TEI); our input
is the transcripts table where a document's markup is split across
turns (FIXTURES.md §1). This stage reassembles per-conversation
payloads with:

- **stable turn ordering** enforced by sorting position-tagged structs
  (never bare ``collect_list`` — its order is nondeterministic under
  parallel execution; SURVEY.md §4.4);
- **salted two-phase aggregation** to defuse long-conversation skew
  (north_rule): phase 1 groups on ``(conv_id, turn_block)`` so a
  10^5-turn conversation is pre-concatenated by many tasks, phase 2
  merges the few block rows per conversation;
- everything JVM-side (built-in higher-order functions, no UDF) so the
  whole stage stays in Tungsten until the parse UDF.

Envelope contract (kept in sync with sources/transcripts.py
``assemble_payload``): fragments classified by prefix into header /
facsimile / body / back, wrapped as
``<TEI xmlns>{header}{facs}<text><body>{body}</body>{back}</text></TEI>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from paperslicer_spark.sources.transcripts import ENVELOPE_OPEN

_CLASSES = [
    ("header", "<teiHeader"),
    ("facs", "<facsimile"),
    ("back", "<back"),
]


def _classify(col):
    expr = F.lit("body")
    for name, prefix in _CLASSES:
        expr = F.when(F.startswith(col, F.lit(prefix)), F.lit(name)).otherwise(expr)
    return expr


def _ordered_concat(pairs_col):
    """array<struct<pos,text>> → text concatenated in pos order."""
    return F.array_join(
        F.transform(F.array_sort(pairs_col), lambda s: s.getField("text")), ""
    )


def assemble_documents(turns: DataFrame, salt_blocks: int = 0) -> DataFrame:
    """Assemble ``(conv_id, payload)`` from transcript turns.

    ``salt_blocks``: when > 0, turn rows are pre-aggregated per
    ``(conv_id, floor(turn_idx / salt_blocks))`` before the final
    per-conversation merge — bounds the row count any single reducer
    sees for skewed conversations. 0 disables the extra stage (fine
    when AQE skew handling suffices or turn counts are uniform).
    """
    t = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        _classify(F.col("text")).alias("frag_class"),
        "text",
    ).where(F.col("text").isNotNull() & (F.length("text") > 0))

    if salt_blocks and salt_blocks > 0:
        blocks = (
            t.groupBy(
                "conv_id",
                "frag_class",
                (F.col("turn_idx") / F.lit(salt_blocks)).cast("int").alias("blk"),
            )
            .agg(
                _ordered_concat(
                    F.collect_list(F.struct(F.col("turn_idx").alias("pos"), "text"))
                ).alias("text"),
            )
            .select("conv_id", "frag_class", F.col("blk").alias("pos"), "text")
        )
        t = blocks
    else:
        t = t.select("conv_id", "frag_class", F.col("turn_idx").alias("pos"), "text")

    per_class = (
        t.groupBy("conv_id")
        .agg(
            *[
                _ordered_concat(
                    F.collect_list(
                        F.when(F.col("frag_class") == name, F.struct("pos", "text"))
                    )
                ).alias(name)
                for name in ("header", "facs", "back", "body")
            ]
        )
    )
    payload = F.concat(
        F.lit(ENVELOPE_OPEN),
        F.col("header"),
        F.col("facs"),
        F.lit("<text><body>"),
        F.col("body"),
        F.lit("</body>"),
        F.col("back"),
        F.lit("</text></TEI>"),
    )
    return per_class.select("conv_id", payload.alias("payload"))
