"""Mergeable sketches for corpus-scale frequency analytics.

Count-min sketch (Cormode & Muthukrishnan 2005) as a relational
operator pair: ``cms_sketch`` folds any item stream into a fixed
``depth x width`` counter RELATION, and ``cms_estimate`` answers point
frequency queries with the classic min-over-rows upper bound.

Why a sketch when groupBy exists: the sketch is FIXED-SIZE, MERGEABLE
state. At 100 TB the exact (token, count) relation is corpus-vocab
sized (billions of rows of typo tail); the sketch is depth*width
counters regardless of vocab, map-side partial aggregation bounds the
shuffle at depth*width rows PER PARTITION, and daily/shard sketches
union + re-sum into one (the streaming/incremental story) — none of
which the exact aggregate can do.

Hashing is the engine's shared md5 + affine family
(``dedup.minhash_affine_params``) so the DuckDB oracle reproduces
every counter bit-for-bit — same constants imported from the same
place, the x09/x41 cannot-drift pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from paperslicer_spark.functions.text_stats import md5_bigint
from paperslicer_spark.operators.dedup import (MINHASH_BASE_HEX,
                                               MINHASH_PRIME,
                                               minhash_affine_params)


def _bucket(h, j_params, width: int):
    a, b = j_params
    return F.pmod(
        F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_PRIME)),
        F.lit(width))


def cms_sketch(df: DataFrame, item_expr, depth: int = 4,
               width: int = 1024) -> DataFrame:
    """Fold ``item_expr`` occurrences into a ``(j, bucket, c)`` counter
    relation (``depth * width`` rows max). One shuffle whose size is
    bounded by ``depth * width`` per map partition — independent of
    item cardinality."""
    params = minhash_affine_params(depth)
    # 28-bit base hash: a_j * h must stay inside int64 under
    # ANSI arithmetic (the CLAUDE.md minhash invariant)
    h = md5_bigint(item_expr.cast("string"),
                   hex_chars=MINHASH_BASE_HEX)
    rows = df.select(h.alias("_h")).select(
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     _bucket(F.col("_h"), params[j], width).alias("bucket"))
            for j in range(depth)])).alias("_jb"))
    return (
        rows.groupBy(F.col("_jb.j").alias("j"),
                     F.col("_jb.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query the sketch: for each item, ``est = min_j
    counter[j][h_j(item)]`` (0 when a row is unhit). Always an UPPER
    bound on the true count. The sketch side is broadcast (it is
    ``depth * width`` rows by construction)."""
    params = minhash_affine_params(depth)
    h = md5_bigint(F.col(item_col).cast("string"),
                   hex_chars=MINHASH_BASE_HEX)
    probes = items.select(
        F.col(item_col),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     _bucket(h, params[j], width).alias("bucket"))
            for j in range(depth)])).alias("_jb"),
    ).select(item_col, F.col("_jb.j").alias("j"),
             F.col("_jb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
