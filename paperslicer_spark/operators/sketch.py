"""Mergeable sketches for corpus-scale frequency analytics.

Three classic fixed-size summaries as relational operator pairs:

- Count-min sketch (Cormode & Muthukrishnan 2005): ``cms_sketch``
  folds any item stream into a fixed ``depth x width`` counter
  RELATION; ``cms_estimate`` answers point frequency queries with the
  classic min-over-rows upper bound.
- HyperLogLog (Flajolet et al. 2007): ``hll_sketch`` folds a stream
  into an ``m = 2**p``-register relation; ``hll_estimate`` turns the
  registers into a cardinality estimate; ``hll_merge`` unions shard
  sketches into one (register-wise max) — the distinct-count twin of
  the CMS frequency story.
- Bloom filter (Bloom 1970): ``bloom_bits`` folds a set into a
  distinct set-bit relation; ``bloom_contains`` answers membership
  with no false negatives — the incremental-ingest "seen before?"
  gate whose state is m bits regardless of corpus size.

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


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_HASH_BITS = 4 * MINHASH_BASE_HEX  # 28-bit md5 prefix (shared base hash)


def hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant for ``m >= 128``. Shared
    by the operator and the oracle-SQL generator (spliced as the same
    repr literal) so the float arithmetic cannot drift."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(df: DataFrame, item_expr, p: int = 9) -> DataFrame:
    """Fold ``item_expr`` into an ``m = 2**p`` register relation
    ``(bucket, r)`` where ``r`` is the max leading-zero rank of the
    remaining ``28 - p`` hash bits. Fixed-size, map-side-combined
    (the groupBy ships at most ``m`` rows per partition), and
    union-mergeable via :func:`hll_merge` — the per-shard /
    per-day distinct-count state a 100 TB corpus needs where an
    exact ``countDistinct`` would shuffle the full vocab.

    Rank via bit-length: ``rho = (28 - p) - length(bin(w)) + 1`` for
    ``w > 0`` (``bin`` renders without leading zeros in both Spark and
    DuckDB), else ``(28 - p) + 1``.
    """
    m = 1 << p
    rbits = HLL_HASH_BITS - p
    h = md5_bigint(item_expr.cast("string"), hex_chars=MINHASH_BASE_HEX)
    hh = df.select(h.alias("_h"))
    w = F.expr(f"_h DIV {m}")
    rho = F.when(w == 0, F.lit(rbits + 1)) \
        .otherwise(F.lit(rbits + 1) - F.length(F.bin(w)))
    return (
        hh.select(F.pmod(F.col("_h"), F.lit(m)).cast("int").alias("bucket"),
                  rho.cast("int").alias("rho"))
        .groupBy("bucket").agg(F.max("rho").alias("r"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union shard sketches into one: register-wise max. Lossless —
    ``hll_merge(sketch(A), sketch(B))`` equals ``sketch(A ∪ B)``
    exactly (property-tested)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("r").alias("r"))


def hll_estimate(sketch: DataFrame, p: int = 9) -> DataFrame:
    """One-row estimate from a register relation: raw estimate
    ``alpha * m^2 / sum(2^-r)`` (absent buckets contribute ``2^0``),
    with the standard linear-counting correction ``m * ln(m / V)``
    when the raw estimate is under ``2.5 m`` and empty registers
    remain. The register sum is exact in IEEE double (terms span < 53
    bits), so the estimate is bit-deterministic across engines given
    the shared ``hll_alpha`` literal."""
    m = 1 << p
    alpha = hll_alpha(m)
    agg = sketch.agg(
        F.count("*").alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("_sp"))
    s_all = F.col("_sp") + (F.lit(m) - F.col("nonzero"))  # absent → 2^0
    raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) / s_all
    zeros = F.lit(m) - F.col("nonzero")
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
        .otherwise(raw)
    return agg.select(F.lit(m).alias("m"), "nonzero",
                      F.round(est, 4).alias("est"))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def bloom_bits(df: DataFrame, item_expr, m_bits: int = 8192,
               k: int = 4) -> DataFrame:
    """Fold a set into its distinct set-bit relation ``(bit)`` under
    ``k`` affine hashes over ``m_bits`` positions. At most ``m_bits``
    rows regardless of set size; shards merge by plain
    ``union().distinct()``. The "have we ingested this before?" gate
    for incremental corpus builds — no false negatives, bounded false
    positives."""
    params = minhash_affine_params(k)
    h = md5_bigint(item_expr.cast("string"), hex_chars=MINHASH_BASE_HEX)
    return (
        df.select(h.alias("_h"))
        .select(F.explode(F.array(*[
            _bucket(F.col("_h"), params[j], m_bits) for j in range(k)
        ])).alias("bit"))
        .distinct()
    )


def bloom_contains(bits: DataFrame, probes: DataFrame, item_col: str,
                   m_bits: int = 8192, k: int = 4) -> DataFrame:
    """Membership query: an item *might* be present iff all ``k`` of
    its bits are set. The bit relation is broadcast (≤ ``m_bits``
    rows by construction) so the probe side never shuffles."""
    params = minhash_affine_params(k)
    h = md5_bigint(F.col(item_col).cast("string"),
                   hex_chars=MINHASH_BASE_HEX)
    probed = probes.select(
        F.col(item_col),
        F.explode(F.array(*[
            _bucket(h, params[j], m_bits) for j in range(k)
        ])).alias("bit"))
    hit = F.when(F.col("_set").isNotNull(), 1).otherwise(0)
    return (
        probed.join(F.broadcast(bits.select(F.col("bit"),
                                            F.lit(1).alias("_set"))),
                    ["bit"], "left")
        .groupBy(item_col)
        .agg((F.sum(hit) == F.lit(k)).alias("might_contain"))
    )


# ---------------------------------------------------------------------------
# Log-binned histogram (mergeable quantile state)
# ---------------------------------------------------------------------------

def hist_sketch(df: DataFrame, key_col: str, value_expr) -> DataFrame:
    """Fold non-negative integer values into a per-key LOG-BINNED
    histogram relation ``(key, bin, c)`` — ``bin = bit_length(v)``
    (0 for ``v <= 0``), i.e. one bin per power-of-two octave, ≤ 64
    bins per key regardless of value range. The mergeable quantile
    state the exact ranked-window percentiles (metrics.
    exact_percentiles) cannot be: shard histograms SUM-merge, stream
    micro-batches fold in, and the whole relation is
    ``|keys| * 64`` rows. Trade: quantiles come back as bin lower
    bounds (one-octave resolution)."""
    v = value_expr.cast("bigint")
    b = F.when(v <= 0, F.lit(0)).otherwise(F.length(F.bin(v)))
    return (
        df.select(F.col(key_col).alias("key"),
                  b.cast("int").alias("bin"))
        .groupBy("key", "bin").agg(F.count("*").alias("c"))
    )


def hist_quantile(hist: DataFrame, qs: tuple = (0.5, 0.9, 0.99)
                  ) -> DataFrame:
    """Per-key quantile estimates from a histogram relation: for each
    ``q``, the LOWER BOUND (``2^(bin-1)``, 0 for bin 0) of the first
    bin whose cumulative count reaches ``ceil(q * n)``. Runs entirely
    on the tiny histogram relation — one window + one groupBy over
    ``|keys| * 64`` rows, never touching the corpus again."""
    from pyspark.sql import Window as W
    cum = F.sum("c").over(
        W.partitionBy("key").orderBy("bin")
        .rowsBetween(W.unboundedPreceding, 0))
    n = F.sum("c").over(W.partitionBy("key"))
    with_cum = hist.select("key", "bin", "c", cum.alias("_cum"),
                           n.alias("_n"))
    lo = [F.min(F.when(F.col("_cum") >=
                       F.ceil(F.lit(float(q)) * F.col("_n")),
                       F.col("bin"))).alias(f"_b{i}")
          for i, q in enumerate(qs)]
    agged = with_cum.groupBy("key").agg(
        F.max("_n").alias("n"), *lo)

    def bound(bcol):
        # 2^(bin-1) via double pow (exact through 2^53; bins for
        # int64 values stop at 63 ≫ any real count here)
        return F.when(bcol <= 0, F.lit(0).cast("bigint")) \
            .otherwise(F.pow(F.lit(2.0), bcol - 1).cast("bigint"))
    outs = [bound(F.col(f"_b{i}")).alias(f"p{int(round(q * 100))}_lo")
            for i, q in enumerate(qs)]
    return agged.select("key", "n", *outs)
