"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), first-wins streaming-dedup semantics (reference
K2, ``project.py:143-166``), MinHash+LSH, n-gram Jaccard, SimHash.
Everything except SimHash is pure DataFrame ops (JVM-side); hashing is
md5-based so the DuckDB oracle can reproduce values bit-for-bit.

Scale notes (100 TB):
- first-wins dedup is a single shuffle on the dedup key + window —
  no driver-side ``seen`` sets (the reference's approach);
- MinHash: shingle explode → per-(doc, seed) min — map-side partial
  aggregation keeps the shuffle at |docs|×|seeds| rows, independent of
  shingle count; LSH banding turns all-pairs into per-bucket joins;
- n-gram Jaccard joins on shingle — a frequent-shingle cap (stop-
  shingle removal) bounds skew; AQE skew-join covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from paperslicer_spark.functions.text_stats import (md5_bigint, shingles,
                                                    tokens,
                                                    widen_undersplit)


def first_wins_dedup(df: DataFrame, primary_key, fallback_key,
                     order_cols) -> DataFrame:
    """Reference K2 semantics: dedup by ``primary_key`` when present
    else ``fallback_key``, keeping the first row in ``order_cols``
    arrival order. Two separate key spaces, like the reference's two
    ``seen`` sets.

    Rows where BOTH keys are blank are keyless and are ALWAYS kept: the
    reference's loop (``project.py:150-160``) writes every record whose
    ``key = doi or title`` is empty — error rows with no metadata must
    never collapse to one. Keyless rows skip the window (no shuffle on
    a degenerate hot key — at scale the all-blank key would also be the
    single most skewed reducer) and are unioned back unchanged.
    """
    p, fb = F.col(primary_key), F.col(fallback_key)
    p_blank = p.isNull() | (F.trim(p) == "")
    f_blank = fb.isNull() | (F.trim(fb) == "")
    key = F.when(~p_blank, F.concat(F.lit("p:"), F.lower(F.trim(p)))) \
        .otherwise(F.concat(F.lit("f:"), F.lower(F.trim(fb))))
    keyed = df.where(~(p_blank & f_blank))
    keyless = df.where(p_blank & f_blank)
    w = Window.partitionBy(key).orderBy(*order_cols)
    deduped = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return deduped.unionByName(keyless)


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact duplicate groups: fingerprint → count + ids."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("first_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative of each exact text group."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int | None = None) -> DataFrame:
    """All pairs with token-``n``-gram Jaccard ≥ threshold.

    ``max_doc_freq`` is the frequent-shingle skew cap: a shingle
    present in more than this many documents (a stop shingle — "of the
    results" etc.) contributes ``df²/2`` intersection rows, the
    quadratic blowup that kills this plan on real text. Shingles above
    the cap are removed from BOTH the intersection and the set sizes
    (standard stop-shingle Jaccard) by one window over the shingle
    key. With the cap in place the intersection stage needs NO
    self-join at all: each surviving shingle's doc list is collected
    into a sorted array (bounded by ``max_doc_freq``) and the C(m,2)
    ordered pairs are emitted with a nested HOF — the collect reuses
    the window's exchange, so the whole stage adds one pair-count
    shuffle instead of a second pass over the shingle relation for a
    join build side (~15% warm / 2.4x cold at sf0.1, same rows).
    Without a cap the group arrays would be unbounded, so that path
    keeps the classic shingle equi-self-join (never a cross join).

    Shingles travel as their 60-bit md5, not the string: shuffles move
    fixed-width int64s instead of ~20-char UTF8 (the oracle SQL
    mirrors the same hash, so the definition — Jaccard over hashed
    shingles — is identical in both engines; at 60 bits a collision is
    ~1e-15 per doc).
    """
    # shingle construction + md5 is the CPU-heavy term (measured 4.3s
    # of the 6.0s query at sf1.0) and inherits the SCAN's parallelism:
    # a single-file/single-row-group corpus runs it on one core —
    # widen to session parallelism (no-op on well-split inputs)
    df = widen_undersplit(df)
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).select("doc", md5_bigint(F.col("shingle")).alias("shingle"))
    if max_doc_freq is not None:
        # doc-frequency cap as a window over shingle: ONE shuffle that
        # both filters the hot shingles AND leaves the relation hash-
        # partitioned by the shingle key for everything downstream
        w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_df", F.count("*").over(w))
            .where(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
        # set sizes must exclude capped shingles → count the filtered rows
        sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
        # Intersections WITHOUT a self-join: group each shingle's docs
        # into a sorted array (bounded by max_doc_freq, so the row and
        # the combination fan-out are both bounded) and emit the
        # C(m,2) ordered pairs with a nested HOF — the groupBy reuses
        # the window's exchange, so the whole intersection stage adds
        # ONE shuffle (the pair count) instead of a second scan of the
        # shingle relation for the join's build side. Measured ~15%
        # faster warm and ~2.4x cold vs the exploded self-join at
        # sf0.1; identical output.
        grouped = (
            sh.groupBy("shingle")
            .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
            .where(F.size("docs") >= 2)
        )
        m = F.size("docs")
        combos = F.flatten(F.transform(
            F.sequence(F.lit(1), m - 1),
            lambda i: F.transform(
                F.slice(F.col("docs"), i + 1, m - i),
                lambda d: F.struct(
                    F.element_at(F.col("docs"), i).alias("a"),
                    d.alias("b")))))
        inter = (
            grouped.select(F.explode(combos).alias("p"))
            .groupBy(F.col("p.a").alias("doc_a"),
                     F.col("p.b").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
        return _jaccard_from_parts(inter, sizes, threshold)
    else:
        # no cap: sizes are just the per-doc distinct-shingle array size —
        # computed from the base scan (JVM size(), no explode, no extra
        # shuffle over |shingle| rows)
        sizes = df.select(
            F.col(id_col).alias("doc"),
            F.size(shingles(F.col(text_col), n)).cast("bigint").alias("sz"),
        ).where(F.col("sz") > 0)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_parts(inter, sizes, threshold)


def _jaccard_from_parts(inter: DataFrame, sizes: DataFrame,
                        threshold: float) -> DataFrame:
    """(doc_a, doc_b, inter) × per-doc set sizes → thresholded Jaccard
    rows. The sizes relation is |docs|-sized → broadcast-friendly."""
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, threshold: float = 0.7,
                      max_doc_freq: int = 50) -> DataFrame:
    """Asymmetric near-dup detection by n-gram CONTAINMENT — the
    overlap coefficient ``inter / min(|A|, |B|)``.  Jaccard misses the
    quote/subset case (a short doc wholly embedded in a long one has
    tiny Jaccard but containment 1.0); this is the operator that
    catches wrapped reposts, quoted articles and boilerplate-framed
    copies.

    Same machinery as q11's capped Jaccard (the shared plan shape is
    the point — one shingle window exchange, C(m,2) pairs from
    bounded per-shingle doc arrays, NO self-join): ``max_doc_freq``
    is mandatory because the group arrays are otherwise unbounded
    (the q11 invariant); capped shingles leave both the intersections
    and the set sizes.

    Output: ``(doc_a, doc_b, inter, sz_a, sz_b, cont)`` with
    ``cont`` rounded to 6dp before thresholding (oracle boundary
    agreement).
    """
    # same widen rationale as ngram_jaccard_pairs
    df = widen_undersplit(df)
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).select("doc", md5_bigint(F.col("shingle")).alias("shingle"))
    w = Window.partitionBy("shingle")
    sh = (sh.withColumn("_df", F.count("*").over(w))
          .where(F.col("_df") <= max_doc_freq).drop("_df"))
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    grouped = (sh.groupBy("shingle")
               .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
               .where(F.size("docs") >= 2))
    m = F.size("docs")
    combos = F.flatten(F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda i: F.transform(
            F.slice(F.col("docs"), i + 1, m - i),
            lambda d: F.struct(
                F.element_at(F.col("docs"), i).alias("a"),
                d.alias("b")))))
    inter = (grouped.select(F.explode(combos).alias("p"))
             .groupBy(F.col("p.a").alias("doc_a"),
                      F.col("p.b").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("cont", F.round(
            F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")), 6))
        .where(F.col("cont") >= threshold)
        .select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "cont"))


# MinHash universal-hash family: ONE md5 per shingle (28-bit hex
# prefix) + per-seed affine transforms (a_j * h + b_j) mod p. The
# previous scheme hashed every shingle num_hashes times — at corpus
# scale md5 IS the minhash cost (measured: 12 md5/shingle dominated
# lsh_pairs wall time), and a*h+b is ~free. p = 2^31-1 (Mersenne);
# a*h + b < 2^59 so the arithmetic is exact int64 in BOTH engines
# (DuckDB bigint overflow would ERROR, not wrap — the 28-bit base
# hash exists precisely to keep the product inside int64).
MINHASH_PRIME = (1 << 31) - 1
MINHASH_BASE_HEX = 7  # 28-bit base hash


def minhash_affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs shared by the Spark operator and
    the SQL oracle generator (``__spark_entry__._mh_expr``)."""
    import random

    rng = random.Random(0x5EED)
    return [(rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
            for _ in range(num_hashes)]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, num_hashes: int = 12) -> DataFrame:
    """Per-doc MinHash signature: base hash = md5 28-bit prefix of the
    shingle (computed ONCE), seed j's value = min over shingles of
    ``(a_j * h + b_j) % (2^31-1)``."""
    # shingle+md5 is CPU-heavy and runs at scan parallelism — widen
    # under-split batch inputs (no-op when well-split or streaming)
    df = widen_undersplit(df)
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).select(
        "doc",
        md5_bigint(F.col("shingle"), hex_chars=MINHASH_BASE_HEX).alias("h"),
    )
    params = minhash_affine_params(num_hashes)
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME))
        .alias(f"mh{j}")
        for j, (a, b) in enumerate(params)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, num_hashes: int = 12,
                      bands: int = 4) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding over MinHash.

    rows-per-band = num_hashes / bands; docs sharing any full band
    signature become candidates (then verified with true Jaccard by
    the caller if needed). The band join is an equi-join on the band
    key — no all-pairs blowup.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n=n, num_hashes=num_hashes)
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        band_rows.append(
            sig.select(
                "doc",
                F.lit(b).alias("band"),
                F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bkey"),
            )
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionByName(br)
    a = banded.alias("a")
    b2 = banded.alias("b")
    return (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs from 64-bit SimHash signatures via
    Hamming-LSH banding: the signature splits into four 16-bit chunks;
    by pigeonhole, any pair within Hamming distance 3 shares at least
    one UNCHANGED chunk, so candidates = docs colliding on (band,
    chunk) — an equi-join, never all-pairs — verified exactly with
    ``bit_count(xor)``. Guaranteed recall for ``max_hamming <= 3``;
    above that, only pairs that happen to share a clean chunk surface
    (document the recall loss or add bands).

    DuckDB twin (x32): identical chunk arithmetic over the unsigned
    HUGEINT image of the signature; bit_count/xor agree with the JVM
    on two's-complement longs (probed: bit_count(-1)=64 both sides).

    Signature 0 (the empty/NULL-text sentinel) is EXCLUDED from
    banding: at corpus scale every blank doc shares it, forming one
    bucket of n_blank² pairs in all four bands — a quadratic hot key
    that says nothing (blank-vs-blank "near-dups" belong to exact
    dedup). The oracle applies the same filter.
    """
    sig = simhash(df, id_col, text_col).where(F.col("simhash") != 0)
    return hamming_pairs(sig, max_hamming=max_hamming)


def hamming_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """``(doc, simhash)`` signatures → near-dup pairs via the 16-bit
    band pigeonhole + exact ``bit_count(xor)`` verification — the
    banding half of :func:`simhash_lsh_pairs`, reusable for ANY
    64-bit locality-preserving signature (text SimHash, image dHash).
    Same recall contract: guaranteed for ``max_hamming <= 3``.
    """
    banded = _simhash_bands(sig)
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("bigint").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def _simhash_bands(sig: DataFrame) -> DataFrame:
    """(doc, simhash) → one row per 16-bit chunk with a NON-NEGATIVE
    band key. ``pmod``, not ``%``: band 0's chunk of a negative
    signature keeps the sign under Java's signed remainder (r-65536
    vs r), so a mixed-sign pair sharing only the low chunk would get
    unequal Spark keys while the oracle's unsigned arithmetic pairs
    them — pinned by test_simhash_bands_mixed_sign_low_chunk. Bands
    1-3 are sign-safe anyway (>>> clears the sign bit) but use pmod
    uniformly."""
    band_rows = [
        sig.select(
            "doc", "simhash", F.lit(b).alias("band"),
            F.pmod(F.shiftrightunsigned("simhash", 16 * b),
                   F.lit(65536)).alias("bkey"),
        )
        for b in range(4)
    ]
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.unionByName(br)
    return banded


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 50) -> DataFrame:
    """Connected components over an undirected near-dup pair list via
    min-label propagation: every node starts labelled with itself; each
    round a node adopts the minimum label among itself and its
    neighbors; fixpoint = components labelled by their minimum member.

    This is the clustering step of a near-dedup pipeline (LSH pairs →
    components → keep one representative per component). Returns
    ``(node, label)`` for every node that appears in ``pairs``.

    Scale notes (100 TB):
    - each round is ONE hash join (edges ⋈ labels, both partitioned by
      the join key) + ONE min-aggregate — no driver-side graph;
    - lineage is truncated per round with ``localCheckpoint`` so the
      Catalyst plan stays O(1) across iterations;
    - rounds = O(log n): each round combines neighbor propagation
      with pointer jumping (adopt label[label] — the hash-to-min
      family, cf. Kiveris et al., "Connected Components in
      MapReduce"), so shallow near-dup components converge in 1-2
      rounds and even a pathological chain converges in log₂(length);
    - convergence is detected WITHOUT a per-round join (round-4
      VERDICT item #4): each node's old label rides through the same
      ``groupBy(node)`` that computes the new one (``max`` over a
      column that is non-NULL only on the labels branch), so the
      checkpointed relation carries a per-node ``_changed`` flag and
      the convergence probe is a filter + ``isEmpty`` over already-
      materialized partitions — no ``new ⋈ old`` self-join, and no
      label sums (a sum over 10^12 60-bit ids overflows bigint).
    """
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(pairs.select(F.col(dst).alias("s"),
                                  F.col(src).alias("d")))
        .distinct()
        # repartition by the join key BEFORE the checkpoint: distinct
        # leaves edges hash-partitioned by (s, d), so every round's
        # edges ⋈ labels re-shuffled the FULL edge relation (the
        # dominant per-round cost — measured 70 → 39 s at 3.9M pairs
        # on 32 cores). Partitioned by s and checkpointed, the edge
        # side satisfies the join requirement every round and only the
        # |nodes|-sized label relation moves.
        .repartition("s")
        .localCheckpoint(eager=True)
    )
    # seed with the first-hop minimum (min over self + direct
    # neighbors) — the same aggregate a propagation round would do,
    # fused into initialization so one full round is saved
    labels = (
        edges.groupBy(F.col("s").alias("node"))
        .agg(F.least(F.min("d"), F.first("s")).alias("label"))
        .localCheckpoint(eager=True)
    )
    label_type = dict(labels.dtypes)["label"]
    for it in range(max_iter):
        prop = edges.join(labels, edges["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("label"),
            F.lit(None).cast(label_type).alias("_old"))
        # pointer jumping: also adopt label[label] (a label is always
        # itself a node, so the self-join resolves) — collapses the
        # round count from O(diameter) to O(log n), which is what
        # keeps a pathological chain from exhausting max_iter
        jump = (
            labels.alias("l1")
            .join(labels.alias("l2"),
                  F.col("l1.label") == F.col("l2.node"))
            .select(F.col("l1.node").alias("node"),
                    F.col("l2.label").alias("label"),
                    F.lit(None).cast(label_type).alias("_old"))
        )
        # each node appears EXACTLY once in `labels`, so max(_old)
        # (nulls ignored) recovers its previous label inside the same
        # aggregate that computes the new minimum — the convergence
        # flag costs zero extra shuffles or joins
        new_labels = (
            labels.withColumn("_old", F.col("label"))
            .unionByName(prop).unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"),
                 F.max("_old").alias("_old"))
            .withColumn("_changed", F.col("label") != F.col("_old"))
            .localCheckpoint(eager=True)
        )
        converged = new_labels.where(F.col("_changed")).isEmpty()
        labels = new_labels.select("node", "label")
        if converged:
            return labels
    # silent wrong labels would poison every downstream dedup decision
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter ≫ 2^{max_iter} should be impossible — "
        "check for label-churn bugs or raise max_iter)")


def dup_clusters(df: DataFrame, id_col: str, text_col: str,
                 n: int = 3, num_hashes: int = 12,
                 bands: int = 4) -> DataFrame:
    """Near-duplicate clusters: MinHash-LSH candidate pairs →
    connected components → ``(doc, cluster, is_rep)`` where ``cluster``
    is the minimum doc id in the component and ``is_rep`` marks the
    one row per cluster a dedup pass would keep."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, n=n,
                              num_hashes=num_hashes, bands=bands)
    cc = connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc"),
        F.col("label").alias("cluster"),
        (F.col("node") == F.col("label")).alias("is_rep"),
    )


SIMHASH_BITS = 64


def simhash(df: DataFrame, id_col: str, text_col: str,
            impl: str = "pandas") -> DataFrame:
    """64-bit SimHash over whitespace tokens. Near-dup = small Hamming
    distance between signatures.

    Two byte-identical implementations (equality-tested):
    - ``impl="pandas"`` (default): vectorized numpy majority vote, one
      Arrow boundary, no shuffle — right when texts are already local;
    - ``impl="jvm"``: explode → md5 → 64 conditional sums (the
      oracle's own formulation in DataFrame form) — fully codegen,
      no Python workers, partial aggregation shuffles only |docs|
      rows of 64 ints; the scale path when Python worker capacity is
      the bottleneck.
    """
    # widen an under-split batch input before the tokenizing map
    # (no-op when well-split or streaming)
    df = widen_undersplit(df)
    if impl == "jvm":
        return simhash_jvm(df, id_col, text_col)
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _simhash_impl(texts: pd.Series) -> pd.Series:
        import hashlib
        import numpy as np

        out = []
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                out.append(0)
                continue
            acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
            for tok in toks:
                digest = hashlib.md5(tok.encode("utf-8")).digest()[:8]
                bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
                acc += bits.astype(np.int64) * 2 - 1
            sig_bits = (acc > 0).astype(np.uint8)
            sig = int.from_bytes(np.packbits(sig_bits).tobytes(), "big")
            out.append(sig - (1 << 63))  # store as signed long
        return pd.Series(out)

    _simhash_impl.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _simhash = pandas_udf(_simhash_impl, "long")
    return df.select(F.col(id_col).alias("doc"),
                     _simhash(F.col(text_col)).alias("simhash"))


def simhash_jvm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """JVM SimHash: byte-identical to the pandas implementation (and
    to the x08 oracle SQL, which is this same formulation).

    The 64-bit token hash (first 8 md5 bytes) exceeds signed-bigint
    range, so it is carried as two 32-bit halves (``conv`` returns a
    decimal STRING — casting a ≥2^63 value to bigint would null out).
    Per bit p: majority vote = ``2·Σbit_p > n``. The stored signature
    uses the same bias representation as the pandas path
    (``unsigned - 2^63``), assembled sign-safely: bias + bit63·2^63 =
    ``bit63 ? 0 : -2^63``.
    """
    tok = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("doc"),
                F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    )
    h = F.md5(F.col("tok"))
    halves = tok.select(
        "doc",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("hi"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("lo"),
    )

    def bit(p: int):
        src = F.col("hi") if p >= 32 else F.col("lo")
        return F.shiftright(src, p - 32 if p >= 32 else p) % 2

    aggs = [F.count("*").alias("n")] + [
        F.sum(bit(p)).alias(f"b{p}") for p in range(SIMHASH_BITS)
    ]
    cnt = halves.groupBy("doc").agg(*aggs)
    sig = F.when(2 * F.col("b63") > F.col("n"), F.lit(0).cast("bigint")) \
        .otherwise(F.lit(-(1 << 63)).cast("bigint"))
    for p in range(SIMHASH_BITS - 1):
        sig = sig + F.when(2 * F.col(f"b{p}") > F.col("n"),
                           F.lit(1 << p).cast("bigint")) \
            .otherwise(F.lit(0).cast("bigint"))
    out = cnt.select("doc", sig.alias("simhash"))
    blanks = (
        df.where(F.col(text_col).isNull()
                 | (F.trim(F.col(text_col)) == ""))
        .select(F.col(id_col).alias("doc"),
                F.lit(0).cast("bigint").alias("simhash"))
    )
    return out.unionByName(blanks)


def decontaminate(train: DataFrame, bench: DataFrame, id_col: str,
                  text_col: str, n: int = 5, min_shared: int = 1,
                  max_doc_freq: int | None = None) -> DataFrame:
    """Benchmark decontamination: (train_doc, bench_doc, n_shared)
    pairs where a training document shares ``>= min_shared`` distinct
    token ``n``-grams with a held-out/benchmark document — the
    train-test overlap scan every serious pretraining pipeline runs
    (GPT-3 appendix C-style n-gram collision check; n=13 there, any n
    here).

    Plan shape: both sides explode to distinct (doc, shingle-hash)
    pairs and equi-join on the 60-bit shingle hash. The benchmark
    relation is benchmark-sized — millions of grams vs the corpus's
    trillions — so at scale AQE broadcast-joins it and the train side
    never shuffles: the scan streams past a hashed-set probe, which is
    exactly how you want a 100 TB decontamination pass to look. The
    per-(train,bench) counts then aggregate only the matched rows
    (vanishingly few vs the corpus).

    ``max_doc_freq`` (train-side doc-frequency cap) guards the skew
    case where a boilerplate gram appears in millions of training docs
    AND a benchmark doc: such grams carry no contamination signal
    (they're corpus background) and each one fans out |train_df|
    match rows. Pairs are only as strong as their rarest shared grams;
    the cap drops grams above the threshold like q11's stop-shingle
    rule, using the same single-window form.
    """
    def grams(df):
        return df.select(
            F.col(id_col).alias("doc"),
            F.explode(shingles(F.col(text_col), n)).alias("shingle"),
        ).select("doc", md5_bigint(F.col("shingle")).alias("g"))

    tr, be = grams(train), grams(bench)
    if max_doc_freq is not None:
        w = Window.partitionBy("g")
        tr = (tr.withColumn("_df", F.count("*").over(w))
              .where(F.col("_df") <= max_doc_freq).drop("_df"))
    return (
        tr.alias("t")
        .join(be.alias("b"), F.col("t.g") == F.col("b.g"))
        .groupBy(F.col("t.doc").alias("train_doc"),
                 F.col("b.doc").alias("bench_doc"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def delta_dedup(new_docs: DataFrame, corpus: DataFrame, id_col: str,
                text_col: str, n: int = 3, num_hashes: int = 12,
                bands: int = 4) -> DataFrame:
    """Continual-pretraining ingest dedup: classify each NEW document
    against the EXISTING corpus — ``exact_dup`` (byte-identical text
    already in the corpus), ``near_dup`` (shares a MinHash-LSH band
    bucket with a corpus doc), or kept. Output: one row per new doc,
    ``(id, keep, exact_dup, near_dup)``.

    The incremental twin of the whole-corpus pipeline (q06/x09): the
    corpus side's md5 keys and band buckets are exactly what a
    snapshot table would persist, so at scale this runs as two
    hash joins against precomputed state — the new batch (small) is
    the build side of both, and NOTHING is recomputed over the corpus
    text when the signature snapshot exists.

    Guaranteed-recall property inherited from the banded scheme: an
    exact re-crawl always collides (identical signature ⇒ identical
    bands), near-identical docs collide with the standard LSH
    probability curve.
    """
    new_keyed = new_docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h"))
    corpus_hashes = corpus.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h")
    ).distinct()
    exact = new_keyed.join(corpus_hashes, "_h", "left_semi") \
        .select(F.col("_id"), F.lit(True).alias("exact_dup"))

    def _bands(df):
        sig = minhash_signatures(df, id_col, text_col, n=n,
                                 num_hashes=num_hashes)
        rows = num_hashes // bands
        keys = [
            F.concat_ws(":", F.lit(str(b)), F.concat_ws("_", *[
                F.col(f"mh{b * rows + r}").cast("string")
                for r in range(rows)]))
            for b in range(bands)
        ]
        return sig.select("doc", F.explode(F.array(*keys)).alias("bkey"))

    near = _bands(new_docs).join(
        _bands(corpus).select("bkey").distinct(), "bkey", "left_semi") \
        .select(F.col("doc").alias("_id")).distinct() \
        .withColumn("near_dup", F.lit(True))

    return (
        new_keyed.select("_id")
        .join(exact, "_id", "left")
        .join(near, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("exact_dup"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("near_dup"), F.lit(False)).alias("near_dup"),
        )
        .withColumn("keep", ~F.col("exact_dup") & ~F.col("near_dup"))
    )


def substring_dedup(df: DataFrame, id_col: str, text_col: str,
                    min_length: int = 30) -> DataFrame:
    """Exact substring-level dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): any length-``L``
    character window whose content appears elsewhere in the corpus is
    removed, keeping only its FIRST occurrence (global ``(doc, pos)``
    order). Catches boilerplate/quote/template overlap that document-
    and paragraph-level dedup (q06/x40) both miss.

    Relational recipe (the distributed stand-in for the paper's
    single-node suffix array):
    1. every char position emits its L-gram md5 — the gram array is
       built per-row with one ``transform`` over a position sequence
       (text is a plain column attribute, so the HOF lambda is safe
       under the no-CSE rule) and dropped immediately after hashing;
    2. first occurrence per hash via ``groupBy(h).agg(min(struct(doc,
       pos)), count)`` — MAP-SIDE COMBINED, so a boilerplate gram
       repeated 10^6 times ships one partial row per partition
       instead of 10^6 rows into one hash partition (this is why it
       is not a rank-window over ``h``); occurrences rejoin on ``h``
       (AQE skew-join covers residual hot grams);
    3. duplicate spans ``[pos, pos+L)`` merge into islands per doc
       (running-max-end gaps-and-islands window over the SPAN
       relation, which is corpus-duplication-sized, not corpus-sized);
    4. docs rebuild by cutting merged spans (JVM ``substr`` pieces +
       one ordered concat) — span-free docs pass through untouched.

    Scale note: step 1 is a deliberate len(text)× row fan-out of
    (doc, pos, 16-byte hash) triples — the price of exactness; at
    100 TB run it per-shard with a stride >1 on the probe side (the
    standard recall/cost dial) or feed MinHash candidates first.

    Returns (doc, text_clean, n_spans, chars_removed).
    """
    L = min_length
    W = Window
    doc = F.col(id_col)
    text = F.col(text_col)
    # the per-char gram fan-out is the heaviest map in the repo — an
    # under-split probe corpus must not serialize it (widen_undersplit
    # no-ops on well-split production inputs)
    base = widen_undersplit(df) \
        .select(doc.alias("doc"), text.alias("_text")) \
        .where(F.trim("_text") != "")

    grams_arr = F.transform(
        F.sequence(F.lit(0), F.length("_text") - L),
        lambda i: F.md5(F.col("_text").substr(i + 1, F.lit(L))))
    grams = (
        base.where(F.length("_text") >= L)
        .select("doc", F.posexplode(grams_arr).alias("pos", "h"))
        .select("doc", F.col("pos").cast("bigint").alias("pos"), "h")
    )
    firsts = grams.groupBy("h").agg(
        F.min(F.struct("doc", "pos")).alias("_first"),
        F.count("*").alias("_cnt"))
    dup = (
        grams.join(firsts.where(F.col("_cnt") > 1), "h")
        .where((F.col("doc") != F.col("_first.doc")) |
               (F.col("pos") != F.col("_first.pos")))
        .select("doc", F.col("pos").alias("s"),
                (F.col("pos") + L).alias("e"))
    )
    prev_max_e = F.max("e").over(
        W.partitionBy("doc").orderBy("s")
        .rowsBetween(W.unboundedPreceding, -1))
    flagged = dup.withColumn(
        "_new", (F.col("s") > F.coalesce(prev_max_e, F.lit(-1)))
        .cast("int"))
    island = F.sum("_new").over(
        W.partitionBy("doc").orderBy("s")
        .rowsBetween(W.unboundedPreceding, 0))
    merged = (
        flagged.withColumn("_isl", island)
        .groupBy("doc", "_isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    lag_e = F.lag("e").over(W.partitionBy("doc").orderBy("s"))
    j = (
        base.join(merged.select("doc", "s", "e"), "doc", "left")
        .withColumn("_pe", F.coalesce(lag_e, F.lit(0)))
        .withColumn("_piece",
                    F.col("_text").substr((F.col("_pe") + 1).cast("int"),
                                          (F.col("s") - F.col("_pe"))
                                          .cast("int")))
    )
    agged = j.groupBy("doc").agg(
        F.first("_text").alias("_text"),
        F.count("s").alias("n_spans"),
        F.coalesce(F.sum(F.col("e") - F.col("s")), F.lit(0))
        .cast("bigint").alias("chars_removed"),
        F.coalesce(F.max("e"), F.lit(0)).alias("_last_e"),
        F.array_join(F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("s").isNotNull(),
                       F.struct("s", "_piece")))),
            lambda st: st["_piece"]), "").alias("_kept"))
    tail = F.col("_text").substr(
        (F.col("_last_e") + 1).cast("int"),
        F.length("_text").cast("int"))
    return agged.select(
        "doc",
        F.concat(F.col("_kept"), tail).alias("text_clean"),
        F.col("n_spans").cast("bigint").alias("n_spans"),
        "chars_removed")


def canonical_keep(df: DataFrame, id_col: str, text_col: str,
                   quality_expr=None, n: int = 3, num_hashes: int = 12,
                   bands: int = 4) -> DataFrame:
    """The end-to-end near-dup KEEP LIST a curation pipeline actually
    ships: cluster near-duplicates (MinHash-LSH pairs → connected
    components, the x26 machinery) and keep the BEST document of each
    cluster by a quality score (default: word count) instead of x26's
    arbitrary min-id representative — "of these 40 mirror copies,
    keep the longest one".

    Every corpus doc appears in the output: singletons (no near-dup
    edge) form their own cluster and keep themselves. Ties on quality
    break by minimum id, so the choice is deterministic and
    SQL-replayable.

    Scale: the pairs/CC relations are DUPLICATION-sized, not
    corpus-sized; the corpus itself is touched by one left join on id
    (to attach cluster labels) and one per-cluster window whose
    partitions are cluster-sized — bounded by the duplication degree
    the LSH bands admit, never the corpus.

    Returns ``(doc, cluster, quality, keep)``.
    """
    # widen an under-split batch input before the tokenizing map
    # (no-op when well-split or streaming)
    df = widen_undersplit(df)
    from paperslicer_spark.functions.text_stats import word_count

    if quality_expr is None:
        quality_expr = word_count(F.col(text_col))
    clusters = dup_clusters(df, id_col, text_col, n=n,
                            num_hashes=num_hashes, bands=bands)
    base = df.select(F.col(id_col).alias("doc"),
                     quality_expr.cast("bigint").alias("quality"))
    labeled = (
        base.join(clusters.select("doc", "cluster"), "doc", "left")
        .withColumn("cluster", F.coalesce("cluster", F.col("doc")))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("quality").desc(), F.col("doc"))
    return labeled.withColumn(
        "keep", F.row_number().over(w) == 1).select(
        "doc", "cluster", "quality", "keep")


def ngram_novelty(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """Per-document n-gram novelty vs the rest of the corpus: for each
    doc, the fraction of its DISTINCT token ``n``-grams whose global
    first occurrence (minimum doc id over the whole corpus) lies in an
    EARLIER document — an overlap/memorization profile ("how much of
    this doc is already covered by what came before it"). The
    per-document cousin of decontamination: x39 flags cross-split
    collisions, this scores intra-corpus redundancy doc by doc, which
    is the rank key dedup-priority and data-mixing passes want.

    Plan shape: distinct (doc, gram-hash) pairs fan out from the base
    scan; first occurrences come from a ``groupBy(g).agg(min(doc))`` —
    MAP-SIDE COMBINED, so a boilerplate gram in 10^6 docs ships one
    partial row per partition (the substring_dedup step-2 rule, never
    a rank window over the hot hash); occurrences rejoin on ``g``
    (AQE skew-join covers residual hot grams) and the per-doc rollup
    shuffles only (doc, flag) pairs. Docs with < ``n`` tokens have no
    grams and are absent, like x71.

    Returns ``(doc, n_grams, seen_frac)`` with ``seen_frac`` rounded
    to 6dp for oracle parity.
    """
    # widen an under-split batch input before the tokenizing map
    # (no-op when well-split or streaming)
    df = widen_undersplit(df)
    g = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("s"),
    ).select("doc", md5_bigint(F.col("s")).alias("g"))
    firsts = g.groupBy("g").agg(F.min("doc").alias("_first"))
    return (
        g.join(firsts, "g")
        .groupBy("doc")
        .agg(F.count("*").cast("bigint").alias("n_grams"),
             F.round(F.avg((F.col("_first") < F.col("doc"))
                           .cast("double")), 6).alias("seen_frac"))
    )


def leakage_safe_split(df: DataFrame, id_col: str, text_col: str,
                       eval_pct: int = 20, seed: str = "split",
                       n: int = 3, num_hashes: int = 12,
                       bands: int = 4) -> DataFrame:
    """Near-dup-aware train/eval split: every document lands in
    'train' or 'eval' by its near-dup CLUSTER (MinHash-LSH pairs →
    connected components, the x26 machinery), so two near-duplicates
    can never straddle the split — the leakage a plain per-doc hash
    split silently allows, inflating eval scores with memorized
    training text. Singletons form their own cluster (left join +
    coalesce, the x68 rule).

    The side is a seeded-md5 bucket of the CLUSTER label — fully
    deterministic: the same corpus splits identically on every run
    and every cluster size, and adding unrelated docs never flips an
    existing cluster's side (the label is the cluster's min member
    id, stable under appends that don't join the cluster).

    Scale: identical to canonical_keep — pairs/CC are
    DUPLICATION-sized; the corpus is touched by one id join and a
    stateless map. Returns ``(doc, cluster, split)``.
    """
    # widen an under-split batch input before the tokenizing map
    # (no-op when well-split or streaming)
    df = widen_undersplit(df)
    clusters = dup_clusters(df, id_col, text_col, n=n,
                            num_hashes=num_hashes, bands=bands)
    labeled = (
        df.select(F.col(id_col).alias("doc"))
        .join(clusters.select("doc", "cluster"), "doc", "left")
        .withColumn("cluster", F.coalesce("cluster", F.col("doc")))
    )
    bucket = F.pmod(
        md5_bigint(F.col("cluster").cast("string"), salt=seed),
        F.lit(100))
    return labeled.withColumn(
        "split", F.when(bucket < eval_pct, F.lit("eval"))
        .otherwise(F.lit("train")))


def source_overlap(df: DataFrame, id_col: str, text_col: str,
                   source_col: str, n: int = 3, num_hashes: int = 12,
                   bands: int = 4) -> DataFrame:
    """Cross-source near-dup provenance matrix: for every unordered
    pair of sources, how many near-duplicate DOC pairs straddle them
    (same LSH+CC cluster, the x26 machinery) and how many clusters are
    involved — "how much of source B is copied from source A", the
    question a de-biasing or licensing audit asks before mixing
    sources. Same-source pairs are reported too (intra-source
    redundancy baseline).

    Scale: cluster membership is DUPLICATION-sized; the doc-pair
    fan-out is a self-equi-join on the cluster label, bounded per
    cluster by the duplication degree the LSH bands admit (the x68
    argument) — never corpus×corpus. Output ``(source_a, source_b,
    n_pairs, n_clusters)`` with source_a <= source_b.
    """
    # widen an under-split batch input before the tokenizing map
    # (no-op when well-split or streaming)
    df = widen_undersplit(df)
    clusters = dup_clusters(df, id_col, text_col, n=n,
                            num_hashes=num_hashes, bands=bands)
    labeled = (
        df.select(F.col(id_col).alias("doc"),
                  F.col(source_col).alias("source"))
        .join(clusters.select("doc", "cluster"), "doc")
    )
    a, b = labeled.alias("a"), labeled.alias("b")
    return (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.least("a.source", "b.source").alias("source_a"),
            F.greatest("a.source", "b.source").alias("source_b"))
        .agg(F.count("*").cast("bigint").alias("n_pairs"),
             F.countDistinct("a.cluster").cast("bigint")
             .alias("n_clusters"))
    )


def fuzzy_pairs(df: DataFrame, id_col: str, key_col: str,
                block_len: int = 12, max_dist: int = 8,
                max_block_size: int | None = None) -> DataFrame:
    """Blocked fuzzy record linkage (entity resolution within one
    relation): every pair of rows whose key strings are within
    ``max_dist`` Levenshtein edits, candidate-blocked on the first
    ``block_len`` lowercased chars — the classic title/name-matching
    join, with the quadratic tamed the standard ER way (compare only
    within blocks).

    Levenshtein runs JVM-side (``F.levenshtein``) and DuckDB's
    ``levenshtein`` matches edit-for-edit, so the oracle replays
    values exactly.

    Recall contract: pairs that differ inside the first ``block_len``
    chars are missed by construction — the standard blocking trade;
    production runs union several block functions (prefix, sorted
    tokens, phonetic) over the same machinery. ``max_block_size`` is
    the skew dial: a boilerplate prefix shared by millions of rows
    would emit C(m,2) candidates, so blocks larger than the cap are
    dropped entirely (one count-window over the block key, the
    ngram_jaccard max_doc_freq pattern) — at 100 TB the cap is
    mandatory, exactly like q11's stop-shingle rule.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``.
    """
    base = (
        df.select(F.col(id_col).alias("id"),
                  F.trim(F.lower(F.col(key_col))).alias("k"))
        .where(F.col("k") != "")
        .withColumn("blk", F.substring("k", 1, block_len))
    )
    if max_block_size is not None:
        w = Window.partitionBy("blk")
        base = base.withColumn("_bs", F.count("*").over(w)) \
            .where(F.col("_bs") <= max_block_size).drop("_bs")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.levenshtein(F.col("a.k"), F.col("b.k"))
                .cast("bigint").alias("dist"))
        .where(F.col("dist") <= max_dist)
    )
