"""Link-graph quality signals for web-scale corpus curation.

Web-crawl training-data pipelines rank hosts/pages by link-graph
centrality (Common Crawl publishes harmonic centrality + PageRank per
host; CCNet/RefinedWeb-style curation uses those ranks as quality
priors for source selection).  The reference repo has no graph stage —
this module is part of the training-data-pipeline extension layer,
alongside dedup/curation/similarity.

Design notes (100 TB shape):

* ``pagerank_fixed`` is an UNROLLED fixed-iteration PageRank — the
  iteration count is a compile-time constant, so the whole computation
  is one declarative DAG Catalyst can see end-to-end (no driver-side
  convergence loop, unlike ``dedup.connected_components`` where the
  round count is data-dependent).  Production web graphs converge to
  ranking-stable in 10-20 damped iterations; callers pick ``iters``.
* All arithmetic is FIXED-POINT integer (rank mass scaled by
  ``scale=10**12``, floor division everywhere), the same trick the
  repo uses for money-cents and epoch-µs: bit-exact across Spark and
  DuckDB regardless of join order, no float-summation drift.  int64
  headroom: total mass ~= scale = 1e12, the damped term multiplies by
  85 before dividing (8.5e13), edge generation multiplies ids by ≤31 —
  all far inside 9.2e18.
* The static relations (``edges`` repartitioned on ``src``,
  ``outdeg``, ``base``) are ``cache()``d: an unrolled plan references
  each of them once per iteration, and MEASURED (500-node fixture,
  3 iterations) the uncached DAG re-executes the whole edge-build
  subtree per reference — 54 FileScans / 75 Exchanges in the executed
  plan, ~2× wall even at fixture scale (5.8 vs 2.7 s warm); AQE does
  NOT stage-dedup these identical subtrees at runtime, so at corpus
  scale the uncached form pays O(iters·|E|) scan+build instead of
  O(|E|).
  ``cache()`` keeps the computation lazy/declarative (no driver
  actions, unlike ``dedup.connected_components``' checkpoint loop,
  which it needs because its round count is data-dependent).  The
  cached edge partitioning on ``src`` means each iteration shuffles
  only the (nodes-sized) rank relation, never the edge corpus.
* Per iteration: one shuffle for the contribution aggregation
  (``groupBy(dst)``) plus the rank⋈edges equi-join on ``src``.
  Dangling mass: nodes without out-edges
  contribute nothing (their mass evaporates); the synthetic generator
  below gives every node outdeg ≥ 1 so the fixture graphs have no
  dangling nodes, and the docstring contract makes the semantics
  explicit for real graphs.
* ``synthetic_link_graph`` derives a deterministic 3-out pseudo web
  graph from a dense integer id column: ``dst_k = (id*a_k + b_k) mod
  n``.  Affine maps mod n give hub structure (collisions concentrate
  in-degree) while staying reproducible from the table alone — the
  DuckDB oracle regenerates the identical edge set from the same
  parquet, so correctness is checked end-to-end including graph
  construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: (a, b) for dst = (id*a + b) mod n — three out-links per node.
LINK_PARAMS = ((31, 7), (17, 3), (5, 11))

SCALE = 10 ** 12


def synthetic_link_graph(nodes: DataFrame, id_col: str) -> DataFrame:
    """Deterministic 3-out link graph over a dense [0, n) id column.

    Returns distinct ``(src, dst)`` edges; self-loops are kept (they
    are valid PageRank edges and keeping them avoids creating dangling
    nodes when all three maps collide onto the source).  ``n`` comes
    from a broadcast 1-row count relation, not a driver action.
    """
    n_rel = nodes.agg(F.count("*").alias("_n"))
    dsts = F.array(*[
        (F.col("src") * F.lit(a) + F.lit(b)) % F.col("_n")
        for a, b in LINK_PARAMS
    ])
    return (
        nodes.select(F.col(id_col).cast("bigint").alias("src"))
        .crossJoin(F.broadcast(n_rel))
        .select("src", F.explode(dsts).alias("dst"))
        .distinct()
    )


def pagerank_fixed(edges: DataFrame, iters: int = 3,
                   scale: int = SCALE,
                   materialize: bool = True) -> DataFrame:
    """Fixed-point, fixed-iteration PageRank (damping 0.85).

    ``edges``: (src, dst) bigint pairs, assumed distinct.  Node set =
    src ∪ dst.  Rank is integer mass out of ``scale``::

        r0(v)   = scale div n
        r_t+1(v) = (15*scale) div (100*n)
                 + (85 * Σ_{u→v} (r_t(u) div outdeg(u))) div 100

    Floor division everywhere → bit-exact across engines.  Nodes with
    no out-edges leak their mass (standard simplification; the
    synthetic generator never produces them).  Returns
    ``(id, outdeg, rank_fp)``; outdeg is 0 for sink-only nodes.

    ``materialize=True`` caches the static relations (see module
    docstring) — callers managing their own persistence (or wrapping
    this in a larger cached pipeline) can pass ``False``.  Cached
    blocks are corpus-of-edges sized; at real web-graph scale pick the
    storage level by persisting ``edges`` yourself and passing
    ``materialize=False``.
    """
    if materialize:
        edges = edges.repartition("src").cache()
    nodes = (edges.select(F.col("src").alias("id"))
             .union(edges.select(F.col("dst").alias("id")))
             .distinct())
    n_rel = nodes.agg(F.count("*").alias("_n"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # static per-node relation: (id, outdeg, _n) — reused every round
    base = (nodes.join(outdeg, nodes["id"] == outdeg["src"], "left")
            .select("id",
                    F.coalesce("outdeg", F.lit(0).cast("bigint"))
                    .alias("outdeg"))
            .crossJoin(F.broadcast(n_rel)))
    if materialize:
        outdeg = outdeg.cache()
        base = base.cache()

    ranks = base.select(
        "id", F.expr(f"CAST({scale} AS BIGINT) div _n").alias("rank_fp"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks.join(outdeg,
                                  ranks["id"] == outdeg["src"])
                       .where(F.col("outdeg") > 0)
                       .select(F.col("id").alias("_u"),
                               F.expr("rank_fp div outdeg").alias("_c")),
                       F.col("src") == F.col("_u"))
            .groupBy("dst").agg(F.sum("_c").alias("_s")))
        ranks = (
            base.join(contrib, base["id"] == contrib["dst"], "left")
            .select(
                "id",
                (F.expr(f"CAST({15 * scale} AS BIGINT) div (100 * _n)")
                 + F.expr("(85 * coalesce(_s, CAST(0 AS BIGINT))) "
                          "div 100")).alias("rank_fp")))
    return (base.select("id", "outdeg")
            .join(ranks, "id")
            .select("id", "outdeg", "rank_fp"))
