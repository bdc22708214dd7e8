"""pagerank_fixed / synthetic_link_graph unit tests.

The reference implementation below re-derives the fixed-point
arithmetic independently (plain dicts, floor division) so the Spark
plan is checked against the spec, not against itself.
"""

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.graph import (
    LINK_PARAMS, SCALE, pagerank_fixed, synthetic_link_graph)


def _ref_edges(n):
    return sorted({(i, (i * a + b) % n) for i in range(n)
                   for a, b in LINK_PARAMS})


def _ref_pagerank(edges, iters, scale=SCALE):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    rank = {v: scale // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {v: 15 * scale // (100 * n) + 85 * s[v] // 100
                for v in nodes}
    return {v: (outdeg[v], rank[v]) for v in nodes}


@pytest.fixture(scope="module")
def nodes37(spark):
    return spark.range(37).select(F.col("id").alias("doc_id"))


def test_synthetic_graph_matches_reference(spark, nodes37):
    got = sorted(tuple(r) for r in
                 synthetic_link_graph(nodes37, "doc_id").collect())
    assert got == _ref_edges(37)


def test_pagerank_exact_vs_reference(spark, nodes37):
    edges = synthetic_link_graph(nodes37, "doc_id")
    got = {r["id"]: (r["outdeg"], r["rank_fp"])
           for r in pagerank_fixed(edges, iters=3).collect()}
    assert got == _ref_pagerank(_ref_edges(37), iters=3)


def test_pagerank_mass_and_types(spark, nodes37):
    edges = synthetic_link_graph(nodes37, "doc_id")
    df = pagerank_fixed(edges, iters=2)
    assert dict(df.dtypes) == {
        "id": "bigint", "outdeg": "bigint", "rank_fp": "bigint"}
    rows = df.collect()
    total = sum(r["rank_fp"] for r in rows)
    # floor losses only: each node loses < 1 unit per div, bounded by
    # (n + edges) per iteration — mass stays within that of SCALE
    assert 0 < total <= SCALE
    assert total > SCALE - 10_000
    assert all(r["rank_fp"] > 0 for r in rows)


def test_pagerank_partitioning_invariant(spark, nodes37):
    edges = synthetic_link_graph(nodes37, "doc_id")
    a = sorted(tuple(r) for r in pagerank_fixed(edges, iters=2).collect())
    b = sorted(tuple(r) for r in
               pagerank_fixed(edges.repartition(7), iters=2).collect())
    assert a == b


def test_pagerank_dangling_and_sink_nodes(spark):
    # explicit edge list: node 3 is a pure sink (outdeg 0, rank only
    # accumulates), node 0 a hub; checks the left-join/coalesce paths
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: (r["outdeg"], r["rank_fp"])
           for r in pagerank_fixed(df, iters=2).collect()}
    assert got == _ref_pagerank(edges, iters=2)
    assert got[3][0] == 0
