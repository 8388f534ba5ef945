"""Integer-exact PageRank vs a pure-python fixed-point mirror."""

import numpy as np
from pyspark.sql import functions as F

from tree_code_chunker_spark.operators.graph import (
    SCALE,
    pagerank_int,
    pagerank_int_sql,
)


def _pagerank_py(edges, iters=5, num=85, den=100, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = scale * (den - num) // den
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        arrived = {}
        for s, d in edges:
            arrived[d] = arrived.get(d, 0) + rank[s] // deg[s]
        rank = {n: base + num * arrived.get(n, 0) // den for n in nodes}
    return rank


def _rand_edges(rng, n_nodes=40, n_edges=200):
    out = set()
    while len(out) < n_edges:
        s, d = int(rng.randint(0, n_nodes)), int(rng.randint(0, n_nodes))
        if s != d:
            out.add((s, d))
    return sorted(out)


def test_pagerank_vs_python_and_parallelism(spark):
    rng = np.random.RandomState(61)
    edges = _rand_edges(rng)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank_int(df, iters=5).collect()}
    want = _pagerank_py(edges, iters=5)
    assert got == want
    rp = {r.node: r.rank
          for r in pagerank_int(df.repartition(13), iters=5).collect()}
    assert rp == want  # integer sums: bit-exact at any parallelism


def test_pagerank_duckdb_mirror(spark):
    import duckdb

    rng = np.random.RandomState(67)
    edges = _rand_edges(rng, n_nodes=25, n_edges=90)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = sorted((r.node, r.rank)
                 for r in pagerank_int(df, iters=4).collect())
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = (f"WITH e(src, dst) AS (VALUES {vals}), "
           + pagerank_int_sql("e", iters=4))
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want


def test_pagerank_sink_concentrates_rank(spark):
    # star graph: every spoke points at the hub -> hub rank dominates
    edges = [(i, 99) for i in range(1, 20)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank_int(df, iters=5).collect()}
    hub = got[99]
    assert all(hub > v for n, v in got.items() if n != 99)
    # spokes have no in-edges: rank = base every iteration
    assert got[1] == SCALE * 15 // 100
