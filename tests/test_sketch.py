"""HyperLogLog sketch: cross-engine register equality + accuracy bounds.

The operator's contract (sketch.py) is that Spark and DuckDB compute the
SAME registers from the same integer hash, so the estimate matches to the
rounded 3 places — covering BOTH estimator branches (linear counting for
small groups, raw harmonic mean for large)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from tree_code_chunker_spark.operators.sketch import (
    hll_distinct,
    hll_distinct_sql,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g bigint, v bigint")


def _both(spark, rows, p):
    df = hll_distinct(_mk(spark, rows), ("g",), "v", p=p)
    got = sorted((r.g, r.hll_est, r.v_zero, r.m) for r in df.collect())
    vals = ", ".join(f"({g}, {v})" for g, v in rows)
    sql = (f"WITH cells(g, v) AS (VALUES {vals}), "
           + hll_distinct_sql("cells", ("g",), "v", p=p))
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    return got, want


def test_hll_matches_duckdb_small_linear_branch(spark):
    # tiny groups -> v_zero > 0 and raw <= 2.5m -> linear-counting branch
    rows = [(g, g * 1000 + i) for g in range(3) for i in range(g * 5 + 2)]
    got, want = _both(spark, rows, p=4)
    assert got == want


def test_hll_matches_duckdb_raw_branch(spark):
    # 600 distincts vs m=16 registers -> raw branch (v_zero == 0 w.h.p.)
    rows = [(0, i * 7919 + 13) for i in range(600)]
    got, want = _both(spark, rows, p=4)
    assert got == want
    assert got[0][2] == 0  # v_zero: every register hit


def test_hll_accuracy_and_duplicate_insensitivity(spark):
    # p=8 -> relative error ~1.04/sqrt(256) = 6.5%; allow 3 sigma.
    n = 2000
    rows = [(0, i * 104729 + 7) for i in range(n)]
    est = hll_distinct(_mk(spark, rows), ("g",), "v", p=8).collect()[0]
    assert abs(est.hll_est - n) / n < 0.20
    # duplicates must not move any register
    est2 = hll_distinct(_mk(spark, rows * 3), ("g",), "v", p=8).collect()[0]
    assert est2.hll_est == est.hll_est and est2.v_zero == est.v_zero


def test_hll_exact_small_sets_identical_registers(spark):
    # same value set in different row orders/duplication -> identical output
    base = [(0, v) for v in (5, 17, 29, 3, 99991)]
    a = hll_distinct(_mk(spark, base), ("g",), "v", p=6).collect()[0]
    b = hll_distinct(_mk(spark, base[::-1] + base), ("g",), "v",
                     p=6).collect()[0]
    assert (a.hll_est, a.v_zero, a.m) == (b.hll_est, b.v_zero, b.m)
    assert a.m == 64


def test_hll_gate_query_alignment(spark, sf_dir):
    # the gate entry itself at sf0.001: estimates within 3 sigma of exact
    import __spark_entry__ as em

    est = {(r.cy, r.cx): r.hll_est
           for r in em.q_hll_cells(spark, sf_dir).collect()}
    exact = {(r.cy, r.cx): r.n for r in em._points(spark, sf_dir)
             .select(F.shiftright("qlat", 13).alias("cy"),
                     F.shiftright("qlon", 13).alias("cx"), "doc_id")
             .groupBy("cy", "cx")
             .agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        if n >= 50:
            assert abs(est[k] - n) / n < 0.20, (k, est[k], n)
