"""kNN join via cell-prefix search on the Morton grid (H3 k-ring contract),
plus a brute-force baseline.

Structure (SURVEY.md §2.4): the reference's `getSiblings` is kNN in 1-D
(prune to an ordered neighborhood, then take k — codechunk.go:653-689); this
is the same prune-then-top-k in 2-D, planned to avoid iterative lineage
growth (an earlier loop-of-joins version recomputed its whole lineage every
round and was ~20x slower):

 1. **Radius planning** (tiny): a cell-count histogram of the corpus at
    res_hist is collected once and turned into a summed-area table (SAT) —
    O(1) "how many corpus points within Chebyshev radius rho" per query.
    Driver-side numpy binary-searches the smallest rho_hit whose disk
    holds >= k points, then inflates it to a GUARANTEE radius rho_g with
    rho_g*S + 1 > sqrt(2) * ((rho_hit+1)*S_hist - 1) >= d_k, using the
    integer bound 1449/1024 > sqrt(2) — so no point outside the searched
    disk can beat the provisional k-th neighbor.  One histogram shuffle +
    one small collect, independent of corpus size.
 2. **Candidate join** (one shuffle): each query explodes its own
    (2*rho_g+1)^2 cell offsets via F.sequence (per-row bounds — no driver
    loop), equi-joins the corpus on the cell key, exact top-k by INTEGER
    squared distance with total-order tie-break (d2, doc_id, span_pos) via
    row_number.

Exactness: guaranteed by construction (step 1's radius bound), verified
against brute force in tests and against a DuckDB brute-force oracle by the
driver gate.  All-integer math -> bit-exact at any parallelism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_CELL_RES, GRID_BITS

SQRT2_NUM = 1449  # 1449/1024 > sqrt(2): conservative integer inflation
SQRT2_DEN = 1024


def _topk(cand: DataFrame, k: int, tie_cols: list[str]) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), *[F.col(c).asc() for c in tie_cols]
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _scored(q: DataFrame, c: DataFrame) -> DataFrame:
    return q.crossJoin(c).withColumn(
        "d2",
        (F.col("qlat") - F.col("q_qlat")) * (F.col("qlat") - F.col("q_qlat"))
        + (F.col("qlon") - F.col("q_qlon")) * (F.col("qlon") - F.col("q_qlon")),
    )


def knn_bruteforce(
    queries: DataFrame, corpus: DataFrame, k: int,
    tie_cols: list[str] = ["doc_id", "span_pos"],
) -> DataFrame:
    """Exact baseline: broadcast queries x full corpus + window top-k.
    O(Q x N) — correctness oracle and small-corpus fallback."""
    q = F.broadcast(queries.select(
        "query_id", F.col("qlat").alias("q_qlat"), F.col("qlon").alias("q_qlon")))
    c = corpus.select(*tie_cols, "qlat", "qlon")
    return _topk(_scored(q, c), k, tie_cols).select(
        "query_id", *tie_cols, "d2", "rank")


def plan_radii_np(sat: np.ndarray, qlat: np.ndarray, qlon: np.ndarray,
                  res_hist: int, res: int, k: int) -> np.ndarray:
    """Guarantee radius (in res-cells) per query from the histogram SAT —
    plain numpy, run ON THE DRIVER: the query set is the small side by
    contract and the SAT already lives there, so shipping 50 rows to an
    executor python worker was one whole Spark job of pure fixed cost."""
    n = 1 << res_hist
    s_hist = 1 << (GRID_BITS - res_hist)
    s_res = 1 << (GRID_BITS - res)
    grid_cap = 1 << res  # full-grid radius cap

    def disk_count(hy: int, hx: int, rho: int) -> int:
        y0, y1 = max(hy - rho, 0), min(hy + rho, n - 1)
        x0, x1 = max(hx - rho, 0), min(hx + rho, n - 1)
        return (sat[y1 + 1, x1 + 1] - sat[y0, x1 + 1]
                - sat[y1 + 1, x0] + sat[y0, x0])

    out = np.empty(len(qlat), dtype=np.int32)
    for i in range(len(qlat)):
        hy = int(qlat[i]) >> (GRID_BITS - res_hist)
        hx = int(qlon[i]) >> (GRID_BITS - res_hist)
        # binary search smallest rho_hit with disk count >= k
        lo, hi = 0, n  # disk at rho=n covers the whole grid
        if disk_count(hy, hx, hi) < k:
            out[i] = grid_cap  # corpus smaller than k: search everything
            continue
        while lo < hi:
            mid = (lo + hi) // 2
            if disk_count(hy, hx, mid) >= k:
                hi = mid
            else:
                lo = mid + 1
        rho_hit = lo
        d_max = (SQRT2_NUM * ((rho_hit + 1) * s_hist - 1)) // SQRT2_DEN + 1
        out[i] = min(d_max // s_res + 1, grid_cap)
    return out


class KnnIndex:
    """Build-once corpus side of the ring kNN: the cell-keyed corpus
    projection plus the histogram SAT used for radius planning.

    Amortizes the one histogram shuffle + collect across many probe
    batches (interactive query streams, the bench, foreachBatch) — the
    corpus analogue of pip.PolygonIndex.  Independent of k and of the
    query set."""

    def __init__(self, corpus: DataFrame,
                 res: int = DEFAULT_CELL_RES,
                 tie_cols: list[str] = ["doc_id", "span_pos"],
                 res_hist: int | None = None):
        if res_hist is None:
            # coarse is better: rh=7 -> 16k histogram groups (cheap
            # shuffle + collect) at the price of a somewhat larger
            # guarantee radius; the candidate join absorbs that far more
            # cheaply than a 200k-group histogram costs (measured: hist
            # 3.2s at rh=9 vs ~0.4s at rh=7)
            res_hist = min(res, 7)
        self.res, self.res_hist, self.tie_cols = res, res_hist, list(tie_cols)
        shift = GRID_BITS - res
        self.corpus = corpus
        self.corp = corpus.select(
            *tie_cols, "qlat", "qlon",
            F.shiftright("qlat", shift).alias("ccy"),
            F.shiftright("qlon", shift).alias("ccx"),
        )
        sh = GRID_BITS - res_hist
        hist = (
            self.corp.groupBy(
                F.shiftright("qlat", sh).alias("hy"),
                F.shiftright("qlon", sh).alias("hx"),
            ).agg(F.count("*").alias("n")).toPandas()  # Arrow path: a plain
            # collect() of ~10^5 hist rows through py4j dominated kNN time
        )
        n = 1 << res_hist
        grid = np.zeros((n, n), dtype=np.int64)
        grid[hist["hy"].to_numpy(), hist["hx"].to_numpy()] = \
            hist["n"].to_numpy()
        self.sat = np.zeros((n + 1, n + 1), dtype=np.int64)
        np.cumsum(grid, axis=0, out=self.sat[1:, 1:])
        np.cumsum(self.sat[1:, 1:], axis=1, out=self.sat[1:, 1:])
        self.total = int(self.sat[n, n])


def knn_ring(
    queries: DataFrame, corpus: DataFrame = None, k: int = 5,
    res: int = DEFAULT_CELL_RES,
    tie_cols: list[str] = ["doc_id", "span_pos"],
    res_hist: int | None = None,
    max_rho: int = 64,
    broadcast_cap_rows: int = 4_000_000,
    index: KnnIndex | None = None,
) -> DataFrame:
    """Cell ring kNN.  queries(query_id, qlat, qlon); corpus(tie_cols...,
    qlat, qlon).  Returns (query_id, tie_cols..., d2, rank <= k), exact.
    Pass a prebuilt KnnIndex to amortize the histogram/SAT across probe
    batches (res/res_hist/tie_cols then come from the index)."""
    spark = queries.sparkSession
    if index is None:
        if corpus is None:
            raise ValueError("knn_ring needs a corpus= or an index=")
        index = KnnIndex(corpus, res=res, tie_cols=tie_cols,
                         res_hist=res_hist)
    elif corpus is not None and corpus is not index.corpus:
        raise ValueError(
            "knn_ring got BOTH corpus= and index= (built from a different "
            "DataFrame): the index's snapshot would silently win — pass "
            "one or the other")
    res, res_hist, tie_cols = index.res, index.res_hist, index.tie_cols
    corp, sat = index.corp, index.sat
    shift = GRID_BITS - res
    if index.total < k:  # whole corpus smaller than k: no prune possible
        return knn_bruteforce(queries, index.corpus, k, tie_cols)

    # plan the radii on the DRIVER (query set is the SMALL side by design):
    # one tiny collect, numpy planning in-process, then a literal DataFrame
    # — no executor python worker, no UDF in the candidate join's DAG, and
    # the join plan is pure JVM end-to-end
    q_pd = queries.select(
        "query_id",
        F.col("qlat").alias("q_qlat"),
        F.col("qlon").alias("q_qlon"),
    ).toPandas()
    q_pd["rho"] = plan_radii_np(
        sat, q_pd["q_qlat"].to_numpy(np.int64),
        q_pd["q_qlon"].to_numpy(np.int64), res_hist, res, k)
    qid_type = dict(queries.dtypes)["query_id"]
    q_all = spark.createDataFrame(
        q_pd, f"query_id {qid_type}, q_qlat bigint, q_qlon bigint, rho int"
    )
    # sparse-region queries (huge guarantee radius) would explode the
    # candidate join; route them to the brute-force path instead
    q = q_all.filter(F.col("rho") <= max_rho)
    q_sparse = q_all.filter(F.col("rho") > max_rho)
    has_sparse = bool((q_pd["rho"] > max_rho).any())

    # --- phase 2: one candidate join with per-query radius ---
    probe = (
        q.withColumn(
            "ccy",
            F.explode(F.sequence(
                F.shiftright("q_qlat", shift) - F.col("rho"),
                F.shiftright("q_qlat", shift) + F.col("rho"),
            )),
        )
        .withColumn(
            "ccx",
            F.explode(F.sequence(
                F.shiftright("q_qlon", shift) - F.col("rho"),
                F.shiftright("q_qlon", shift) + F.col("rho"),
            )),
        )
        .select("query_id", "q_qlat", "q_qlon", "ccy", "ccx")
    )
    # the exploded probe is (2*rho+1)^2 rows per query — broadcast only while
    # the estimated exploded size fits comfortably in memory; past the cap,
    # fall back to a shuffle equi-join on the cell key (same result, bounded
    # memory; a huge query set should not be able to OOM the driver)
    rho_col = q_pd["rho"].to_numpy()
    est_exploded = int(((2 * rho_col[rho_col <= max_rho] + 1) ** 2).sum())
    probe_side = F.broadcast(probe) if est_exploded <= broadcast_cap_rows else probe
    cand = probe_side.join(corp, ["ccy", "ccx"], "inner").withColumn(
        "d2",
        (F.col("qlat") - F.col("q_qlat")) * (F.col("qlat") - F.col("q_qlat"))
        + (F.col("qlon") - F.col("q_qlon")) * (F.col("qlon") - F.col("q_qlon")),
    )
    out = _topk(cand, k, tie_cols).select("query_id", *tie_cols, "d2", "rank")
    # only pay the brute-force corpus scan if some query actually needs it
    if has_sparse:
        sparse_out = _topk(
            _scored(F.broadcast(q_sparse.drop("rho")),
                    corp.select(*tie_cols, "qlat", "qlon")),
            k, tie_cols,
        ).select("query_id", *tie_cols, "d2", "rank")
        out = out.unionByName(sparse_out)
    return out
