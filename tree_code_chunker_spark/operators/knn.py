"""kNN join via cell-prefix ring expansion (H3 k-ring contract on the
Morton grid), plus a brute-force baseline.

Structure (SURVEY.md §2.4): the reference's `getSiblings` is kNN in 1-D
(prune to ordered neighborhood, then top-k by distance —
codechunk.go:653-689); this is the same prune-then-top-k in 2-D:

 1. queries x Chebyshev cell disk of radius rho at resolution `res`
    (explode of (2rho+1)^2 offsets — query side is the small side),
 2. equi-join with the corpus on the cell key (corpus stays put: the join
    key is its pre-computed cell column, so the 10^12-row side shuffles at
    most once on a key it is already bucketed by),
 3. exact top-k by INTEGER squared Euclidean distance on grid coords with a
    total-order tie-break (d2, doc_id, span_pos) via a row_number window,
 4. **exactness guarantee**: a provisional top-k at disk radius rho is final
    iff kth d2 <= (rho*S)^2 (S = cell side in grid units): any point outside
    the searched disk is at Chebyshev >= rho*S+1 > sqrt(d2_k).  Queries not
    yet final re-run at doubled rho (driver loop over ~log iterations, each
    a single Spark job — no per-row driver work).

Determinism: integer distance, integer tie-break — bit-exact at any
parallelism; the DuckDB oracle is a brute-force scan with the identical
ordering, so results match row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_CELL_RES, GRID_BITS


def _topk(cand: DataFrame, k: int, tie_cols: list[str]) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), *[F.col(c).asc() for c in tie_cols]
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_bruteforce(
    queries: DataFrame, corpus: DataFrame, k: int,
    tie_cols: list[str] = ["doc_id", "span_pos"],
) -> DataFrame:
    """Exact baseline: full cross join + window top-k.  O(Q x N) — the
    correctness oracle and the small-Q fallback."""
    q = queries.select("query_id", F.col("qlat").alias("q_qlat"),
                       F.col("qlon").alias("q_qlon"))
    c = corpus.select(*tie_cols, "qlat", "qlon")
    cand = F.broadcast(q).crossJoin(c).withColumn(
        "d2",
        (F.col("qlat") - F.col("q_qlat")) * (F.col("qlat") - F.col("q_qlat"))
        + (F.col("qlon") - F.col("q_qlon")) * (F.col("qlon") - F.col("q_qlon")),
    )
    return _topk(cand, k, tie_cols).select(
        "query_id", *tie_cols, "d2", "rank"
    )


def knn_ring(
    queries: DataFrame, corpus: DataFrame, k: int,
    res: int = DEFAULT_CELL_RES,
    tie_cols: list[str] = ["doc_id", "span_pos"],
    max_iters: int = 8,
) -> DataFrame:
    """Ring-expansion kNN.  queries(query_id, qlat, qlon); corpus(tie_cols...,
    qlat, qlon).  Returns (query_id, tie_cols..., d2, rank<=k)."""
    spark = queries.sparkSession
    shift = GRID_BITS - res
    cell_size = 1 << shift

    corp = corpus.select(
        *tie_cols, "qlat", "qlon",
        F.shiftright("qlat", shift).alias("ccy"),
        F.shiftright("qlon", shift).alias("ccx"),
    )

    pending = queries.select("query_id", "qlat", "qlon")
    done_parts: list[DataFrame] = []
    rho = 1
    for it in range(max_iters):
        offs = [(dy, dx) for dy in range(-rho, rho + 1) for dx in range(-rho, rho + 1)]
        off_df = F.broadcast(
            spark.createDataFrame(offs, "dy int, dx int")
        )
        probe = (
            pending.crossJoin(off_df)
            .select(
                "query_id",
                F.col("qlat").alias("q_qlat"),
                F.col("qlon").alias("q_qlon"),
                (F.shiftright("qlat", shift) + F.col("dy")).alias("ccy"),
                (F.shiftright("qlon", shift) + F.col("dx")).alias("ccx"),
            )
        )
        cand = F.broadcast(probe).join(corp, ["ccy", "ccx"], "inner").withColumn(
            "d2",
            (F.col("qlat") - F.col("q_qlat")) * (F.col("qlat") - F.col("q_qlat"))
            + (F.col("qlon") - F.col("q_qlon")) * (F.col("qlon") - F.col("q_qlon")),
        )
        topk = _topk(cand, k, tie_cols)
        # final iff k candidates found AND kth distance within guarantee radius
        guard = rho * cell_size
        stats = topk.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("d2").alias("dk")
        ).withColumn(
            "final", (F.col("n") >= k) & (F.col("dk") <= guard * guard)
        )
        finals = topk.join(stats.filter("final").select("query_id"), "query_id", "left_semi")
        done_parts.append(finals.select("query_id", *tie_cols, "d2", "rank"))
        pending = pending.join(
            stats.filter("final").select("query_id"), "query_id", "left_anti"
        )
        # cheap driver-side emptiness probe ends the loop early
        if pending.isEmpty():
            break
        rho *= 2

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    if not pending.isEmpty():
        out = out.unionByName(
            knn_bruteforce(pending, corpus, k, tie_cols)
            .select("query_id", *tie_cols, "d2", "rank")
        )
    return out
