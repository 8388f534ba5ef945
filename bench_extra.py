"""Extra benchmarks: sub-stage isolation for the expensive bench queries
(guide §1.4 — noop-sink isolation, labeled jobs).  NOT part of the frozen
driver bench; numbers are cited in OPTIMIZATION_r07.md.

Usage: python bench_extra.py [stage ...]   (default: all)
Stages: knn_self, map_match, pagerank, misc
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

T: dict[str, float] = {}


def timed(name, fn, trials=2):
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    T[name] = round(best, 3)
    print(f"  {name}: {best:.3f}s", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(stages):
    from tree_code_chunker_spark.operators.geo import cell_col, derive_point_cols
    from tree_code_chunker_spark.plans.session import get_spark
    from tree_code_chunker_spark.sources.adapter import spanify_exploded

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"bench-extra-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    REPLICATE = 256
    base = spanify_exploded(docs).select(
        "doc_id", F.col("span_pos").cast("long").alias("span_pos"))
    keys = base.crossJoin(
        spark.range(REPLICATE).select(F.col("id").alias("rep"))
    ).select(
        "doc_id", (F.col("span_pos") * REPLICATE + F.col("rep")).alias("span_pos"))
    qlat, qlon = derive_point_cols(F.col("doc_id").cast("long"), F.col("span_pos"))
    pts = keys.select("doc_id", "span_pos", qlat.alias("qlat"), qlon.alias("qlon"))
    pts = pts.withColumn("cell", cell_col(F.col("qlat"), F.col("qlon")))
    pts = pts.repartition(max(cores * 3, 24)).cache()
    n_points = pts.count()
    print(f"n_points={n_points}", flush=True)

    if "knn_self" in stages:
        from tree_code_chunker_spark.operators.knn import (
            FINE_MAX_RHO, KnnIndex, _self_key, knn_ring, plan_radii_fine_np,
            plan_radii_np)

        probe_self = pts.filter(F.col("span_pos") % 46 == 0).select(
            _self_key(["doc_id", "span_pos"]).alias("query_id"), "qlat", "qlon")
        sc.setJobDescription("knn_self: index build")
        t0 = time.perf_counter()
        kidx = KnnIndex(pts, res=10, res_hist=10)
        T["knnself_index_build"] = round(time.perf_counter() - t0, 3)
        print(f"  index build: {T['knnself_index_build']}s "
              f"(hot cells: {len(kidx.fine_sats)})", flush=True)

        # replicate knn_ring internals to time each phase
        import numpy as np
        import pandas as pd
        res, res_hist = kidx.res, kidx.res_hist
        from tree_code_chunker_spark.config import GRID_BITS
        shift = GRID_BITS - res
        k_plan = 5  # k=4 + self
        qsel = probe_self.select(
            "query_id",
            F.col("qlat").cast("long").alias("q_qlat"),
            F.col("qlon").cast("long").alias("q_qlon"))
        sat_b = sc.broadcast((kidx.sat, kidx.fine_sats))

        def plan_part(batches):
            for pdf in batches:
                if len(pdf):
                    pdf = pdf.copy()
                    csat, cfine = sat_b.value
                    la = pdf["q_qlat"].to_numpy(np.int64)
                    lo_ = pdf["q_qlon"].to_numpy(np.int64)
                    pdf["rho"] = plan_radii_np(csat, la, lo_, res_hist, res, k_plan)
                    pdf["rho_fine"] = plan_radii_fine_np(
                        cfine, la, lo_, res_hist, k_plan, FINE_MAX_RHO)
                else:
                    pdf["rho"] = pd.Series([], dtype="int32")
                    pdf["rho_fine"] = pd.Series([], dtype="int32")
                yield pdf

        plan_schema = ("query_id string, q_qlat bigint, q_qlon bigint, "
                       "rho int, rho_fine int")
        sc.setJobDescription("knn_self: planning checkpoint")
        t0 = time.perf_counter()
        q_all = qsel.mapInPandas(plan_part, plan_schema) \
            .localCheckpoint(eager=True)
        T["knnself_plan_ckpt"] = round(time.perf_counter() - t0, 3)
        print(f"  plan+ckpt: {T['knnself_plan_ckpt']}s", flush=True)

        not_fine = F.col("rho_fine") < 0
        sc.setJobDescription("knn_self: stats agg")
        t0 = time.perf_counter()
        stats = q_all.agg(
            F.sum(F.when((F.col("rho") <= 64) & not_fine,
                         (2 * F.col("rho") + 1) * (2 * F.col("rho") + 1))
                  .otherwise(F.lit(0))).alias("est"),
            F.count(F.when((F.col("rho") > 64) & not_fine, 1)).alias("n_sparse"),
            F.sum(F.when(~not_fine,
                         (2 * F.col("rho_fine") + 1) * (2 * F.col("rho_fine") + 1))
                  .otherwise(F.lit(0))).alias("est_fine"),
            F.count(F.when(~not_fine, 1)).alias("n_fine"),
            F.count("*").alias("n_total"),
        ).first()
        T["knnself_stats"] = round(time.perf_counter() - t0, 3)
        print(f"  stats agg: {T['knnself_stats']}s  -> est_exploded="
              f"{stats['est']}, n_sparse={stats['n_sparse']}, "
              f"est_fine={stats['est_fine']}, n_fine={stats['n_fine']}, "
              f"n_total={stats['n_total']}", flush=True)

        # branch counts via the real public entry (whole thing)
        sc.setJobDescription("knn_self: full knn_ring")
        timed("knnself_full", lambda: knn_ring(
            probe_self, k=4, index=kidx, probe_mode="distributed",
            exclude_self=True).count())
        sc.setJobDescription(None)

    if "map_match" in stages:
        from tree_code_chunker_spark.operators.overlay import (
            overlay_res, snap_to_segments)
        segs = pts.filter((F.col("span_pos") % 256 == 0)
                          & (F.col("doc_id").cast("long") % 5 != 0)).select(
            (F.col("doc_id").cast("long") * 100000 + F.col("span_pos"))
            .alias("seg_id"),
            F.col("qlat").alias("y1"), F.col("qlon").alias("x1"),
            (F.col("qlat") + (F.col("qlat") * 7 + F.col("qlon") * 3) % 2401
             - 1200).alias("y2"),
            (F.col("qlon") + (F.col("qlat") * 5 + F.col("qlon") * 11) % 2401
             - 1200).alias("x2"))
        n_segs = segs.count()
        print(f"  n_segs={n_segs}", flush=True)
        sc.setJobDescription("map_match: candidates only (no window)")
        timed("mm_cand_only", lambda: snap_to_segments(
            pts, segs, 200, overlay_res(512),
            p_keep=("doc_id", "span_pos"), nearest_only=False).count())
        sc.setJobDescription("map_match: full (window)")
        timed("mm_full", lambda: snap_to_segments(
            pts, segs, 200, overlay_res(512),
            p_keep=("doc_id", "span_pos")).count())
        sc.setJobDescription(None)

    if "pagerank" in stages:
        from tree_code_chunker_spark.operators.graph import SCALE, pagerank_int
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pr_edges = li.select(F.col("l_orderkey").alias("src"),
                             F.col("l_partkey").alias("dst"))
        n_edges = pr_edges.count()
        pr_nodes = pr_edges.select("src").union(
            pr_edges.select("dst")).distinct().count()
        print(f"  n_edges={n_edges} n_nodes={pr_nodes}", flush=True)
        pr_tol = pr_nodes * SCALE // 100
        deltas: list[int] = []

        def tol_once():
            deltas.clear()
            pagerank_int(pr_edges, iters=20, tol=pr_tol,
                         deltas_out=deltas).count()

        sc.setJobDescription("pagerank tol")
        timed("pagerank_tol", tol_once)
        print(f"  iters={len(deltas)} delta={deltas[-1]}", flush=True)
        sc.setJobDescription(None)

    print(json.dumps(T))
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:] or ["knn_self", "map_match", "pagerank"]
    main(args)
