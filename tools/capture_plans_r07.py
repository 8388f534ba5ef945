"""Capture .explain('formatted') for the r7-touched bench queries.

Usage:  python tools/capture_plans_r07.py <repo_root> <suffix>
  e.g.  python tools/capture_plans_r07.py /tmp/r7_before before
        python tools/capture_plans_r07.py /root/repo after

Writes plans/r07/<query>_<suffix>.txt under /root/repo (always), using the
ENGINE CODE at <repo_root> — so the 'before' files reflect the round-start
implementation and the 'after' files the optimized one, over identical
inputs (sf0.01 keeps plan shapes identical to sf0.1 while running in
seconds; plan structure does not depend on row counts except where noted).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = sys.argv[1]
SUFFIX = sys.argv[2]
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

OUT_DIR = "/root/repo/plans/r07"


def main():
    from tree_code_chunker_spark.operators.geo import (
        cell_col, derive_point_cols)
    from tree_code_chunker_spark.plans.session import get_spark
    from tree_code_chunker_spark.sources.adapter import spanify_exploded
    from tree_code_chunker_spark.sources.datagen import (
        gen_knn_queries, gen_polygons)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(f"plans-r07-{SUFFIX}", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    REPLICATE = 256
    base = spanify_exploded(docs).select(
        "doc_id", F.col("span_pos").cast("long").alias("span_pos"))
    keys = base.crossJoin(
        spark.range(REPLICATE).select(F.col("id").alias("rep"))
    ).select("doc_id",
             (F.col("span_pos") * REPLICATE + F.col("rep")).alias("span_pos"))
    qla, qlo = derive_point_cols(F.col("doc_id").cast("long"),
                                 F.col("span_pos"))
    pts = keys.select("doc_id", "span_pos", qla.alias("qlat"),
                      qlo.alias("qlon"))
    pts = pts.withColumn("cell", cell_col(F.col("qlat"), F.col("qlon")))
    pts = pts.repartition(24).cache()
    pts.count()

    def cap(name, df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"{OUT_DIR}/{name}_{SUFFIX}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)

    # --- knn_self_200k (the bench's distributed self-probe) ---
    from tree_code_chunker_spark.operators.knn import (
        KnnIndex, _self_key, knn_ring)
    probe_self = pts.filter(F.col("span_pos") % 46 == 0).select(
        _self_key(["doc_id", "span_pos"]).alias("query_id"), "qlat", "qlon")
    kidx_self = KnnIndex(pts, res=10, res_hist=10)
    cap("knn_self_200k", knn_ring(probe_self, k=4, index=kidx_self,
                                  probe_mode="distributed",
                                  exclude_self=True))

    # --- knn (driver-planned ring) ---
    queries = gen_knn_queries(spark, 50, seed=44)
    kidx = KnnIndex(pts, res=10)
    cap("knn", knn_ring(queries, k=5, index=kidx))

    # --- map_match ---
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
    cap("map_match", snap_to_segments(pts, segs, 200, overlay_res(512),
                                      p_keep=("doc_id", "span_pos")))

    # --- pagerank (1 iteration shows the per-iteration plan unit) ---
    # localCheckpoint replaces the logical plan with a LogicalRDD, which
    # would hide the iteration body from explain(); bypass it here so the
    # captured plan shows the real per-iteration exchanges.
    _DF = type(docs)  # the concrete (classic) DataFrame class

    from tree_code_chunker_spark.operators.graph import pagerank_int
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pr_edges = li.select(F.col("l_orderkey").alias("src"),
                         F.col("l_partkey").alias("dst"))
    _orig_ckpt = _DF.localCheckpoint
    _DF.localCheckpoint = lambda self, eager=True: self
    try:
        cap("pagerank_1it", pagerank_int(pr_edges, iters=1))
    finally:
        _DF.localCheckpoint = _orig_ckpt

    # --- bm25 ---
    from tree_code_chunker_spark.operators.rank import bm25_topk
    cap("bm25", bm25_topk(
        docs, "doc_id", "text",
        [(1, "spark window join"), (2, "fast table scan"),
         (3, "stream batch merge group")], topk=10))

    # --- asof ---
    from tree_code_chunker_spark.operators.events import asof_join
    trades = pts.select("doc_id", (F.col("span_pos") * 7919).alias("ts_us"))
    quotes = pts.filter(F.col("span_pos") % 16 == 0).select(
        "doc_id", (F.col("span_pos") * 6151).alias("qts_us"),
        F.col("span_pos").alias("qid"))
    cap("asof", asof_join(trades, quotes, ["doc_id"], "ts_us", "qts_us"))

    # --- pip_tile (the pip_join half; the tile rollup is unchanged) ---
    from tree_code_chunker_spark.operators.pip import (
        build_polygon_index, pip_join)
    polys = gen_polygons(spark, 2000, seed=43)
    pidx = build_polygon_index(polys)
    cap("pip_join", pip_join(pts, index=pidx).groupBy("polygon_id")
        .agg(F.count("*").alias("n")))

    # --- st_colocate (session-level SHJ preference shows here) ---
    from tree_code_chunker_spark.operators.spatial import st_colocate_join
    pts_t = pts.filter(F.col("span_pos") % 16 == 0).withColumn(
        "t_s",
        (F.col("doc_id").cast("long") * 7919 + F.col("span_pos") * 131)
        % 86400)
    cap("st_colocate", st_colocate_join(pts_t, 16, 300))

    # --- skyline (gate query; correctness fix changed its job structure) ---
    from tree_code_chunker_spark.operators.profile import skyline2d
    sky_in = pts.select((F.col("qlat") % 1000).alias("x"),
                        (F.col("qlon") % 1000).alias("y"))
    cap("skyline", skyline2d(sky_in, "x", "y"))

    spark.stop()


if __name__ == "__main__":
    main()
