"""Single-session scaling measurement (the noise-robust variant).

Separate-JVM runs (tools/scaling_bench.py) are at the mercy of this
sandbox's hypervisor drift (3-5x minute-scale throughput swings measured),
which swamps the signal.  Here both parallelism levels run back-to-back,
INTERLEAVED (A B A B ...), inside ONE local[4N] session: the N-core level is
emulated by giving the stage only N input partitions (tasks are Spark's unit
of parallelism, so a 4-partition stage uses 4 cores).  Host drift then hits
both levels equally and the ratio measures the ENGINE, not the weather.

Writes the headline table appended to BENCH/BASELINE.md and prints one JSON
line.
"""

from __future__ import annotations

import json
import os
import sys

# measurement harness, not engine default: the N-level stage packs the
# whole 9.2M-point candidate join into 4 tasks, and with the 8g default
# heap the shared execution-memory pool intermittently OOMs
# (UNABLE_TO_ACQUIRE_MEMORY, 2 of 5 round-6 sessions); the box has
# 128 GB, so give the harness JVM real headroom
import os as _os
_os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

N = 4
N4 = 16
TRIALS = 5
KNN_TRIALS = 3  # knn_self pairs are minute-scale at the N level


def main():
    from tree_code_chunker_spark.operators.geo import derive_point_cols, tile_cols
    from tree_code_chunker_spark.operators.knn import knn_ring
    from tree_code_chunker_spark.operators.pip import pip_join
    from tree_code_chunker_spark.plans.session import get_spark
    from tree_code_chunker_spark.sources.adapter import spanify_exploded
    from tree_code_chunker_spark.sources.datagen import gen_polygons

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling-single", cores=N4,
                      shuffle_partitions=N4 * 2)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    base = spanify_exploded(docs).select(
        "doc_id", F.col("span_pos").cast("long").alias("span_pos"))
    keys = base.crossJoin(
        spark.range(256).select(F.col("id").alias("rep"))
    ).select("doc_id",
             (F.col("span_pos") * 256 + F.col("rep")).alias("span_pos"))
    qlat, qlon = derive_point_cols(F.col("doc_id").cast("long"),
                                   F.col("span_pos"))
    pts = keys.select("doc_id", "span_pos", qlat.alias("qlat"),
                      qlon.alias("qlon"))
    pts_n = pts.repartition(N).cache()
    pts_n4 = pts.repartition(N4 * 3).cache()
    n_points = pts_n.count()
    pts_n4.count()
    polys = gen_polygons(spark, 2000, seed=43)
    # index built once: its cost is parallelism-INDEPENDENT (driver-side
    # build of the broadcast side), so folding it into every trial would
    # only measure Amdahl on a cost no deployment pays per batch
    from tree_code_chunker_spark.operators.pip import build_polygon_index
    pidx = build_polygon_index(polys)

    # kNN scaling is measured on the SELF-JOIN stage (round-5): the r4
    # harness paired a 50-query probe whose 2-3s of planning/probe-sniff
    # fixed cost dominated (Amdahl, eff 0.346 measured) — the term that
    # dominates at 10^12 rows is the corpus-sized candidate join, so the
    # pair below probes ~100k corpus points through the DISTRIBUTED
    # planner (broadcast SAT + mapInPandas; probe side never collected)
    # against the full 9.2M-point index.  Each level gets an index built
    # over ITS partitioning so corpus-side scan parallelism binds too
    # (the SATs are identical; only the corp DataFrame layout differs).
    from tree_code_chunker_spark.operators.knn import KnnIndex, _self_key

    def self_probe(p):
        return p.filter(F.col("span_pos") % 92 == 0).select(
            _self_key(["doc_id", "span_pos"]).alias("query_id"),
            "qlat", "qlon")

    kidx_n = KnnIndex(pts_n, res=10, res_hist=10)
    kidx_n4 = KnnIndex(pts_n4, res=10, res_hist=10)
    probe_n = self_probe(pts_n)
    probe_n4 = self_probe(pts_n4)

    def headline(p, parts):
        # the level's parallelism must bind REDUCE stages too, not just the
        # scan: leaving shuffle.partitions at the session value would run
        # every post-shuffle stage at full width even for the N-core level,
        # inflating it and understating the true N->4N ratio
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.perf_counter()
        pip_join(p, index=pidx).groupBy("polygon_id") \
            .agg(F.count("*").alias("n")).collect()
        tx, ty = tile_cols(F.col("qlat"), F.col("qlon"), 12)
        cur = p.select(tx.alias("x"), ty.alias("y")) \
            .groupBy("x", "y").agg(F.count("*").alias("n"))
        cur.count()
        return time.perf_counter() - t0

    def knn_stage(probe, kidx, parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.perf_counter()
        knn_ring(probe, k=4, index=kidx, probe_mode="distributed",
                 exclude_self=True).count()
        return time.perf_counter() - t0

    headline(pts_n4, N4 * 2)  # warm-up: codegen, python workers, broadcasts
    knn_stage(probe_n4, kidx_n4, N4 * 2)
    times_n, times_n4, ratios = [], [], []
    knn_n, knn_n4, knn_ratios = [], [], []
    for t in range(TRIALS):  # adjacent-in-time pairs: drift cancels per pair
        a = headline(pts_n, N)
        b = headline(pts_n4, N4 * 2)
        times_n.append(a)
        times_n4.append(b)
        ratios.append(a / b)
        if t < KNN_TRIALS:  # self-join pairs are minute-scale at N=4
            ka = knn_stage(probe_n, kidx_n, N)
            kb = knn_stage(probe_n4, kidx_n4, N4 * 2)
            knn_n.append(ka)
            knn_n4.append(kb)
            knn_ratios.append(ka / kb)
    def _median(xs):
        ss = sorted(xs)
        m = len(ss) // 2
        # true median: even-length lists average the middle two (taking
        # ss[m] alone would report the HIGHER of two pairs as "median")
        return ss[m] if len(ss) % 2 else (ss[m - 1] + ss[m]) / 2

    eff = _median(ratios) / 4
    knn_eff = _median(knn_ratios) / 4
    t_n, t_n4 = min(times_n), min(times_n4)
    tk_n, tk_n4 = min(knn_n), min(knn_n4)
    dps_n, dps_n4 = n_docs / t_n, n_docs / t_n4
    spark.stop()

    md = f"""

## Single-session interleaved measurement (noise-robust, authoritative)

Separate-JVM level runs proved hostage to hypervisor drift (3-5x swings);
this measurement runs both levels interleaved in ONE local[{N4}] session,
emulating the N-core level with an {N}-partition stage (tasks are the unit
of parallelism).  Efficiency = MEDIAN of per-pair speedups / 4 (each N
trial is paired with the 4N trial run immediately after it, so host drift
cancels pairwise); {TRIALS} pairs:

| stage | level | parallel tasks | best sec | docs/sec | points/sec |
|---|---|---|---|---|---|
| pip+tile | N  | {N}  | {t_n:.2f} | {dps_n:.1f} | {n_points / t_n:,.0f} |
| pip+tile | 4N | {N4} | {t_n4:.2f} | {dps_n4:.1f} | {n_points / t_n4:,.0f} |
| knn_self (distributed planner, ~100k probes) | N  | {N}  | {tk_n:.2f} | — | {n_points / tk_n:,.0f} |
| knn_self (distributed planner, ~100k probes) | 4N | {N4} | {tk_n4:.2f} | — | {n_points / tk_n4:,.0f} |

**scaling_efficiency (single-session, median-of-pairs) = {eff:.3f}**
(knn_self stage: median-of-pairs efficiency {knn_eff:.3f} over the corpus-sized candidate-join term — the r4 harness paired a 50-query probe whose fixed planning cost dominated)

Trials pip+tile: N={[round(t, 2) for t in times_n]},
4N={[round(t, 2) for t in times_n4]} (s);
per-pair speedups {[round(r, 2) for r in ratios]}.
Trials knn_self: N={[round(t, 2) for t in knn_n]},
4N={[round(t, 2) for t in knn_n4]} (s);
per-pair speedups {[round(r, 2) for r in knn_ratios]}.
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "## Single-session interleaved measurement"
    with open(path) as f:
        cur = f.read()
    if marker in cur:  # replace the previous section, keep what follows it
        head = cur[:cur.index(marker)].rstrip() + "\n"
        tail_ix = cur.find("\n## ", cur.index(marker) + 1)
        tail = cur[tail_ix:] if tail_ix != -1 else ""
        cur = head + md + tail
    else:
        cur = cur + md
    with open(path, "w") as f:
        f.write(cur)
    print(json.dumps({"eff_single_session": round(eff, 3),
                      "knn_eff": round(knn_eff, 3),
                      "t_n": round(t_n, 2), "t_n4": round(t_n4, 2),
                      "knn_t_n": round(tk_n, 2),
                      "knn_t_n4": round(tk_n4, 2)}))


if __name__ == "__main__":
    main()
