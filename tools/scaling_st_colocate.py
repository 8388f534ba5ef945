"""N-vs-4N scaling pair for the spatiotemporal co-location self-join.

Same noise-robust method as tools/scaling_single_session.py: both levels
interleaved in ONE local[4N] session (the N level emulated by an
N-partition input + N shuffle partitions; tasks are Spark's unit of
parallelism), adjacent-in-time pairs so host drift cancels per pair,
efficiency = median of per-pair speedups / 4.  Appends its section to
BENCH/BASELINE.md and prints one JSON line.
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
TRIALS = 3


def main():
    from tree_code_chunker_spark.operators.geo import derive_point_cols
    from tree_code_chunker_spark.operators.spatial import st_colocate_join
    from tree_code_chunker_spark.plans.session import get_spark
    from tree_code_chunker_spark.sources.adapter import spanify_exploded

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling-stcol", cores=N4, shuffle_partitions=N4 * 2)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = spanify_exploded(docs).select(
        "doc_id", F.col("span_pos").cast("long").alias("span_pos"))
    keys = base.crossJoin(
        spark.range(256).select(F.col("id").alias("rep"))
    ).select("doc_id",
             (F.col("span_pos") * 256 + F.col("rep")).alias("span_pos"))
    qlat, qlon = derive_point_cols(F.col("doc_id").cast("long"),
                                   F.col("span_pos"))
    pts = (keys.select("doc_id", "span_pos", qlat.alias("qlat"),
                       qlon.alias("qlon"))
           .filter(F.col("span_pos") % 8 == 0)
           .withColumn("t_s", (F.col("doc_id").cast("long") * 7919
                               + F.col("span_pos") * 131) % 86400))
    pts_n = pts.repartition(N).cache()
    pts_n4 = pts.repartition(N4 * 3).cache()
    n_pts = pts_n.count()
    pts_n4.count()

    def stage(p, parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.perf_counter()
        st_colocate_join(p, 16, 300).count()
        return time.perf_counter() - t0

    stage(pts_n4, N4 * 2)  # warm-up: codegen, broadcasts
    times_n, times_n4, ratios = [], [], []
    for _ in range(TRIALS):
        a = stage(pts_n, N)
        b = stage(pts_n4, N4 * 2)
        times_n.append(a)
        times_n4.append(b)
        ratios.append(a / b)
    spark.stop()

    ss = sorted(ratios)
    m = len(ss) // 2
    med = ss[m] if len(ss) % 2 else (ss[m - 1] + ss[m]) / 2
    eff = med / 4

    md = f"""

## st_colocate N-vs-4N pair (single-session interleaved, round 5)

Spatiotemporal co-location SELF-join (half-neighborhood form), 1.15M
points / ~9.2M pairs, radius 16 / dt 300 — the same method as the
headline table ({TRIALS} adjacent pairs, one local[{N4}] session,
shuffle partitions bound per level):

| level | tasks | best sec | points/sec |
|---|---|---|---|
| N  | {N}  | {min(times_n):.2f} | {n_pts / min(times_n):,.0f} |
| 4N | {N4} | {min(times_n4):.2f} | {n_pts / min(times_n4):,.0f} |

**st_colocate scaling efficiency (median of pairs) = {eff:.3f}**
(trials N={[round(t, 2) for t in times_n]},
4N={[round(t, 2) for t in times_n4]};
per-pair speedups {[round(r, 2) for r in ratios]})
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path) as f:
        cur = f.read()
    marker = "## st_colocate N-vs-4N pair"
    if marker in cur:
        head = cur[:cur.index(marker)].rstrip() + "\n"
        rest = cur[cur.index(marker):]
        nl = rest.find("\n## ", 4)
        tail = rest[nl:] if nl >= 0 else ""
        cur = head + tail
    with open(path, "w") as f:
        f.write(cur.rstrip() + md)
    print(json.dumps({"stage": "st_colocate", "eff": round(eff, 3),
                      "n_pts": n_pts,
                      "n_best": round(min(times_n), 2),
                      "n4_best": round(min(times_n4), 2)}))


if __name__ == "__main__":
    main()
