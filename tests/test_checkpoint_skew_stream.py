"""Checkpoint/resume, salted-join equivalence, and streaming sentinel —
Spark-side tests."""

import json
import os

from pyspark.sql import functions as F

from tree_code_chunker_spark.operators.checkpoint import (
    commit_stage,
    is_committed,
    pipeline_lineage,
    run_stage,
)
from tree_code_chunker_spark.operators.skew import salted_join, salted_repartition
from tree_code_chunker_spark.sources.datagen import gen_documents
from tree_code_chunker_spark.streaming.stream_chunk import run_stream_chunker


def test_checkpoint_commit_and_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return df

    out1 = run_stage(spark, root, "stage1", build)
    assert out1.count() == 100 and calls["n"] == 1
    assert is_committed(root, "stage1")
    # resume: build NOT invoked again
    out2 = run_stage(spark, root, "stage1", build)
    assert out2.count() == 100 and calls["n"] == 1
    lineage = pipeline_lineage(root)
    assert len(lineage) == 1
    m = lineage[0]
    assert m["n_rows"] == 100 and m["n_bytes"] > 0 and m["committed"]
    assert sum(p["n_rows"] for p in m["partitions"]) == 100


def test_checkpoint_uncommitted_recomputes(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    df = spark.range(10)
    commit_stage(df, root, "s")
    # sabotage the manifest -> must recompute
    os.remove(os.path.join(root, "s", "_manifest.json"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return df

    run_stage(spark, root, "s", build)
    assert calls["n"] == 1


def test_salted_join_matches_plain_join(spark):
    # skewed big side: key 0 has 5000 rows, others ~10
    big = spark.range(6000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dim")
    )
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", n_salts=8, threshold_rows=1000)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.select("k", "payload", "dim").collect()))
    assert a == b


def test_salted_repartition_preserves_rows(spark):
    df = spark.range(2000).select((F.col("id") % 3).alias("k"), "id")
    out = salted_repartition(df, "k", n_salts=4, threshold_rows=100)
    assert out.count() == 2000
    assert sorted(map(tuple, out.select("k", "id").collect())) == sorted(
        map(tuple, df.select("k", "id").collect())
    )


def test_streaming_chunker_availablenow(spark, tmp_path):
    docs = gen_documents(spark, 20, seed=7)
    in_path = str(tmp_path / "docs_in")
    docs.write.parquet(in_path)
    out_path = str(tmp_path / "chunks_out")
    ckpt = str(tmp_path / "stream_ckpt")
    q = run_stream_chunker(spark, in_path, out_path, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(out_path)
    assert out.count() > 0
    # streaming sentinel pinned (reference codechunk.go:284)
    assert out.select(F.collect_set("total_chunks")).first()[0] == [-1]
    # restart with no new data: no duplicate output (checkpoint resume)
    n1 = out.count()
    q2 = run_stream_chunker(spark, in_path, out_path, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_path).count() == n1
