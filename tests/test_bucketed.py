"""Bucketed tables: same-bucketing joins and aggregations must plan with
ZERO shuffle exchanges — the persisted co-location contract."""

import pyspark.sql.functions as F

from tree_code_chunker_spark.operators.checkpoint import write_bucketed


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark):
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("va"))
    b = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("vb"))
    write_bucketed(a, "bkt_a", ("k",), 8, sort_cols=("k",))
    write_bucketed(b, "bkt_b", ("k",), 8, sort_cols=("k",))
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
        j = ta.join(tb, "k")
        assert j.count() == 5_000
        p = _plan(j)
        assert "ShuffleExchange" not in p and "Exchange hashpartitioning" not in p
        # the same join on plain parquet-backed frames DOES shuffle
        p2 = _plan(a.join(b, "k"))
        assert "Exchange" in p2
        # bucket-key aggregation also elides its exchange
        agg = ta.groupBy("k").agg(F.sum("va").alias("s"))
        assert "Exchange" not in _plan(agg)
        assert agg.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_write_bucketed_validates(spark):
    import pytest
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "bkt_bad", ("k",), 0)
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(df, "bkt_bad", (), 4)
