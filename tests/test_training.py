"""Training-data assembly operators: sequence packing + stratified sample."""

import pytest

from tree_code_chunker_spark.operators.training import (
    pack_sequences,
    sample_per_group,
)


def test_pack_sequences_prefix_semantics(spark):
    # single shard: docs 0..4 with token counts 300, 300, 300, 600, 100
    # cumsum: 300 600 900 1500 1600; seq = floor((cum-n)/512)
    #   doc0: (300-300)/512 = 0
    #   doc1: (600-300)/512 = 0   (overflows seq 0 by 88 tokens - allowed)
    #   doc2: (900-300)/512 = 1
    #   doc3: (1500-600)/512 = 1
    #   doc4: (1600-100)/512 = 2
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300), (3, 600), (4, 100)],
        "doc_id long, n_tokens long")
    rows = {r["id"]: (r["seq_id"], r["seq_pos"]) for r in
            pack_sequences(df, budget=512, n_shards=1).collect()}
    assert rows == {0: (0, 0), 1: (0, 1), 2: (1, 0), 3: (1, 1), 4: (2, 0)}


def test_pack_sequences_sharded_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, 50 + (i * 37) % 400) for i in range(200)],
        "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(
        df.repartition(3), budget=512, n_shards=4).collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(11), budget=512, n_shards=4).collect()))
    assert a == b and len(a) == 200
    # shards partition the id space by id % 4 and pack independently
    by_shard = {}
    for id_, shard, seq_id, seq_pos, n, cum in a:
        assert shard == id_ % 4
        by_shard.setdefault(shard, []).append((id_, seq_id, n, cum))
    for shard, docs in by_shard.items():
        docs.sort()
        run = 0
        for id_, seq_id, n, cum in docs:
            run += n
            assert cum == run  # cumsum is shard-local
            assert seq_id == (cum - n) // 512


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(0, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)


def test_sample_per_group_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(90)], "doc_id long, lang string")
    a = sorted((r["lang"], r["doc_id"]) for r in
               sample_per_group(df.repartition(2), "lang", 4).collect())
    b = sorted((r["lang"], r["doc_id"]) for r in
               sample_per_group(df.repartition(9), "lang", 4).collect())
    assert a == b
    from collections import Counter
    assert Counter(g for g, _ in a) == {"g0": 4, "g1": 4, "g2": 4}
    # different seed -> (almost surely) different sample
    c = sorted((r["lang"], r["doc_id"]) for r in
               sample_per_group(df, "lang", 4, seed=7).collect())
    assert c != a


def test_pack_greedy_strict_semantics(spark):
    # tokens 300,300,300,600,100 budget 512:
    #   doc0 -> seq0 (acc 300); doc1 would make 600 > 512 -> seq1 (300)
    #   doc2 -> 600 > 512 -> seq2 (300); doc3 600 > 512 alone -> seq3
    #   doc4 -> seq3? acc 600+100 > 512 -> seq4
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300), (3, 600), (4, 100)],
        "doc_id long, n_tokens long")
    rows = {r["id"]: (r["seq_id"], r["seq_pos"]) for r in
            pack_sequences(df, budget=512, n_shards=1,
                           method="greedy").collect()}
    assert rows == {0: (0, 0), 1: (1, 0), 2: (2, 0), 3: (3, 0), 4: (4, 0)}
    # budget 700: doc0+doc1 fit (600), doc2 -> 900 > 700 new seq, doc3
    # 300+600 > 700 new seq, doc4 600+100=700 fits with doc3
    rows = {r["id"]: r["seq_id"] for r in
            pack_sequences(df, budget=700, n_shards=1,
                           method="greedy").collect()}
    assert rows == {0: 0, 1: 0, 2: 1, 3: 2, 4: 2}


def test_pack_greedy_never_overflows_and_matches_scalar_fold(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    toks = [int(x) for x in rng.randint(1, 400, 300)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long")
    got = sorted((r["shard"], r["id"], r["seq_id"]) for r in
                 pack_sequences(df.repartition(7), budget=512, n_shards=4,
                                method="greedy").collect())
    # scalar reference fold per shard
    want = []
    for shard in range(4):
        ids = [i for i in range(300) if i % 4 == shard]
        seq, acc = 0, 0
        for i in ids:
            if acc + toks[i] <= 512:
                acc += toks[i]
            else:
                seq, acc = seq + 1, toks[i]
            want.append((shard, i, seq))
    assert got == sorted(want)
    # strict: no sequence of >1 doc exceeds the budget
    from collections import defaultdict
    per_seq = defaultdict(list)
    for shard, i, seq in want:
        per_seq[(shard, seq)].append(toks[i])
    assert all(sum(v) <= 512 or len(v) == 1 for v in per_seq.values())


def test_pack_rejects_bad_shards_and_method(spark):
    df = spark.createDataFrame([(0, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, n_shards=0)
    with pytest.raises(ValueError, match="method"):
        pack_sequences(df, method="prefx")


def test_pack_methods_share_output_schema(spark):
    df = spark.createDataFrame([(0, 10)], "doc_id int, n_tokens int")
    a = pack_sequences(df, method="prefix")
    b = pack_sequences(df, method="greedy")
    assert [f.dataType for f in a.schema] == [f.dataType for f in b.schema]


def test_column_profile_values_and_nulls(spark):
    from tree_code_chunker_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5), (2.0, None), (4.0, 7)],
        "a double, b int")
    got = {r["col_name"]: r.asDict() for r in
           column_profile(df, ["a", "b"]).collect()}
    assert got["a"]["n"] == 4 and got["a"]["n_null"] == 0
    assert got["a"]["n_distinct"] == 3
    assert (got["a"]["min_v"], got["a"]["max_v"]) == (1.0, 4.0)
    assert got["a"]["sum_v"] == 9.0 and got["a"]["avg_v"] == 2.25
    assert got["b"]["n"] == 2 and got["b"]["n_null"] == 2
    assert got["b"]["n_distinct"] == 2 and got["b"]["sum_v"] == 12.0
    # approx variant keeps the same shape
    approx = {r["col_name"]: r["n_distinct"] for r in
              column_profile(df, ["a"], exact_distinct=False).collect()}
    assert approx["a"] >= 2


def test_bpe_pair_counts_vs_python(spark):
    from collections import Counter

    from tree_code_chunker_spark.operators.textstats import bpe_pair_counts

    texts = ["the cat sat on the mat", "a abbb the  the", "x", "", "zz zz"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id bigint, text string")
    want = Counter()
    for t in texts:
        for w in t.split(" "):
            for a, b in zip(w, w[1:]):
                want[(a, b)] += 1
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    got = sorted((r.lhs, r.rhs, r.n_pairs, r.rank)
                 for r in bpe_pair_counts(df, top_k=10).collect())
    exp = sorted((a, b, n, i + 1)
                 for i, ((a, b), n) in enumerate(ranked[:10]))
    assert got == exp


def test_bpe_pair_counts_deterministic_across_partitioning(spark):
    from tree_code_chunker_spark.operators.textstats import bpe_pair_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, bpe_pair_counts(docs.repartition(3)).collect()))
    b = sorted(map(tuple, bpe_pair_counts(docs.repartition(13)).collect()))
    assert a == b and len(a) > 0


def test_sample_weighted_rate_and_determinism(spark):
    from pyspark.sql import functions as F

    from tree_code_chunker_spark.operators.training import sample_weighted

    # constant weight 0.3: keep rate converges to 0.3 (uniform key)
    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.3).alias("w"))
    kept = sample_weighted(df, "w").count()
    assert abs(kept / n - 0.3) < 0.03
    # weight 0 keeps nothing; weight 1 keeps everything
    assert sample_weighted(
        df.withColumn("w", F.lit(0.0)), "w").count() == 0
    assert sample_weighted(
        df.withColumn("w", F.lit(1.0)), "w").count() == n
    # deterministic across partitionings
    a = sorted(r.doc_id for r in sample_weighted(
        df.repartition(3), "w").collect())
    b = sorted(r.doc_id for r in sample_weighted(
        df.repartition(17), "w").collect())
    assert a == b


def test_mix_to_proportions(spark):
    """Target-mixture downsampling: exact per-group budgets, largest
    no-upsampling mixture, unlisted groups dropped, deterministic across
    partitionings."""
    import pytest
    from pyspark.sql import functions as F

    from tree_code_chunker_spark.operators.training import (
        mix_proportion_counts,
        mix_to_proportions,
    )

    rows = [(i, "a" if i % 10 < 6 else ("b" if i % 10 < 9 else "c"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    # counts: a=600, b=300, c=100; target 50/50 over (a, b):
    # T = min(600/.5, 300/.5) = 600 -> k = {a: 300, b: 300}
    out = mix_to_proportions(df, "grp", {"a": 0.5, "b": 0.5})
    got = {r["grp"]: r["cnt"] for r in
           out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"a": 300, "b": 300}
    # deterministic across partitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               mix_to_proportions(df.repartition(13), "grp",
                                  {"a": 0.5, "b": 0.5}).collect())
    assert a == b
    # guards
    with pytest.raises(ValueError, match="absent"):
        mix_proportion_counts({"a": 10}, {"a": 0.5, "zz": 0.5})
    with pytest.raises(ValueError, match="non-positive"):
        mix_proportion_counts({"a": 10}, {"a": 0.0})


def test_repetition_stats_hand_computed_and_oracle(spark):
    """Gopher-style repetition signals: hand-computed fractions on a tiny
    fixture, DuckDB mirror bit-equal, and short/empty docs emit nothing."""
    import duckdb

    from tree_code_chunker_spark.operators.textstats import (
        repetition_stats, repetition_stats_sql)

    fixture = [(1, "a b a b a"), (2, "x y z"), (3, "w w w w"),
               (4, "solo"), (5, "")]
    df = spark.createDataFrame(fixture, "doc_id long, text string")
    rows = [tuple(r) for r in
            repetition_stats(df).orderBy("doc_id", "n").collect()]
    # doc 1, n=2: grams (a b, b a, a b, b a) -> 4 total, 2 distinct,
    # dup_frac 0.5, top_frac 0.5; doc 3, n=2: (w w)x3 -> dup 2/3, top 1.
    assert rows[0] == (1, 2, 4, 2, 2, 0.5, 0.5)
    assert (3, 2, 3, 1, 2, 0.666667, 1.0) in rows
    # docs 4 ("solo") and 5 ("") have no 2-grams: absent entirely
    assert {r[0] for r in rows} == {1, 2, 3}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", fixture)
    duck = con.execute(repetition_stats_sql("t")
                       + " ORDER BY doc_id, n").fetchall()
    assert [tuple(r) for r in duck] == rows
