"""BM25 keyword search: inverted-index scoring + top-k per query.

The retrieval staple of a training-data pipeline (quality filtering by
query relevance, eval-set mining, corpus search).  Okapi BM25 with the
standard (k1, b) shape and the +1 idf form (always positive):

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(q, d) = sum_t idf(t) * tf_td*(k1+1) / (tf_td + k1*(1-b+b*dl/avgdl))

Query terms are deduplicated (standard for short keyword queries).

Cross-engine exactness strategy (the DuckDB oracle must hash-match):
tf / df / dl / N are integer-exact; avgdl and every per-term arithmetic
step are single correctly-rounded IEEE double ops, hence bit-identical
across engines given identical inputs.  The two guarded spots:
- ln() is the one non-correctly-rounded op (≤1 ulp both engines): idf is
  rounded to 9 dp immediately, so both engines proceed from the same
  number unless a value sits within an ulp of a rounding boundary
  (~1e-9 probability per distinct term — negligible, and documented).
- the per-document score is a SUM of per-term doubles, whose low bits
  would depend on Spark's partition/combine order: each per-term score is
  rounded to 6 dp and cast to DECIMAL(18,6) first, so the aggregate is
  exact and order-independent, and the top-k ranking (score DESC, doc_id
  ASC) is a total order identical on both engines.

Scale shape: tokenize+explode is one narrow pass; tf and df are hash
aggregates; the query-term set is broadcast (it is tiny by construction);
one hash aggregate on (query_id, doc_id); the final top-k is a
row_number window WITH the map-side WindowGroupLimit below the exchange,
so only ~topk rows per query per partition ever shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

IDF_DP = 9
SCORE_DP = 6


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    tok = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term")
    return (docs.select(F.col(id_col).alias("doc_id"), tok)
            .filter(F.col("term") != ""))


def bm25_topk(docs: DataFrame, id_col: str, text_col: str,
              queries: list[tuple[int, str]], topk: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``topk`` documents per query by BM25, deterministic ties.

    ``queries``: [(query_id, query_text)] — a small literal list (it is
    broadcast; for a query *table*, swap the lit-DataFrame for it).
    Output: (query_id, doc_id, rank, score) with rank 1-based by
    (score DESC, doc_id ASC) on the exact decimal score.
    """
    spark = docs.sparkSession
    tf = (_doc_terms(docs, id_col, text_col)
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # N / avgdl over docs that have at least one token (== dl's rows),
    # mirrored identically in the oracle
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dft"))

    qterms = spark.createDataFrame(
        queries, "query_id long, qtext string").select(
        "query_id",
        F.explode(F.split(F.lower("qtext"), r"\s+")).alias("term")
    ).filter(F.col("term") != "").distinct()

    idf = F.round(
        F.log(F.lit(1.0)
              + (F.col("n_docs") - F.col("dft") + F.lit(0.5))
              / (F.col("dft") + F.lit(0.5))), IDF_DP).alias("idf")
    q_idf = (F.broadcast(qterms)
             .join(dfreq, ["term"])          # terms absent from corpus drop
             .crossJoin(F.broadcast(stats))
             .select("query_id", "term", idf, "avgdl"))

    score_t = (F.col("idf")
               * (F.col("tf") * F.lit(k1 + 1.0))
               / (F.col("tf")
                  + F.lit(k1) * (F.lit(1.0 - b)
                                 + F.lit(b) * F.col("dl") / F.col("avgdl"))))
    per_term = (tf.join(F.broadcast(q_idf), ["term"])
                .join(dl, ["doc_id"])
                .select("query_id", "doc_id",
                        F.round(score_t, SCORE_DP)
                        .cast("decimal(18,6)").alias("s")))
    scored = (per_term.groupBy("query_id", "doc_id")
              .agg(F.sum("s").alias("score_dec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("query_id", "doc_id", "rank",
                    F.col("score_dec").cast("double").alias("score")))


def bm25_topk_sql(table: str, id_col: str, text_col: str,
                  queries: list[tuple[int, str]], topk: int = 10,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB mirror of bm25_topk (same rounding/decimal discipline)."""
    qvals = ", ".join(
        f"({qid}, '{qt}')" for qid, qt in queries)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(string_split_regex(lower({text_col}), '\\s+')) AS term
  FROM {table}
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
  WHERE term <> '' GROUP BY 1, 2
), dl AS (
  SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1
), stats AS (
  SELECT count(*)::BIGINT AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS dft FROM tf GROUP BY 1
), q(query_id, qtext) AS (
  VALUES {qvals}
), qterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id,
           unnest(string_split_regex(lower(qtext), '\\s+')) AS term
    FROM q) WHERE term <> ''
), q_idf AS (
  SELECT query_id, term,
         round(ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5)),
               {IDF_DP}) AS idf,
         avgdl
  FROM qterms JOIN dfreq USING (term) CROSS JOIN stats
), per_term AS (
  SELECT query_id, tf.doc_id,
         CAST(round(idf * (tf * {k1 + 1.0!r})
                    / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)),
                    {SCORE_DP}) AS DECIMAL(18,6)) AS s
  FROM tf JOIN q_idf USING (term) JOIN dl USING (doc_id)
), scored AS (
  SELECT query_id, doc_id, sum(s) AS score_dec FROM per_term GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_dec DESC, doc_id) AS rank,
         CAST(score_dec AS DOUBLE) AS score
  FROM scored
)
SELECT query_id, doc_id, rank, score FROM ranked WHERE rank <= {topk}
"""
