"""Adapter: driver-provided flat `documents` table -> interleaved span shape.

The driver's documents table is flat ``(doc_id:int64, text, lang, source,
n_chars)`` (TESTDATA.md); BASELINE input_hint wants ``(doc_id:string,
spans:array<struct<kind,text,media_ref,offset>>)``.  The adapter groups the
whitespace-split words of `text` into spans of WORDS_PER_SPAN words — pure
column functions (split / transform / slice / filter), zero shuffle, fully
deterministic, and mirrored 1:1 by a DuckDB SQL string so oracle queries can
run over the same span rows.

Every Nth span (by doc) is turned into a media span deterministically
(kind='media', media_ref derived from doc_id+pos) to exercise the interleaved
text+media payload; the SQL mirror applies the same rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORDS_PER_SPAN = 8
MEDIA_EVERY = 5  # span positions ≡ MEDIA_EVERY-1 (mod MEDIA_EVERY) are media


def spanify(df: DataFrame, words_per_span: int = WORDS_PER_SPAN,
            media_every: int = MEDIA_EVERY) -> DataFrame:
    """flat documents -> (doc_id string, spans array<struct<...>>)."""
    w = F.split(F.col("text"), " ")
    n_spans = F.ceil(F.size(w) / F.lit(words_per_span)).cast("int")
    span_texts = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.concat_ws(
            " ", F.slice(w, i * words_per_span + 1, words_per_span)
        ),
    )
    spans = F.transform(
        span_texts,
        lambda t, i: F.when(
            (i % media_every) == media_every - 1,
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(
                    F.lit("ref://"), F.col("doc_id").cast("string"),
                    F.lit("/"), i.cast("string")
                ).alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).otherwise(
            F.struct(
                F.lit("text").alias("kind"),
                t.alias("text"),
                F.lit("").alias("media_ref"),
                i.cast("int").alias("offset"),
            )
        ),
    )
    return df.select(F.col("doc_id").cast("string").alias("doc_id"),
                     spans.alias("spans"))


def spanify_exploded(df: DataFrame, **kw) -> DataFrame:
    """Span rows: (doc_id, span_pos, kind, text, media_ref)."""
    s = spanify(df, **kw)
    return s.select(
        "doc_id", F.posexplode("spans").alias("span_pos", "span")
    ).select(
        "doc_id",
        "span_pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )


def spanify_sql(words_per_span: int = WORDS_PER_SPAN,
                media_every: int = MEDIA_EVERY) -> str:
    """DuckDB SQL producing the same rows as `spanify_exploded` over the
    pre-registered `documents` view.  Used as a CTE body by oracle queries.

    DuckDB parallel-unnest zips equal-length lists (standard trick), and list
    slicing is 1-based inclusive, clamped.
    """
    return f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           i AS span_pos,
           CASE WHEN (i % {media_every}) = {media_every - 1}
                THEN 'media' ELSE 'text' END AS kind,
           CASE WHEN (i % {media_every}) = {media_every - 1} THEN ''
                ELSE array_to_string(
                    ws[i*{words_per_span}+1 : i*{words_per_span}+{words_per_span}], ' ')
           END AS text,
           CASE WHEN (i % {media_every}) = {media_every - 1}
                THEN 'ref://' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
                ELSE '' END AS media_ref
    FROM (
      SELECT doc_id, ws,
             unnest(generate_series(0, n_spans - 1)) AS i
      FROM (
        SELECT doc_id, string_split(text, ' ') AS ws,
               CAST(ceil(len(string_split(text, ' ')) /
                         {words_per_span}.0) AS INT) AS n_spans
        FROM documents
      )
    )
    """
