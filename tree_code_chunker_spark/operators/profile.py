"""Column profiling: per-column stats in one aggregation pass.

The data-quality staple for pipeline inputs: one row per profiled column
with count / nulls / distinct / min / max / sum / mean.  All values are
computed in a SINGLE groupBy-less aggregate over the table (Catalyst fuses
the per-column expressions into one partial-agg scan), then pivoted to
rows driver-side — the pivot is over the COLUMN LIST (a handful of rows),
never the data.

`exact_distinct=True` uses count(DISTINCT ...) — one expand + shuffle per
column, exact and oracle-mirrorable (the driver gate path).  At corpus
scale flip it off to use approx_count_distinct (HLL, one pass, ~2% error);
the rest of the profile is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ROUND = 6


def column_profile(df: DataFrame, cols: list[str],
                   exact_distinct: bool = True) -> DataFrame:
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        col = F.col(c)
        distinct = (F.count_distinct(col) if exact_distinct
                    else F.approx_count_distinct(col))
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.isnull(col).cast("long")).alias(f"{c}__n_null"),
            distinct.alias(f"{c}__n_distinct"),
            F.round(F.min(col).cast("double"), ROUND).alias(f"{c}__min_v"),
            F.round(F.max(col).cast("double"), ROUND).alias(f"{c}__max_v"),
            # sum in DECIMAL(38,12), not double: decimal addition is exact
            # and associative, so the aggregate is independent of partition
            # / combine order — a double sum's low bits vary with
            # partitioning and can flip the 6dp rounding at large scale.
            # (double -> decimal(38,12) rounding can't tie: a tie needs the
            # value to equal n*1e-12 + 5e-13 exactly, which is not a dyadic
            # rational, so both engines round to the same nearest decimal.)
            F.sum(col.cast("decimal(38,12)")).alias(f"{c}__sum_dec"),
        ]
    wide = df.agg(*aggs)
    rows = wide.selectExpr(*[
        f"struct('{c}' AS col_name, `{c}__n` AS n, `{c}__n_null` AS n_null, "
        f"`{c}__n_distinct` AS n_distinct, `{c}__min_v` AS min_v, "
        f"`{c}__max_v` AS max_v, "
        f"round(CAST(`{c}__sum_dec` AS DOUBLE), {ROUND}) AS sum_v, "
        f"round(CAST(`{c}__sum_dec` AS DOUBLE) / `{c}__n`, {ROUND}) "
        f"AS avg_v) AS `{c}__s`"
        for c in cols
    ])
    stacked = rows.select(
        F.explode(F.array(*[F.col(f"`{c}__s`") for c in cols])).alias("s")
    )
    return stacked.select("s.*")


def column_profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB mirror: one SELECT per column UNION ALL'd (DuckDB fuses the
    scans; the mirror is for the gate, not the scale path)."""
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS col_name,
       count({c}) AS n,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       round(CAST(min({c}) AS DOUBLE), {ROUND}) AS min_v,
       round(CAST(max({c}) AS DOUBLE), {ROUND}) AS max_v,
       round(CAST(sum(CAST({c} AS DECIMAL(38,12))) AS DOUBLE), {ROUND})
         AS sum_v,
       round(CAST(sum(CAST({c} AS DECIMAL(38,12))) AS DOUBLE) / count({c}),
             {ROUND}) AS avg_v
FROM {table}""")
    return " UNION ALL ".join(parts)


def group_quantiles(df: DataFrame, key: str, value: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)) -> DataFrame:
    """Per-group exact interpolated quantiles + count/mean in ONE hash agg.

    Spark's `percentile` is the exact rank-interpolation definition (same as
    DuckDB quantile_cont / numpy linear), computed as a single aggregate —
    no window, no sort of the whole table, one shuffle on the key.  Rounded
    to 6dp so the float interpolation is oracle-stable.  For corpora where
    exact per-group sorting of values is too hot, swap `percentile` for
    `percentile_approx` (t-digest sketch) — same call shape.
    """
    # ONE percentile aggregate over an array of fractions: a single
    # per-group value buffer + sort, instead of one independent buffer per
    # quantile (percentile materializes every group value in its buffer)
    q_list = ", ".join(repr(float(q)) for q in qs)
    agg = df.groupBy(F.col(key).alias("key")).agg(
        F.count("*").alias("n"),
        F.round(F.avg(value), ROUND).alias("mean_v"),
        F.expr(f"percentile({value}, array({q_list}))").alias("_ps"),
    )
    return agg.select(
        "key", "n", "mean_v",
        *[F.round(F.col("_ps")[i], ROUND).alias(f"p{int(q * 100)}")
          for i, q in enumerate(qs)],
    )
