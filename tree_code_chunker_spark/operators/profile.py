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


def corr_matrix(df: DataFrame, cols: list[str],
                dec: str = "decimal(12,2)") -> DataFrame:
    """Pearson correlation for every unordered column pair, computed from
    EXACT moment sums: each value is cast to ``dec`` (pick a precision
    that represents the data exactly — default 2dp), so sums / products /
    sums-of-products are exact decimals independent of partition order;
    rows with a NULL in either column of a pair are excluded pairwise.

    corr = (n*sxy - sx*sy) / sqrt((n*sx2 - sx^2) * (n*sy2 - sy^2)),
    evaluated in doubles from the exact decimal moments in a fixed
    operation order — every step a single correctly-rounded IEEE op, so
    the DuckDB mirror is bit-identical before the final 6dp round.
    Constant columns (zero variance) yield NULL-free sentinel corr = 0.

    ONE groupBy-less aggregate pass over the table (Catalyst fuses all
    per-pair moment expressions into one partial agg), pivoted driver-
    side over the PAIR LIST — the column_profile scale shape.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast(dec)
        y = F.col(b).cast(dec)
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        x = F.when(both, x)
        y = F.when(both, y)
        tag = f"{a}__{b}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"{tag}__n"),
            F.sum(x).alias(f"{tag}__sx"),
            F.sum(y).alias(f"{tag}__sy"),
            F.sum(x * y).alias(f"{tag}__sxy"),
            F.sum(x * x).alias(f"{tag}__sx2"),
            F.sum(y * y).alias(f"{tag}__sy2"),
        ]
    wide = df.agg(*aggs)
    parts = []
    for a, b in pairs:
        t = f"{a}__{b}"
        n = F.col(f"{t}__n").cast("double")
        sx = F.col(f"{t}__sx").cast("double")
        sy = F.col(f"{t}__sy").cast("double")
        sxy = F.col(f"{t}__sxy").cast("double")
        sx2 = F.col(f"{t}__sx2").cast("double")
        sy2 = F.col(f"{t}__sy2").cast("double")
        vx = n * sx2 - sx * sx
        vy = n * sy2 - sy * sy
        corr = F.when((vx > 0) & (vy > 0),
                      F.round((n * sxy - sx * sy)
                              / F.sqrt(vx * vy), ROUND)).otherwise(F.lit(0.0))
        parts.append(F.struct(
            F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
            F.col(f"{t}__n").alias("n"), corr.alias("corr")))
    return (wide.select(F.explode(F.array(*parts)).alias("_p"))
            .select("_p.col_x", "_p.col_y", "_p.n", "_p.corr"))


def corr_matrix_sql(table: str, cols: list[str],
                    dec: str = "DECIMAL(12,2)") -> str:
    """DuckDB mirror of corr_matrix (same casts, same op order)."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    moment_sel = []
    for a, b in pairs:
        t = f"{a}__{b}"
        both = f"({a} IS NOT NULL AND {b} IS NOT NULL)"
        x = f"CASE WHEN {both} THEN CAST({a} AS {dec}) END"
        y = f"CASE WHEN {both} THEN CAST({b} AS {dec}) END"
        moment_sel += [
            f"count(CASE WHEN {both} THEN 1 END) AS {t}__n",
            f"sum({x}) AS {t}__sx", f"sum({y}) AS {t}__sy",
            f"sum(({x}) * ({y})) AS {t}__sxy",
            f"sum(({x}) * ({x})) AS {t}__sx2",
            f"sum(({y}) * ({y})) AS {t}__sy2",
        ]
    unions = []
    for a, b in pairs:
        t = f"{a}__{b}"
        n = f"CAST({t}__n AS DOUBLE)"
        sx, sy = f"CAST({t}__sx AS DOUBLE)", f"CAST({t}__sy AS DOUBLE)"
        sxy = f"CAST({t}__sxy AS DOUBLE)"
        sx2, sy2 = f"CAST({t}__sx2 AS DOUBLE)", f"CAST({t}__sy2 AS DOUBLE)"
        vx = f"({n} * {sx2} - {sx} * {sx})"
        vy = f"({n} * {sy2} - {sy} * {sy})"
        unions.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, {t}__n AS n, "
            f"CASE WHEN {vx} > 0 AND {vy} > 0 THEN "
            f"round(({n} * {sxy} - {sx} * {sy}) / sqrt({vx} * {vy}), "
            f"{ROUND}) ELSE 0.0 END AS corr FROM corr_moments")
    return (f"corr_moments AS (SELECT {', '.join(moment_sel)} "
            f"FROM {table})\n" + "\nUNION ALL\n".join(unions))


def group_quantiles_approx(df: DataFrame, key: str, value: str,
                           qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
                           accuracy: int = 10000) -> DataFrame:
    """The bounded-memory scale path for per-group quantiles: Spark's
    `percentile_approx` (Greenwald-Khanna sketch) instead of the exact
    rank interpolation — same call shape and output columns as
    group_quantiles, but per-group state is O(accuracy · log n) rather
    than every value, so groups with billions of rows cannot blow the
    aggregation buffer.

    Contract differences from the exact form, stated rather than hidden:
    the result is an ACTUAL element of the group (no interpolation), and
    its rank error is bounded by n/accuracy.  Mergeable partial sketches
    mean one shuffle on the key, map-side combine intact.
    """
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    # label p25 / p99 / p99_9: %g keeps sub-percent quantiles distinct
    # (int(q*100) would collide 0.99 and 0.999 into two "p99" columns)
    labels = [("p" + ("%g" % (q * 100)).replace(".", "_")) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile labels from qs={qs}")
    q_list = ", ".join(repr(float(q)) for q in qs)
    agg = df.groupBy(F.col(key).alias("key")).agg(
        F.count("*").alias("n"),
        F.round(F.avg(value), ROUND).alias("mean_v"),
        F.expr(f"percentile_approx({value}, array({q_list}), "
               f"{int(accuracy)})").alias("_ps"),
    )
    return agg.select(
        "key", "n", "mean_v",
        *[F.col("_ps")[i].alias(lab) for i, lab in enumerate(labels)],
    )


def skyline2d(df, x_col: str, y_col: str):
    """2-D skyline (Pareto frontier, minimize both): the DISTINCT (x, y)
    points not dominated by any other point, where b dominates a iff
    b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y) — the classic
    multi-criteria shortlist (cheapest-AND-closest) operator.

    Distributed exact plan (no single global window):
      1. distinct -> repartitionByRange on (x, y): partitions hold
         disjoint, ORDERED ranges (any boundary placement is correct —
         only the ordering between partitions matters);
      2. per-partition min(y) -> collected (one tiny row per partition,
         contract-small like the sampler's strata counts) -> exclusive
         prefix-min per partition broadcast back as a literal map;
      3. inside each partition a cumulative min(y) window over the
         (x, y) order, seeded with the prefix: a point survives iff its
         y is strictly below every y seen at strictly smaller (x, y) —
         which under this order is exactly non-domination for distinct
         points (same-x neighbors with smaller y dominate; equal points
         were collapsed by the distinct).
    One range shuffle + one bounded aggregate; the window never crosses
    partitions, so the frontier of a billion points runs at full width.
    """
    from pyspark.sql import Window, functions as F

    pts = (df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
           .distinct()
           .repartitionByRange("x", "y")
           .withColumn("_pid", F.spark_partition_id())
           # PIN the physical partitioning (r7, advisor finding): the
           # range boundaries come from reservoir sampling whose seed
           # changes per execution, so without materializing here the
           # mins collect below and the final evaluation could see
           # DIFFERENT partition contents/ids — a dominating point that
           # shifts across a boundary would be invisible to the window
           # and absent from the seed, silently leaving dominated points
           # in the skyline.  localCheckpoint freezes one partitioning
           # that both jobs then share.
           .localCheckpoint(eager=True))
    mins = {r._pid: r._my for r in
            pts.groupBy("_pid").agg(F.min("y").alias("_my")).collect()}
    prefix, run = {}, None
    for pid in sorted(mins):
        prefix[pid] = run
        run = mins[pid] if run is None else min(run, mins[pid])
    seed = F.create_map(*[
        F.lit(v) for pid, p in prefix.items() if p is not None
        for v in (pid, p)
    ]) if any(p is not None for p in prefix.values()) else None
    w = (Window.partitionBy("_pid").orderBy("x", "y")
         .rowsBetween(Window.unboundedPreceding, -1))
    local_min = F.min("y").over(w)
    before = (F.least(local_min, seed[F.col("_pid")])
              if seed is not None else local_min)
    return (pts.withColumn("_cm", before)
            .filter(F.col("_cm").isNull() | (F.col("y") < F.col("_cm")))
            .select("x", "y"))
