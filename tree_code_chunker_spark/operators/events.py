"""Event-sequence analytics: as-of join, funnel analysis, rolling windows.

The temporal operators a training-data / telemetry pipeline runs over an
event log, each built on the one-shuffle-per-key window algebra Spark
executes well at scale:

- ``asof_join``: for every left row, the latest right row at-or-before
  (or strictly before) the left timestamp per key — the classic operator
  Spark's join syntax lacks.  Implemented as a UNION + ignore-nulls window
  ("union-tag" asof), NOT a join: both sides are tagged, unioned, and
  sorted once per key; ``last(payload, ignorenulls=True)`` over the
  unbounded-preceding frame carries the most recent right payload onto
  each left row.  ONE shuffle on the key, zero joins, no per-key driver
  loops, and no range-explosion — the shape that survives 10^12 rows
  (a range join would; a per-key collect would melt the driver).
- ``funnel``: ordered-step conversion (step_i must occur at-or-after
  step_{i-1}, all within a horizon of step_0).  One aggregate + one
  key-equi-join per step — K small shuffles for a K-step funnel, each
  join's build side a per-key aggregate (≤ one row per key), so AQE
  broadcasts it when small.
- ``rolling_time_agg``: trailing time-range aggregates (count/sum/avg of
  a value over the last ``window_us`` microseconds per key) via a RANGE
  window frame.  Sums accumulate in DECIMAL so the result is independent
  of partition / combine order; the single cast to double at the end is
  correctly rounded and therefore bit-stable across engines.

All timestamps are epoch microseconds (bigint) — integer-exact, timezone-
free, and directly mirrorable in the DuckDB oracle (``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_LEFT_TAG = 1


def _ts_us(df: DataFrame, col: str):
    """Column as epoch microseconds.  Timestamps go through unix_micros —
    a bare cast("long") on a timestamp yields SECONDS in Spark, which would
    silently disagree with the DuckDB oracle's epoch_us."""
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    # TIMESTAMP_NTZ (the parquet default) must hop through TIMESTAMP for
    # unix_micros; run with session tz UTC so the hop is the identity wall
    # clock (the _utc(...) contract shared with the DuckDB epoch_us oracle).
    return (F.unix_micros(c.cast("timestamp")) if dt.startswith("timestamp")
            else c.cast("long"))


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              tolerance_us: int | None = None,
              strict: bool = False,
              right_prefix: str = "r_") -> DataFrame:
    """Left as-of join: each left row picks the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) sharing the ``on`` keys.

    Output = all left columns + every non-key right column as
    ``{right_prefix}{col}`` (NULL when no right row qualifies — left-join
    semantics).  ``tolerance_us`` additionally requires
    ``left_ts - right_ts <= tolerance_us``.

    Tie rules, all deterministic:
    - right row exactly at ``left_ts``: matches unless ``strict``;
    - several right rows at the same (key, ts): the one with the greatest
      payload struct (lexicographic over the right columns in their
      DataFrame order) wins — a total order, so the result never depends
      on partitioning.

    Scale shape: one exchange hash-partitioned on ``on`` + one sort per
    partition; the window is ``rows unbounded preceding → current``, which
    Spark evaluates streaming (running last), so memory per task is O(1)
    beyond the sort.  No join node exists in the plan.
    """
    r_payload_cols = [c for c in right.columns if c not in on]
    if not r_payload_cols:
        raise ValueError("right side must carry at least one non-key column")
    # Tag order at equal ts decides inclusivity: right rows sort BEFORE the
    # left row for the inclusive form (so last() sees them) and AFTER it for
    # the strict form (so the running last() cannot).
    r_tag = _LEFT_TAG + 1 if strict else _LEFT_TAG - 1
    r_struct = F.struct(*r_payload_cols,
                        _ts_us(right, right_ts).alias("_rts"))
    # shuffle only the NON-KEY left columns inside _l: the `on` columns
    # ride the union as the partition keys already, so duplicating them
    # in the payload struct just inflates the one exchange this operator
    # pays (r7, guide "project before the exchange"); the output
    # reconstructs them from the key columns, which for the surviving
    # (left-tagged) rows are exactly the left row's values
    l_slim_cols = [c for c in left.columns if c not in on] or left.columns
    l_struct = F.struct(*l_slim_cols)
    l_side = left.select(
        *[F.col(c) for c in on],
        _ts_us(left, left_ts).alias("_ts"),
        F.lit(_LEFT_TAG).alias("_tag"),
        l_struct.alias("_l"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_side = right.select(
        *[F.col(c) for c in on],
        _ts_us(right, right_ts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        F.lit(None).cast(
            left.select(l_struct.alias("_l")).schema["_l"].dataType
        ).alias("_l"),
        r_struct.alias("_r"),
    )
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_ts"), F.col("_tag"), F.col("_r"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # materialize the running-last once, THEN apply tolerance on the column
    # — referencing the window expr twice would make Spark evaluate two
    # identical window aggregates
    matched = F.col("_m0")
    if tolerance_us is not None:
        matched = F.when(
            F.col("_ts") - matched["_rts"] <= F.lit(int(tolerance_us)),
            matched)
    out = (
        l_side.unionByName(r_side)
        .withColumn("_m0", F.last("_r", ignorenulls=True).over(w))
        .withColumn("_m", matched)
        .filter(F.col("_tag") == _LEFT_TAG)
        .select(
            *[(F.col("_l")[c] if c in l_slim_cols else F.col(c)).alias(c)
              for c in left.columns],
            *[F.col("_m")[c].alias(f"{right_prefix}{c}")
              for c in r_payload_cols],
            F.col("_m")["_rts"].alias(f"{right_prefix}{right_ts}_us"),
        )
    )
    return out


def funnel(events: DataFrame, key: str, ts: str, step_col: str,
           steps: list[str], horizon_us: int) -> DataFrame:
    """Ordered-funnel conversion times per key.

    For each key: ``t0`` = earliest event of ``steps[0]``; ``t_i`` =
    earliest event of ``steps[i]`` at-or-after ``t_{i-1}`` and within
    ``horizon_us`` of ``t0``.  Output: one row per distinct key with
    ``t0_us .. t{K-1}_us`` (NULL once the funnel breaks) and ``depth`` =
    number of completed steps.  Greedy-earliest matching — the standard
    funnel semantics (a later step-0 event is never reconsidered).

    Scale shape: step 0 is one hash aggregate; each later step is one
    equi-join of the (filtered) event log against a ≤-one-row-per-key
    aggregate plus another hash aggregate — K shuffles total, every join
    AQE-broadcastable when the reached-key set is small.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    ev = events.select(F.col(key).alias("k"),
                       _ts_us(events, ts).alias("ts_us"),
                       F.col(step_col).alias("step"))
    base = ev.select("k").distinct()
    reached = (ev.filter(F.col("step") == steps[0])
               .groupBy("k").agg(F.min("ts_us").alias("t0_us")))
    out = base.join(reached, ["k"], "left")
    deadline = reached.select(
        "k", (F.col("t0_us") + F.lit(int(horizon_us))).alias("_dl"),
        F.col("t0_us").alias("_prev"))
    for i, s in enumerate(steps[1:], start=1):
        nxt = (ev.filter(F.col("step") == s)
               .join(deadline, ["k"])
               .filter((F.col("ts_us") >= F.col("_prev"))
                       & (F.col("ts_us") <= F.col("_dl")))
               .groupBy("k").agg(F.min("ts_us").alias(f"t{i}_us")))
        out = out.join(nxt, ["k"], "left")
        deadline = (deadline.join(nxt, ["k"])
                    .select("k", "_dl", F.col(f"t{i}_us").alias("_prev")))
    depth = sum((F.col(f"t{i}_us").isNotNull().cast("int")
                 for i in range(len(steps))), F.lit(0))
    return out.select(F.col("k").alias(key),
                      *[f"t{i}_us" for i in range(len(steps))],
                      depth.alias("depth"))


def rolling_time_agg(events: DataFrame, key: str, ts: str, value: str,
                     window_us: int, id_cols: list[str] | None = None,
                     round_dp: int = 6) -> DataFrame:
    """Per-event trailing-window aggregates: for every event, the count /
    sum / mean of ``value`` over all events of the same key in
    ``[ts - window_us, ts]`` (RANGE frame — equal-timestamp peers are all
    included, on both engines).

    ``value`` is accumulated as DECIMAL(28,6): decimal addition is exact
    and associative, so ``sum_w`` never depends on partition or combine
    order; the final cast to double (and the sum/count division) are
    single correctly-rounded IEEE ops, identical across engines.

    One shuffle on the key; the RANGE frame is evaluated with a sliding
    two-pointer pass per partition — O(n) beyond the sort.
    """
    id_cols = id_cols or []
    w = (Window.partitionBy(key)
         .orderBy(F.col("_ts_us"))
         .rangeBetween(-int(window_us), 0))
    dec = F.col(value).cast("decimal(28,6)")
    base = events.select(
        *id_cols, F.col(key), _ts_us(events, ts).alias("_ts_us"),
        dec.alias("_v"))
    return (base
            .withColumn("n_w", F.count("_v").over(w))
            .withColumn("_sum_dec", F.sum("_v").over(w))
            .select(
                *id_cols, F.col(key), F.col("_ts_us").alias("ts_us"),
                "n_w",
                F.round(F.col("_sum_dec").cast("double"), round_dp)
                 .alias("sum_w"),
                F.round((F.col("_sum_dec").cast("double") / F.col("n_w")),
                        round_dp).alias("avg_w"),
            ))


def retention_matrix(events: DataFrame, key: str, ts: str, step_col: str,
                     anchor: str, max_offset_days: int = 30) -> DataFrame:
    """Cohort retention: users grouped by the DAY of their first ``anchor``
    event; for each (cohort_day, day_offset) the number of distinct users
    with ANY event exactly ``day_offset`` days after their cohort day
    (offset 0 = the cohort day itself; pre-anchor activity is excluded,
    offsets beyond ``max_offset_days`` are dropped).

    Days are epoch-microsecond integer divisions (``div``) — integer-exact,
    timezone-free, identical in the DuckDB mirror (``//``).

    Scale shape: one hash aggregate for the anchor (min ts per user), one
    key-equi-join of the event log against that ≤-one-row-per-user frame
    (AQE-broadcastable), one final hash aggregate with a count(distinct) —
    at extreme cardinality swap for approx_count_distinct; the exact form
    is the oracle-checked default.
    """
    day_us = 86_400_000_000
    ev = events.select(F.col(key).alias("k"),
                       _ts_us(events, ts).alias("ts_us"),
                       F.col(step_col).alias("step"))
    cohort = (ev.filter(F.col("step") == anchor)
              .groupBy("k")
              .agg(F.expr(f"min(ts_us) div {day_us}").alias("cohort_day")))
    return (ev.join(cohort, ["k"])
            .select("k", "cohort_day",
                    (F.expr(f"ts_us div {day_us}")
                     - F.col("cohort_day")).alias("day_offset"))
            .filter((F.col("day_offset") >= 0)
                    & (F.col("day_offset") <= max_offset_days))
            .groupBy("cohort_day", "day_offset")
            .agg(F.count_distinct("k").alias("n_users")))


def ohlc_bars(events: DataFrame, key: str, ts: str, value: str,
              bar_us: int, id_col: str | None = None,
              round_dp: int = 6) -> DataFrame:
    """Downsample a value series into fixed ``bar_us`` bars per key:
    (key, bar_start_us, n, open, high, low, close, sum_v).

    open/close are the values at the first/last event of the bar under
    the total order (ts, id_col, value) — min/max over a STRUCT, so ties
    (equal timestamps, even equal ids) resolve identically on any
    partitioning and in the DuckDB mirror (both engines compare structs
    field-by-field in declaration order).  Values aggregate as
    DECIMAL(28,6) (exact, order-independent); the output casts to double
    once (correctly rounded).

    ONE hash aggregate — the classic map-side-combinable shape: partial
    min/max/sum per partition, tiny merge.
    """
    tie = F.col(id_col).cast("long") if id_col else F.lit(0)
    base = events.select(
        F.col(key), _ts_us(events, ts).alias("_t"), tie.alias("_i"),
        F.col(value).cast("decimal(28,6)").alias("_v"))
    pick = F.struct(F.col("_t").alias("t"), F.col("_i").alias("i"),
                    F.col("_v").alias("v"))
    as_dbl = lambda c: F.round(c.cast("double"), round_dp)  # noqa: E731
    return (base
            .groupBy(F.col(key),
                     F.expr(f"_t div {int(bar_us)}").alias("_bar"))
            .agg(F.count("*").alias("n"),
                 F.min(pick).alias("_first"),
                 F.max(pick).alias("_last"),
                 F.max("_v").alias("_high"),
                 F.min("_v").alias("_low"),
                 F.sum("_v").alias("_sum"))
            .select(F.col(key),
                    (F.col("_bar") * int(bar_us)).alias("bar_start_us"),
                    "n",
                    as_dbl(F.col("_first")["v"]).alias("open"),
                    as_dbl(F.col("_high")).alias("high"),
                    as_dbl(F.col("_low")).alias("low"),
                    as_dbl(F.col("_last")["v"]).alias("close"),
                    as_dbl(F.col("_sum")).alias("sum_v")))


def time_weighted_avg(events: DataFrame, key: str, ts: str, value: str,
                      id_col: str | None = None,
                      round_dp: int = 6) -> DataFrame:
    """Per-key time-weighted average: each observation holds its value
    until the next one (zero-order hold); the mean weights each value by
    its holding duration.  Keys with a single observation (or all
    observations at one instant) fall back to the plain decimal mean of
    their values — a zero total duration must not divide.

    Exactness: value × duration accumulates as DECIMAL × integer-us
    (exact, order-independent); the single final division is one
    correctly-rounded double op.  Segment attribution under equal
    timestamps follows the (ts, id) total order — durations of the
    intra-tie segments are zero, so the result is partition-invariant.

    ONE shuffle on the key (window lead + aggregate share the same
    partitioning — Catalyst reuses the exchange).
    """
    tie = F.col(id_col).cast("long") if id_col else F.lit(0)
    dec = F.col(value).cast("decimal(28,6)")
    base = events.select(F.col(key).alias("k"),
                         _ts_us(events, ts).alias("t"),
                         tie.alias("i"), dec.alias("v"))
    w = Window.partitionBy("k").orderBy("t", "i", "v")
    seg = base.withColumn("_dur", F.lead("t").over(w) - F.col("t"))
    out = (seg.groupBy("k")
           .agg(F.sum(F.col("v") * F.col("_dur")).alias("_num"),
                F.sum("_dur").alias("_den"),
                F.sum("v").alias("_vsum"),
                F.count("*").alias("n")))
    twa = F.when(
        F.col("_den") > 0,
        F.round(F.col("_num").cast("double") / F.col("_den"), round_dp)
    ).otherwise(
        F.round(F.col("_vsum").cast("double") / F.col("n"), round_dp))
    return out.select(F.col("k").alias(key), "n", twa.alias("twa"))


def resample_ffill(events: DataFrame, on: list[str], ts_col: str,
                   start: int, end: int, step: int) -> DataFrame:
    """Regular-grid resampling with forward fill (last observation
    carried forward): one output row per key per grid instant t in
    [start, end] stepping by `step` (integer time units), carrying the
    latest event at or before t — the telemetry/feature-table staple
    that turns irregular events into a fixed-frequency training input.

    A thin composition over asof_join's zero-join union-tag plan: the
    grid (keys × sequence, generated as a JVM expression, never
    collected) is the probe side, so the whole operator is one exchange
    on the keys + one per-partition sort; no join node.  Grid instants
    before a key's first event carry NULLs (left-join semantics), and
    duplicate-timestamp events resolve by asof_join's payload-struct
    total order — deterministic at any parallelism.

    Output: on + t + every non-key event column as r_{col}
    (r_{ts_col} = the source event time, i.e. staleness = t - r_ts).
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if end < start:
        raise ValueError(f"end {end} < start {start}")
    if "t" in on or ts_col == "t":
        # withColumn("t") would silently overwrite the key column and
        # partition the as-of join on grid instants instead of keys
        raise ValueError(
            "a key or ts column named 't' collides with the grid column; "
            "rename it before resampling")
    grid = (events.select(*on).distinct()
            .withColumn("t", F.explode(F.expr(
                f"sequence(CAST({int(start)} AS BIGINT), "
                f"CAST({int(end)} AS BIGINT), "
                f"CAST({int(step)} AS BIGINT))"))))
    return asof_join(grid, events, on=on, left_ts="t", right_ts=ts_col)


def resample_interp(events: DataFrame, on: list[str], ts_col: str,
                    value_col: str, start: int, end: int,
                    step: int) -> DataFrame:
    """Regular-grid resampling with LINEAR interpolation: one output row
    per key per grid instant t in [start, end] stepping by `step`, the
    value interpolated between the latest event at-or-before t and the
    earliest event at-or-after t — the companion to resample_ffill for
    continuous signals (sensor readings, prices) where a step function
    misstates the value between observations.

    Boundary semantics: before a key's first event the value is NULL
    (nothing to anchor the left end); after the last event it holds the
    last value (ffill tail); a grid instant with an event exactly at t
    takes that event's value.  Duplicate (key, ts) events resolve like
    asof_join: the greatest value at that instant wins on BOTH anchors
    (a total order, so the result never depends on partitioning); with
    both anchors at the same ts (exact hit) the left anchor's value is
    used outright — no 0/0 division.

    Scale shape — the same zero-join union-tag plan as asof_join run in
    BOTH directions over ONE sort: events enter the union twice, once
    tagged before grid rows (feeding the running `last` = previous
    event) and once tagged after them (feeding the running `first` over
    the following frame = next event).  Spark evaluates both frames in a
    single WindowExec, so the whole operator is one exchange on the keys
    + one per-partition sort; no join node, O(1) memory beyond the sort.

    Output: on + t + v (interpolated double) + t_prev + t_next (NULL
    where no anchor exists on that side).
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if end < start:
        raise ValueError(f"end {end} < start {start}")
    if "t" in on or ts_col == "t":
        raise ValueError(
            "a key or ts column named 't' collides with the grid column; "
            "rename it before resampling")
    ts = _ts_us(events, ts_col)
    v = F.col(value_col).cast("double")
    ev = events.select(*on, ts.alias("_ts"), v.alias("_v"))
    # grid tag sits BETWEEN the two event copies: prev copies (tag 0)
    # sort before grid rows (tag 1) at equal ts, so an exact-hit event is
    # inside the preceding frame; next copies (tag 2) sort after, so the
    # same event is also inside the following frame.
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")
    prev_side = ev.select(*on, "_ts", F.lit(0).alias("_tag"),
                          F.struct(F.col("_v"), F.col("_ts").alias("_pts"))
                          .alias("_p"), null_d.alias("_nv"),
                          null_l.alias("_nts"))
    grid = (events.select(*on).distinct()
            .withColumn("t", F.explode(F.expr(
                f"sequence(CAST({int(start)} AS BIGINT), "
                f"CAST({int(end)} AS BIGINT), "
                f"CAST({int(step)} AS BIGINT))"))))
    p_type = prev_side.schema["_p"].dataType
    grid_side = grid.select(*on, F.col("t").alias("_ts"),
                            F.lit(1).alias("_tag"),
                            F.lit(None).cast(p_type).alias("_p"),
                            null_d.alias("_nv"), null_l.alias("_nts"))
    next_side = ev.select(*on, "_ts", F.lit(2).alias("_tag"),
                          F.lit(None).cast(p_type).alias("_p"),
                          F.col("_v").alias("_nv"),
                          F.col("_ts").alias("_nts"))
    # _p asc makes the running last() pick the GREATEST prev payload;
    # _nv desc makes the running first() pick the GREATEST next value —
    # the same greatest-wins tie rule on both anchors.
    order = [F.col("_ts"), F.col("_tag"), F.col("_p"), F.col("_nv").desc()]
    w_prev = (Window.partitionBy(*on).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy(*on).orderBy(*order)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    u = (prev_side.unionByName(grid_side).unionByName(next_side)
         .withColumn("_pm", F.last("_p", ignorenulls=True).over(w_prev))
         .withColumn("_nmv", F.first("_nv", ignorenulls=True).over(w_next))
         .withColumn("_nmt", F.first("_nts", ignorenulls=True).over(w_next))
         .filter(F.col("_tag") == 1))
    pv, pt = F.col("_pm")["_v"], F.col("_pm")["_pts"]
    nv, nt = F.col("_nmv"), F.col("_nmt")
    interp = (
        F.when(pt.isNull(), F.lit(None).cast("double"))
        .when(nt.isNull() | (nt == pt), pv)
        .otherwise(pv + (nv - pv) * (F.col("_ts") - pt).cast("double")
                   / (nt - pt).cast("double")))
    return u.select(*on, F.col("_ts").alias("t"), interp.alias("v"),
                    pt.alias("t_prev"), nt.alias("t_next"))


def rolling_zscore(events: DataFrame, key: str, ts: str, value: str,
                   window_us: int, k_sigma: float = 3.0,
                   min_points: int = 5,
                   id_cols: list[str] | None = None) -> DataFrame:
    """Trailing-window anomaly flags: for every event, the z-score of its
    value against the mean/std of the SAME key's STRICTLY EARLIER
    events in [ts - window_us, ts) — the point (and its equal-timestamp
    peers) is excluded from its own baseline, because a self-included
    z-score is capped at ~sqrt(n-1) no matter how wild the value is —
    flagged when |z| > k_sigma and the baseline holds >= min_points
    events.  The standard streaming data-quality / outlier screen.

    Numerics, deliberately: values are quantized to 6 dp and must lie
    in |v| < 1e9 (a wilder input RAISES with a clear message — an
    anomaly screen fed sentinel garbage like 9.9e15 should stop, not
    silently flag-or-crash downstream; pre-normalize readings outside
    the domain).  Within it, v scales to an exact integer of 1e-6
    units carried as decimal(38,0); sums, squares and the variance
    numerator n*s2 - s1^2 are all INTEGRAL-exact and order-independent —
    the naive double-precision E[x^2] - mean^2 loses to catastrophic
    cancellation exactly when the mean is large and the variance small
    (mean ~1e8, sd ~1e-3: double ulp ~ 1e1 swallows the variance and
    the spike never flags; reproduced and pinned by test).  Only the
    final /n^2, sqrt and z division are float.  Population variance;
    zero-variance or thin baselines yield z = NULL and never flag.
    Same scale shape as rolling_time_agg: one shuffle on the key,
    O(n) two-pointer RANGE frame.
    """
    if min_points < 1:
        raise ValueError(f"min_points must be >= 1, got {min_points}")
    if window_us < 1:
        # rangeBetween(0, -1) is an empty frame: every row would come
        # back n_w=0 / never-flag with no hint the window was mis-unit'd
        raise ValueError(f"window_us must be >= 1, got {window_us}")
    id_cols = id_cols or []
    w = (Window.partitionBy(key)
         .orderBy(F.col("_ts_us"))
         .rangeBetween(-int(window_us), -1))
    # integer micro-units: v quantized at 6dp scales to an exact
    # integer v_i = round(v * 1e6), carried as decimal(38,0) so sums,
    # squares and the variance numerator n*s2 - s1^2 are ALL integral-
    # exact (decimal(18,6) arithmetic loses here: Spark caps products
    # at precision 38 by trimming SCALE, which silently re-rounds s1^2
    # to 6dp and zeroes out small variances).  var is then exactly
    # var_int * 1e-12 / n^2, with only that normalization in double.
    vi = F.when(
        F.abs(F.col(value).cast("double")) < 1e9,
        F.round(F.col(value).cast("double") * 1e6, 0).cast("decimal(38,0)"),
    ).otherwise(F.raise_error(F.concat(
        F.lit("rolling_zscore domain is |v| < 1e9 (6dp); got "),
        F.col(value).cast("string"))))
    base = events.select(
        *id_cols, F.col(key), _ts_us(events, ts).alias("_ts_us"),
        F.col(value).cast("double").alias("v"), vi.alias("_vi"),
        (vi * vi).alias("_vi2"))
    n = F.count("_vi").over(w)
    s1 = F.sum("_vi").over(w)
    s2 = F.sum("_vi2").over(w)
    out = (base
           .withColumn("n_w", n)
           .withColumn("_s1", s1)
           .withColumn("_s2", s2))
    mean = (F.col("_s1").cast("double") / 1e6) / F.col("n_w")
    # exact integral difference — no cancellation by construction
    var_num = (F.col("_s2") * F.col("n_w")
               - F.col("_s1") * F.col("_s1"))
    var = (var_num.cast("double") * 1e-12)         / (F.col("n_w") * F.col("n_w"))
    z = F.when(var > 0, (F.col("v") - mean) / F.sqrt(var))
    return (out
            .withColumn("mean_w", mean)
            .withColumn("z", z)
            .withColumn(
                "is_anomaly",
                F.coalesce((F.abs(F.col("z")) > F.lit(float(k_sigma)))
                           & (F.col("n_w") >= F.lit(int(min_points))),
                           F.lit(False)))
            .select(*id_cols, F.col(key), F.col("_ts_us").alias("ts_us"),
                    "v", "n_w", "mean_w", "z", "is_anomaly"))
