"""Geofence dwell time: pip assignment + per-(id, polygon) visit split."""

import pyspark.sql.functions as F

from tree_code_chunker_spark.operators.spatial import dwell_time


def _square(spark, pid, y0, x0, side):
    ring = [(y0, x0), (y0, x0 + side), (y0 + side, x0 + side),
            (y0 + side, x0), (y0, x0)]
    return spark.createDataFrame(
        [(pid, [{"qlat": y, "qlon": x} for y, x in ring])],
        "polygon_id long, ring array<struct<qlat: long, qlon: long>>")


def test_dwell_visits_and_gaps(spark):
    polys = _square(spark, 1, 1000, 1000, 500).unionByName(
        _square(spark, 2, 5000, 5000, 500))
    rows = [
        # entity a: two visits to polygon 1 split by a > gap break,
        # interleaved with an out-of-zone ping (dropped by pip)
        ("a", 100, 1200, 1200), ("a", 400, 1250, 1210),
        ("a", 9000, 1100, 1100),          # gap 8600 > 1800 -> new visit
        ("a", 9400, 1120, 1130),
        ("a", 5000, 9999, 9999),          # outside both zones
        # entity a also pings zone 2 once (single-ping visit, dwell 0)
        ("a", 700, 5200, 5100),
        # entity b: one visit spanning the gap boundary exactly (1800 ok)
        ("b", 0, 1010, 1010), ("b", 1800, 1020, 1020),
    ]
    pts = spark.createDataFrame(
        rows, "doc_id string, t_s long, qlat long, qlon long")
    got = {(r.doc_id, r.polygon_id, r.visit):
           (r.t_enter, r.t_exit, r.n_pings, r.dwell_s)
           for r in dwell_time(pts, polys, gap_s=1800).collect()}
    # pip_join returns polygon_id as string (documented output schema)
    assert got == {
        ("a", "1", 0): (100, 400, 2, 300),
        ("a", "1", 1): (9000, 9400, 2, 400),
        ("a", "2", 0): (700, 700, 1, 0),
        ("b", "1", 0): (0, 1800, 2, 1800),
    }


def test_dwell_deterministic_and_tie_safe(spark):
    import random
    rng = random.Random(5)
    rows = [("e", rng.randrange(0, 50000) // 10 * 10,   # duplicate ts likely
             1000 + rng.randrange(500), 1000 + rng.randrange(500))
            for _ in range(300)]
    pts = spark.createDataFrame(
        rows, "doc_id string, t_s long, qlat long, qlon long")
    polys = _square(spark, 7, 1000, 1000, 500)
    outs = []
    for nparts in (1, 13):
        outs.append(sorted(map(tuple, dwell_time(
            pts.repartition(nparts), polys, gap_s=600).collect())))
    assert outs[0] == outs[1] and outs[0]
    # python brute force on the same pings
    ts = sorted(t for _, t, y, x in rows
                if 1000 <= y <= 1500 and 1000 <= x <= 1500)
    visits, cur = [], [ts[0]]
    for t in ts[1:]:
        if t - cur[-1] > 600:
            visits.append(cur)
            cur = [t]
        else:
            cur.append(t)
    visits.append(cur)
    want = [(v[0], v[-1], len(v), v[-1] - v[0]) for v in visits]
    got = [(r[3], r[4], r[5], r[6]) for r in outs[0]]
    assert got == want


def test_zonal_mode_majority_and_ties(spark):
    from tree_code_chunker_spark.operators.spatial import zonal_mode
    polys = _square(spark, 1, 1000, 1000, 500)
    rows = (
        [("x", 1100, 1100)] * 3 + [("y", 1200, 1200)] * 2
        + [("z", 9000, 9000)]            # outside
    )
    pts = spark.createDataFrame(
        [(v, y + i, x + i) for i, (v, y, x) in enumerate(rows)],
        "cat string, qlat long, qlon long")
    r = zonal_mode(pts, polys, value="cat").collect()
    assert len(r) == 1
    assert (r[0].mode_value, r[0].mode_count, r[0].n_points) == ("x", 3, 5)
    # exact tie 2-2: struct order breaks toward the larger value ("y")
    pts2 = spark.createDataFrame(
        [("x", 1100, 1100), ("x", 1101, 1101),
         ("y", 1200, 1200), ("y", 1201, 1201)],
        "cat string, qlat long, qlon long")
    r2 = zonal_mode(pts2, polys, value="cat").collect()[0]
    assert (r2.mode_value, r2.mode_count, r2.n_points) == ("y", 2, 4)


def test_group_quantiles_approx_rank_error_bound(spark):
    from tree_code_chunker_spark.operators.profile import (
        group_quantiles_approx,
    )
    import random
    rng = random.Random(11)
    rows = [("g%d" % (i % 3), float(rng.randrange(0, 100000)))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "k string, v double")
    qs = (0.25, 0.5, 0.9)
    out = group_quantiles_approx(df, "k", "v", qs, accuracy=10000).collect()
    by_key = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    assert len(out) == 3
    for r in out:
        vals = sorted(by_key[r.key])
        n = len(vals)
        assert r.n == n
        for q, col in zip(qs, ("p25", "p50", "p90")):
            got = getattr(r, col)
            assert got in by_key[r.key]          # an actual element
            # GK guarantee: |rank - q*n| <= n/accuracy (+1 slack for
            # boundary definitions)
            import bisect
            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = q * n
            err = min(abs(lo - target), abs(hi - target))
            assert err <= n / 10000 + 1, (r.key, q, got, err)
    import pytest
    with pytest.raises(ValueError, match="accuracy"):
        group_quantiles_approx(df, "k", "v", qs, accuracy=0)


def test_sample_weighted_k_mirror_and_contracts(spark):
    import math
    import pytest
    from tree_code_chunker_spark.operators.training import (
        POLY_MOD,
        sample_weighted_k,
    )
    from tree_code_chunker_spark.operators.training import _sample_key_col

    rows = [("d%03d" % i, float(1 + (i * 7) % 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, q double")
    # python mirror: same uniform key (read back from the shared column
    # expression so the formulas cannot drift), same 9dp-rounded es
    keys = {r.doc_id: r.k for r in df.select(
        "doc_id", _sample_key_col("doc_id", 42).alias("k")).collect()}
    es = {d: round(-math.log((keys[d] + 1.0) / (POLY_MOD + 1.0)) / q, 9)
          for d, q in rows}
    want = sorted(rows, key=lambda r: (es[r[0]], r[0]))[:25]
    got = [(r.doc_id, r.q) for r in
           sample_weighted_k(df, 25, "q").collect()]
    assert got == [(d, q) for d, q in want]
    # determinism across parallelism
    got2 = [(r.doc_id, r.q) for r in
            sample_weighted_k(df.repartition(9), 25, "q").collect()]
    assert got2 == got
    # a huge weight forces selection; k >= n returns everything
    df2 = df.withColumn("q", F.when(F.col("doc_id") == "d199",
                                    1e12).otherwise(F.col("q")))
    assert "d199" in {r.doc_id for r in
                      sample_weighted_k(df2, 5, "q").collect()}
    assert sample_weighted_k(df, 500, "q").count() == 200
    with pytest.raises(ValueError, match="k must"):
        sample_weighted_k(df, 0, "q")
    with pytest.raises(Exception, match="weights > 0"):
        sample_weighted_k(
            df.withColumn("q", F.lit(0.0)), 5, "q").collect()


def test_group_quantiles_approx_subpercent_labels(spark):
    from tree_code_chunker_spark.operators.profile import (
        group_quantiles_approx,
    )
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1000)], "k string, v double")
    out = group_quantiles_approx(df, "k", "v", qs=(0.99, 0.999))
    assert "p99" in out.columns and "p99_9" in out.columns
    r = out.collect()[0]
    assert r.p99 <= r.p99_9


def test_sample_weighted_k_by_groups(spark):
    from tree_code_chunker_spark.operators.training import (
        sample_weighted_k,
        sample_weighted_k_by,
    )
    rows = [("d%03d" % i, "g%d" % (i % 4), float(1 + (i * 7) % 10))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, q double")
    got = sample_weighted_k_by(df, ("grp",), 10, "q").collect()
    # exactly 10 per group, and each group's picks equal the global
    # operator applied to that group alone (same keys -> same winners)
    from collections import Counter
    assert Counter(r.grp for r in got) == {"g%d" % g: 10 for g in range(4)}
    for g in range(2):
        sub = df.filter(F.col("grp") == "g%d" % g)
        want = {r.doc_id for r in sample_weighted_k(sub, 10, "q").collect()}
        have = {r.doc_id for r in got if r.grp == "g%d" % g}
        assert have == want
    # tiny group returns whole
    tiny = df.filter(F.col("doc_id").isin("d000", "d001"))
    assert sample_weighted_k_by(tiny, ("grp",), 10, "q").count() == 2
    # WindowGroupLimit partial limit below the exchange
    plan = sample_weighted_k_by(df, ("grp",), 10, "q") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
