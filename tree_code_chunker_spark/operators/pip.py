"""Batched point-in-polygon (PIP) join.

Shape (SURVEY.md §2.4): candidate-prune by cell bucket + exact predicate —
the 2-D generalization of the reference's point-in-interval scope join
(scope.go:96-130: prune + deepest-wins exact test).

Physical plan, designed for 10^12 points x 10^3..10^5 polygons:
 1. **Cover**: polygon bbox -> all covering cells at coarse resolution
    `res` (distributed explode — no driver loop over polygons).
 2. **Prune**: candidates = points ⋈ cover on the res-r cell key.  The cover
    side is small (polygons x covering cells) => `F.broadcast` — no shuffle
    of the 10^12-row point side at all.
 3. **Exact**: integer ray-cast (even-odd rule, half-open edges) in an
    Arrow-batched pandas UDF over the candidate pairs, polygon vertex pack
    shipped as a Spark broadcast variable (numpy arrays, no per-row Python).

Determinism: polygons and points live on the integer grid (config.GRID_BITS);
the crossing test is integer cross-multiplication — no float division, so
results are bit-exact across partitionings and cluster sizes.

Edge convention (documented, engine == oracle): even-odd ray cast with the
half-open rule `(y1 > py) != (y2 > py)`; a point exactly ON a horizontal-ray
crossing toward +x counts via strict `<`.  Points on a polygon's lower/left
boundary are inside, upper/right are outside (consistent tie-break).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BooleanType

from ..config import GRID_BITS
from .geo import cell_at_res_col

DEFAULT_COVER_RES = 6


def polygon_cover(polygons: DataFrame, res: int = DEFAULT_COVER_RES) -> DataFrame:
    """(polygon_id, ring) -> (polygon_id, cov_cy, cov_cx) covering-cell rows.

    Covering = all res-`res` grid cells intersecting the bbox (conservative
    superset of the true polygon cover; exactness is restored by step 3).
    """
    shift = GRID_BITS - res
    v = F.explode("ring").alias("v")
    bbox = (
        polygons.select("polygon_id", v)
        .groupBy("polygon_id")
        .agg(
            F.min("v.qlat").alias("min_qlat"),
            F.max("v.qlat").alias("max_qlat"),
            F.min("v.qlon").alias("min_qlon"),
            F.max("v.qlon").alias("max_qlon"),
        )
    )
    return (
        bbox.select(
            "polygon_id",
            F.explode(
                F.sequence(
                    F.shiftright("min_qlat", shift),
                    F.shiftright("max_qlat", shift),
                )
            ).alias("cov_cy"),
            F.col("min_qlon"),
            F.col("max_qlon"),
        )
        .select(
            "polygon_id",
            "cov_cy",
            F.explode(
                F.sequence(
                    F.shiftright("min_qlon", shift),
                    F.shiftright("max_qlon", shift),
                )
            ).alias("cov_cx"),
        )
    )


def _collect_polygon_pack(polygons: DataFrame) -> dict:
    """polygon_id -> (ys, xs) closed-ring int64 numpy arrays (build side)."""
    pack = {}
    for row in polygons.select("polygon_id", "ring").collect():
        ys = np.array([v["qlat"] for v in row["ring"]], dtype=np.int64)
        xs = np.array([v["qlon"] for v in row["ring"]], dtype=np.int64)
        if len(ys) and (ys[0] != ys[-1] or xs[0] != xs[-1]):
            ys = np.append(ys, ys[0])
            xs = np.append(xs, xs[0])
        pack[row["polygon_id"]] = (ys, xs)
    return pack


def ray_cast_np(ys: np.ndarray, xs: np.ndarray, py: np.ndarray, px: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast, integer-exact.  ys/xs: closed ring."""
    inside = np.zeros(len(py), dtype=bool)
    for i in range(len(ys) - 1):
        y1, x1, y2, x2 = int(ys[i]), int(xs[i]), int(ys[i + 1]), int(xs[i + 1])
        straddles = (y1 > py) != (y2 > py)
        if not straddles.any():
            continue
        dy = y2 - y1
        lhs = (px - x1) * dy
        rhs = (py - y1) * (x2 - x1)
        crossing = straddles & ((lhs < rhs) if dy > 0 else (lhs > rhs))
        inside ^= crossing
    return inside


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = DEFAULT_COVER_RES,
    keep_cols: tuple[str, ...] = ("doc_id", "span_pos"),
) -> DataFrame:
    """points(qlat, qlon, cell, ...) x polygons(polygon_id, ring) -> matches.

    Returns one row per (point, containing polygon) with `keep_cols` +
    polygon_id + qlat/qlon.
    """
    spark = points.sparkSession
    pack = _collect_polygon_pack(polygons)
    bpack = spark.sparkContext.broadcast(pack)

    cover = polygon_cover(polygons, res)
    shift = GRID_BITS - res
    cand = points.join(
        F.broadcast(cover),
        (F.shiftright(points["qlat"], shift) == cover["cov_cy"])
        & (F.shiftright(points["qlon"], shift) == cover["cov_cx"]),
        "inner",
    )

    @F.pandas_udf(BooleanType())
    def pip_test(polygon_id: pd.Series, qlat: pd.Series, qlon: pd.Series) -> pd.Series:
        py = qlat.to_numpy(dtype=np.int64)
        px = qlon.to_numpy(dtype=np.int64)
        out = np.zeros(len(py), dtype=bool)
        pk = bpack.value
        for pid, grp in pd.Series(np.arange(len(py))).groupby(polygon_id.values):
            ys, xs = pk[pid]
            ix = grp.to_numpy()
            out[ix] = ray_cast_np(ys, xs, py[ix], px[ix])
        return pd.Series(out)

    return (
        cand.withColumn("inside", pip_test("polygon_id", "qlat", "qlon"))
        .filter("inside")
        .select(*keep_cols, "polygon_id", "qlat", "qlon")
    )
