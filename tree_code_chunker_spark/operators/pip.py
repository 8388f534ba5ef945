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
 3. **Exact**: integer ray-cast (even-odd rule, half-open edges) as a JVM
    higher-order expression over an edge array carried on the broadcast
    cover rows — no Python, no Arrow transfer, no extra shuffle.

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
from pyspark.sql import DataFrame, functions as F

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


def _edges_col(ring):
    """ring array<struct<qlat,qlon>> (closed) -> array<struct<y1,x1,y2,x2>>."""
    return F.transform(
        F.sequence(F.lit(0), F.size(ring) - 2),
        lambda i: F.struct(
            F.element_at(ring, i + 1)["qlat"].alias("y1"),
            F.element_at(ring, i + 1)["qlon"].alias("x1"),
            F.element_at(ring, i + 2)["qlat"].alias("y2"),
            F.element_at(ring, i + 2)["qlon"].alias("x2"),
        ),
    )


def _inside_col(edges, py, px):
    """Even-odd ray cast as a JVM higher-order expression — integer cross-
    multiplication, bit-identical to ray_cast_np, zero Python in the plan."""
    def crossing(e):
        y1, x1, y2, x2 = e["y1"], e["x1"], e["y2"], e["x2"]
        straddles = (y1 > py) != (y2 > py)
        dy = y2 - y1
        lhs = (px - x1) * dy
        rhs = (py - y1) * (x2 - x1)
        return straddles & (
            F.when(dy > 0, lhs < rhs).otherwise(lhs > rhs)
        )

    return F.size(F.filter(edges, crossing)) % 2 == 1


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = DEFAULT_COVER_RES,
    keep_cols: tuple[str, ...] = ("doc_id", "span_pos"),
) -> DataFrame:
    """points(qlat, qlon, ...) x polygons(polygon_id, ring) -> matches.

    Returns one row per (point, containing polygon) with `keep_cols` +
    polygon_id + qlat/qlon.

    Physical plan: the broadcast cover rows CARRY the polygon's packed edge
    array, and the exact even-odd test runs as a JVM higher-order expression
    on the joined rows — the probe (point) side is never shuffled and never
    crosses into Python, so throughput scales linearly with cores.  (An
    earlier pandas-UDF ray-cast was Arrow-transfer-bound and did not scale;
    ray_cast_np remains as the numpy oracle used by tests.)
    """
    cover = polygon_cover(polygons, res)
    edges = polygons.select(
        "polygon_id", _edges_col(F.col("ring")).alias("edges")
    )
    cover_e = cover.join(edges, "polygon_id")
    shift = GRID_BITS - res
    cand = points.join(
        F.broadcast(cover_e),
        (F.shiftright(points["qlat"], shift) == cover_e["cov_cy"])
        & (F.shiftright(points["qlon"], shift) == cover_e["cov_cx"]),
        "inner",
    )
    return (
        cand.filter(_inside_col(F.col("edges"), F.col("qlat"), F.col("qlon")))
        .select(*keep_cols, "polygon_id", "qlat", "qlon")
    )
