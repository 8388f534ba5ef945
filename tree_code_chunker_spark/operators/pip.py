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
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

from ..config import GRID_BITS
from .geo import cell_at_res_col

DEFAULT_COVER_RES = 7


def _rings_norm_col(polygons: DataFrame):
    """Column expression yielding array<array<struct<qlat,qlon>>> from
    EITHER geometry schema: `rings` (multi-ring: shell(s) + holes — ring
    orientation is irrelevant under the even-odd rule) or the single-ring
    `ring`.  Every operator here normalizes through this, so holes and
    multipolygons ride every path (cover, classification, exact test)."""
    cols = polygons.columns
    if "rings" in cols:
        return F.col("rings")
    if "ring" in cols:
        return F.array(F.col("ring"))
    raise ValueError("polygons need a 'ring' or 'rings' column")


def polygon_cover(polygons: DataFrame, res: int = DEFAULT_COVER_RES) -> DataFrame:
    """(polygon_id, ring|rings) -> (polygon_id, cov_cy, cov_cx) cover rows.

    Covering = all res-`res` grid cells intersecting the bbox (conservative
    superset of the true polygon cover; exactness is restored by step 3).
    """
    shift = GRID_BITS - res
    # bbox straight from the flattened ring array (array_min over a
    # projection) — a pure per-row expression: no explode, no groupBy, no
    # shuffle, no AQE rounds on the (small but latency-critical) build side
    ring = F.flatten(_rings_norm_col(polygons))
    bbox = polygons.select(
        "polygon_id",
        F.array_min(F.transform(ring, lambda p: p["qlat"])).alias("min_qlat"),
        F.array_max(F.transform(ring, lambda p: p["qlat"])).alias("max_qlat"),
        F.array_min(F.transform(ring, lambda p: p["qlon"])).alias("min_qlon"),
        F.array_max(F.transform(ring, lambda p: p["qlon"])).alias("max_qlon"),
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


def _close_np(ys: np.ndarray, xs: np.ndarray):
    if len(ys) and (ys[0] != ys[-1] or xs[0] != xs[-1]):
        ys = np.append(ys, ys[0])
        xs = np.append(xs, xs[0])
    return ys, xs


def _collect_polygon_pack(polygons: DataFrame) -> dict:
    """polygon_id -> [(ys, xs), ...] list of CLOSED int64 rings (build
    side).  Single-ring inputs (`ring` column) pack as a one-ring list;
    `rings` inputs (shells + holes / multipolygons) keep every ring —
    edges are enumerated per ring, so no phantom edge ever connects two
    rings.

    The vertices are collected as two parallel array<array<bigint>>
    columns instead of nested Row structs: py4j materializes one Python
    Row object PER VERTEX on the struct path, which dominated the index
    build (r7; measured 2.3s -> 0.36s on the 2000-polygon bench build
    side, identical pack)."""
    pack = {}
    rings = _rings_norm_col(polygons)
    sel = polygons.select(
        "polygon_id",
        F.transform(rings,
                    lambda r: F.transform(r, lambda v: v["qlat"])).alias("ys"),
        F.transform(rings,
                    lambda r: F.transform(r, lambda v: v["qlon"])).alias("xs"),
    )
    for row in sel.collect():
        rr = []
        for ys, xs in zip(row["ys"], row["xs"]):
            rr.append(_close_np(np.array(ys, dtype=np.int64),
                                np.array(xs, dtype=np.int64)))
        pack[row["polygon_id"]] = rr
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


def ray_cast_rings_np(rings: list, py: np.ndarray, px: np.ndarray) -> np.ndarray:
    """Even-odd ray cast over a list of closed rings: crossings sum over
    EVERY ring, so a hole's boundary flips its interior back to outside and
    disjoint shells union — the standard even-odd multi-ring semantics."""
    inside = np.zeros(len(py), dtype=bool)
    for ys, xs in rings:
        inside ^= ray_cast_np(ys, xs, py, px)
    return inside


def _closed_ring_col(ring):
    """Normalize ring closure (append first vertex when the ring is open) so
    the JVM exact path never silently drops the closing edge — keeps it
    consistent with the numpy path, which closes defensively."""
    first = F.element_at(ring, 1)
    last = F.element_at(ring, -1)
    return F.when(
        (first["qlat"] == last["qlat"]) & (first["qlon"] == last["qlon"]),
        ring,
    ).otherwise(F.concat(ring, F.array(first)))


def _edges_col(ring):
    """ring array<struct<qlat,qlon>> -> array<struct<y1,x1,y2,x2>> (closure
    normalized first)."""
    ring = _closed_ring_col(ring)
    return F.transform(
        F.sequence(F.lit(0), F.size(ring) - 2),
        lambda i: F.struct(
            F.element_at(ring, i + 1)["qlat"].alias("y1"),
            F.element_at(ring, i + 1)["qlon"].alias("x1"),
            F.element_at(ring, i + 2)["qlat"].alias("y2"),
            F.element_at(ring, i + 2)["qlon"].alias("x2"),
        ),
    )


def _crossing_pred(y1, x1, y2, x2, py, px):
    straddles = (y1 > py) != (y2 > py)
    dy = y2 - y1
    lhs = (px - x1) * dy
    rhs = (py - y1) * (x2 - x1)
    return straddles & (F.when(dy > 0, lhs < rhs).otherwise(lhs > rhs))


def _inside_col(edges, py, px):
    """Even-odd ray cast as a JVM higher-order expression — integer cross-
    multiplication, bit-identical to ray_cast_np, zero Python in the plan.

    NOTE: interpreted lambda evaluation (NamedLambdaVariable) contends
    across threads in one JVM — measured 3x SLOWER at local[32] than
    local[8].  Used only as the fallback for polygons with more edges than
    the unrolled fast path covers."""

    def crossing(e):
        return _crossing_pred(e["y1"], e["x1"], e["y2"], e["x2"], py, px)

    return F.size(F.filter(edges, crossing)) % 2 == 1


MAX_UNROLLED_EDGES = 32


def _inside_col_unrolled(edges, py, px, max_edges: int = MAX_UNROLLED_EDGES):
    """Ray cast as a FLAT codegen-friendly expression: the crossing test is
    unrolled over element_at(i) terms (no lambda variables, so whole-stage
    codegen applies and threads share nothing).  Exact for polygons with at
    most max_edges edges; pip_join routes bigger rings to the HOF fallback.
    """
    total = F.lit(0)
    for i in range(max_edges):
        # F.get is null-safe out-of-bounds (element_at THROWS in ANSI mode
        # even under a when() guard — evaluation is not short-circuited)
        e = F.get(edges, i)
        c = _crossing_pred(e["y1"], e["x1"], e["y2"], e["x2"], py, px)
        total = total + F.when(c, 1).otherwise(0)  # null crossing -> 0
    return total % 2 == 1


def _classify_cells_np(ys: np.ndarray, xs: np.ndarray, res: int):
    """Single-closed-ring form of _classify_cells_rings_np (tests/oracles)."""
    return _classify_cells_rings_np([(ys, xs)], res)


def _classify_cells_rings_np(rings: list, res: int):
    """Closed rings -> [(cov_cy, cov_cx, is_full)] over the bbox cells at
    `res`, skipping fully-outside cells.  Conservative: a cell is 'full'
    only if all 4 corners are inside (even-odd over ALL rings) AND no edge
    bbox of ANY ring overlaps it — a hole edge therefore demotes the cells
    it crosses to boundary, and cells strictly inside a hole classify
    corners-out + no-overlap = dropped."""
    shift = GRID_BITS - res
    cell = 1 << shift
    all_y = np.concatenate([ys for ys, _ in rings])
    all_x = np.concatenate([xs for _, xs in rings])
    cy0, cy1 = int(all_y.min()) >> shift, int(all_y.max()) >> shift
    cx0, cx1 = int(all_x.min()) >> shift, int(all_x.max()) >> shift
    gy, gx = np.meshgrid(np.arange(cy0, cy1 + 1), np.arange(cx0, cx1 + 1),
                         indexing="ij")
    gy, gx = gy.ravel(), gx.ravel()
    lo_y, hi_y = gy * cell, (gy + 1) * cell - 1
    lo_x, hi_x = gx * cell, (gx + 1) * cell - 1
    ey0 = np.concatenate([np.minimum(ys[:-1], ys[1:]) for ys, _ in rings])
    ey1 = np.concatenate([np.maximum(ys[:-1], ys[1:]) for ys, _ in rings])
    ex0 = np.concatenate([np.minimum(xs[:-1], xs[1:]) for _, xs in rings])
    ex1 = np.concatenate([np.maximum(xs[:-1], xs[1:]) for _, xs in rings])
    overlap = (
        (lo_y[:, None] <= ey1[None, :]) & (hi_y[:, None] >= ey0[None, :])
        & (lo_x[:, None] <= ex1[None, :]) & (hi_x[:, None] >= ex0[None, :])
    ).any(axis=1)
    corners_in = np.ones(len(gy), dtype=bool)
    for py, px in ((lo_y, lo_x), (lo_y, hi_x), (hi_y, lo_x), (hi_y, hi_x)):
        corners_in &= ray_cast_rings_np(rings, py, px)
    full = corners_in & ~overlap
    keep = full | overlap  # corners-out + no-overlap == fully outside
    return gy[keep], gx[keep], full[keep]


def polygon_cover_classified(polygons: DataFrame, res: int = DEFAULT_COVER_RES) -> DataFrame:
    """(polygon_id, ring) -> (polygon_id, cov_cy, cov_cx, is_full) cover rows,
    THREE-way classified per cell (distributed, vectorized per polygon):

      * full    — all 4 cell corners inside AND no edge bbox overlaps the
                  cell: every point in the cell is inside => downstream can
                  accept its points WITHOUT the exact test,
      * boundary— some edge bbox overlaps the cell: exact test required,
      * outside — corners outside, no edge overlap: DROPPED (bbox cover of
                  concave/star shapes is full of these).

    Conservative by construction (edge-bbox overlap over-approximates edge
    crossing), so correctness never depends on the classification — only
    candidate volume does.  This is the standard interior/boundary cover
    split of spatial indexes (e.g. S2 region coverers).
    """
    from typing import Iterator

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_pid, out_cy, out_cx, out_full = [], [], [], []
            for pid, rings in zip(pdf["polygon_id"], pdf["rings"]):
                rr = [
                    _close_np(
                        np.array([v["qlat"] for v in ring], dtype=np.int64),
                        np.array([v["qlon"] for v in ring], dtype=np.int64))
                    for ring in rings
                ]
                cy, cx, full = _classify_cells_rings_np(rr, res)
                out_pid.extend([pid] * len(cy))
                out_cy.extend(cy.tolist())
                out_cx.extend(cx.tolist())
                out_full.extend(full.tolist())
            yield pd.DataFrame({
                "polygon_id": out_pid, "cov_cy": out_cy,
                "cov_cx": out_cx, "is_full": out_full,
            })

    return polygons.select(
        "polygon_id", _rings_norm_col(polygons).alias("rings")
    ).mapInPandas(
        classify, "polygon_id string, cov_cy bigint, cov_cx bigint, is_full boolean"
    )


def _classify_cells_all_np(pack: dict, ids: list, Y1, X1, Y2, X2, res: int):
    """Batch form of _classify_cells_np over EVERY polygon at once (same
    classification, same outputs): one flattened cell list for all bboxes,
    corner ray-casts and edge-bbox overlaps via poly_ix gathers into the
    padded edge tensors.  Replaces a 2000-iteration Python loop of small
    numpy calls (~1 s serial on the driver for the bench build side) with
    ~15 vectorized passes (~50 ms).

    Returns (poly_ix, cov_cy, cov_cx, is_full) for kept (full|boundary)
    cells; padding edges (all-zero rows) are masked out of the overlap
    test and are inert in the crossing test (y1 == y2 never straddles)."""
    shift = GRID_BITS - res
    cell = np.int64(1 << shift)
    P, E = Y1.shape
    cy0 = np.empty(P, np.int64); cy1 = np.empty(P, np.int64)
    cx0 = np.empty(P, np.int64); cx1 = np.empty(P, np.int64)
    n_edges = np.empty(P, np.int64)
    for i, pid in enumerate(ids):  # tiny per-poly mins; the heavy work below
        rr = pack[pid]
        cy0[i] = min(int(ys.min()) for ys, _ in rr) >> shift
        cy1[i] = max(int(ys.max()) for ys, _ in rr) >> shift
        cx0[i] = min(int(xs.min()) for _, xs in rr) >> shift
        cx1[i] = max(int(xs.max()) for _, xs in rr) >> shift
        n_edges[i] = sum(len(ys) - 1 for ys, _ in rr)
    ny = cy1 - cy0 + 1
    nx = cx1 - cx0 + 1
    ncells = ny * nx
    total = int(ncells.sum())
    offs = np.zeros(P, np.int64)
    np.cumsum(ncells[:-1], out=offs[1:])
    poly_ix = np.repeat(np.arange(P, dtype=np.int64), ncells)
    within = np.arange(total, dtype=np.int64) - offs[poly_ix]
    gy = cy0[poly_ix] + within // nx[poly_ix]
    gx = cx0[poly_ix] + within % nx[poly_ix]
    lo_y, hi_y = gy * cell, (gy + 1) * cell - 1
    lo_x, hi_x = gx * cell, (gx + 1) * cell - 1

    overlap = np.zeros(total, dtype=bool)
    corners_in = np.ones(total, dtype=bool)
    corner_cross = [np.zeros(total, dtype=np.int32) for _ in range(4)]
    corners = ((lo_y, lo_x), (lo_y, hi_x), (hi_y, lo_x), (hi_y, hi_x))
    for e in range(E):
        ey1 = Y1[poly_ix, e].astype(np.int64)
        ey2 = Y2[poly_ix, e].astype(np.int64)
        ex1 = X1[poly_ix, e].astype(np.int64)
        ex2 = X2[poly_ix, e].astype(np.int64)
        valid = e < n_edges[poly_ix]
        overlap |= valid & (
            (lo_y <= np.maximum(ey1, ey2)) & (hi_y >= np.minimum(ey1, ey2))
            & (lo_x <= np.maximum(ex1, ex2)) & (hi_x >= np.minimum(ex1, ex2))
        )
        dy = ey2 - ey1
        dx = ex2 - ex1
        for c, (py, px) in enumerate(corners):
            straddle = (ey1 > py) != (ey2 > py)
            lhs = (px - ex1) * dy
            rhs = (py - ey1) * dx
            corner_cross[c] += straddle & np.where(dy > 0, lhs < rhs, lhs > rhs)
    for c in range(4):
        corners_in &= (corner_cross[c] & 1).astype(bool)
    full = corners_in & ~overlap
    keep = full | overlap
    return poly_ix[keep], gy[keep], gx[keep], full[keep]


def _edge_tensor(pack: dict):
    """polygon pack -> (ids, Y1, X1, Y2, X2) padded [P, E_max] edge
    matrices; padding rows are degenerate (y1==y2) so they never cross.
    Edges concatenate over a polygon's rings PER RING (closure inside each
    ring), so holes and multipolygon shells contribute their own closed
    edge loops and no phantom edge connects two rings."""
    ids = sorted(pack)
    e_max = max(
        sum(len(ys) - 1 for ys, _ in pack[p]) for p in ids) if ids else 1
    e_max = max(e_max, 1)
    P = len(ids)
    # int32: grid coords are < 2^16; the kernel widens only the products
    Y1 = np.zeros((P, e_max), dtype=np.int32)
    X1 = np.zeros((P, e_max), dtype=np.int32)
    Y2 = np.zeros((P, e_max), dtype=np.int32)
    X2 = np.zeros((P, e_max), dtype=np.int32)
    for i, pid in enumerate(ids):
        o = 0
        for ys, xs in pack[pid]:
            n = len(ys) - 1
            Y1[i, o:o + n], X1[i, o:o + n] = ys[:-1], xs[:-1]
            Y2[i, o:o + n], X2[i, o:o + n] = ys[1:], xs[1:]
            o += n
    return ids, Y1, X1, Y2, X2


class PolygonIndex:
    """Prepared build side of the PIP join: packed edge tensors broadcast
    to executors + the classified cover as a small DataFrame.

    Build ONCE per polygon set, probe many times — on a real cluster the
    polygon index outlives thousands of point batches, so the collect/
    classify/broadcast cost is not part of the per-query path.  (The
    reference's parser-pool/grammar-cache pattern, applied to geometry.)
    """

    def __init__(self, spark, polygons: DataFrame, res: int = DEFAULT_COVER_RES):
        self.res = res
        self.pack = _collect_polygon_pack(polygons)
        ids, Y1, X1, Y2, X2 = _edge_tensor(self.pack)
        self.ids = ids
        self.edges_bc = spark.sparkContext.broadcast((Y1, X1, Y2, X2))
        # per-polygon VALID edge counts: the padded tensor rows are inert
        # for the crossing test (y1==y2 never straddles) but a DISTANCE
        # kernel must mask them — a padding "segment" at (0,0) would
        # otherwise become a false nearest edge
        self.n_edges_bc = spark.sparkContext.broadcast(np.array(
            [sum(len(ys) - 1 for ys, _ in self.pack[p]) for p in ids],
            dtype=np.int64))
        pix, cy, cx, full = _classify_cells_all_np(
            self.pack, ids, Y1, X1, Y2, X2, res)
        id_arr = np.array(ids, dtype=object)
        cover_pdf = pd.DataFrame({
            "polygon_id": id_arr[pix],
            "poly_ix": pix.astype(np.int32),
            "cov_cy": cy.astype(np.int64),
            "cov_cx": cx.astype(np.int64),
            "is_full": full,
        })
        self.cover_ix = spark.createDataFrame(
            cover_pdf,
            "polygon_id string, poly_ix int, cov_cy bigint, cov_cx bigint, "
            "is_full boolean",
        )


def build_polygon_index(polygons: DataFrame,
                        res: int = DEFAULT_COVER_RES) -> PolygonIndex:
    return PolygonIndex(polygons.sparkSession, polygons, res)


def pip_join(
    points: DataFrame,
    polygons: DataFrame = None,
    res: int = DEFAULT_COVER_RES,
    keep_cols: tuple[str, ...] = ("doc_id", "span_pos"),
    exact: str = "numpy",
    index: PolygonIndex | None = None,
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
    if polygons is None and index is None:
        raise ValueError("pip_join needs a build side: pass polygons= "
                         "and/or index=")
    if exact != "numpy" and index is not None:
        raise ValueError(
            f"exact={exact!r} builds its cover from the polygons DataFrame "
            "and cannot use a PolygonIndex — pass polygons= with the JVM "
            "paths, or use exact='numpy' to probe the index")
    if exact == "numpy":
        # classified cover: FULL cells accept their points with no exact
        # test; only BOUNDARY-cell candidates cross into the vectorized
        # numpy exact test (one gather into broadcast padded edge tensors +
        # one crossing evaluation per Arrow batch — no per-polygon grouping,
        # no giant codegen expression: a 32-term unrolled JVM expression
        # exceeded HotSpot's JIT method limit and ran interpreted, ~8x
        # slower than this path).  The build side lives in PolygonIndex —
        # pass one in to amortize the collect/classify/broadcast across
        # probe batches (it is polygon-only, independent of the points).
        spark = points.sparkSession
        idx = index if index is not None else PolygonIndex(spark, polygons, res)
        res = idx.res
        shift = GRID_BITS - res
        b = idx.edges_bc
        cover_ix = idx.cover_ix

        CHUNK = 1 << 16  # rows per cache tile

        @F.pandas_udf(BooleanType())
        def inside(poly_ix: pd.Series, qlat: pd.Series, qlon: pd.Series) -> pd.Series:
            # cache-tiled kernel: the exact test is DRAM-bandwidth-bound at
            # full batch width (measured: per-core throughput drops ~35%
            # from 4 to 16 concurrent workers), so work in 64k-row tiles
            # with int32 intermediates — every temporary stays cache-
            # resident; only the two cross-products need int64.
            y1, x1, y2, x2 = b.value  # int32 [P, E] edge tables
            ix_all = poly_ix.to_numpy()
            py_all = qlat.to_numpy(dtype=np.int32)
            px_all = qlon.to_numpy(dtype=np.int32)
            out = np.zeros(len(ix_all), dtype=bool)
            for s in range(0, len(ix_all), CHUNK):
                ix = ix_all[s:s + CHUNK]
                py = py_all[s:s + CHUNK]
                px = px_all[s:s + CHUNK]
                crossings = np.zeros(len(ix), dtype=np.int32)
                for e in range(y1.shape[1]):
                    ey1 = y1[ix, e]
                    ey2 = y2[ix, e]
                    straddle = (ey1 > py) != (ey2 > py)
                    if not straddle.any():
                        continue
                    ex1 = x1[ix, e]
                    ex2 = x2[ix, e]
                    dy = (ey2 - ey1).astype(np.int64)
                    lhs = (px - ex1) * dy
                    rhs = (py - ey1).astype(np.int64) * (ex2 - ex1)
                    crossings += straddle & np.where(dy > 0, lhs < rhs, lhs > rhs)
                out[s:s + CHUNK] = (crossings & 1).astype(bool)
            return pd.Series(out)

        cand = points.join(
            F.broadcast(cover_ix),
            (F.shiftright(points["qlat"], shift) == cover_ix["cov_cy"])
            & (F.shiftright(points["qlon"], shift) == cover_ix["cov_cx"]),
            "inner",
        )
        # single pass: full cells accept unconditionally; boundary cells by
        # the exact test.  (The UDF is still evaluated on full-cell rows —
        # Spark pulls Python UDFs out of when/or — but that is ~4% extra
        # kernel work vs a SECOND broadcast-join pass for a separate
        # accepted branch, which measured strictly worse.)
        # grid coords are < 2^16, so the UDF inputs are cast int32 — halves
        # the Arrow transfer of the candidate stream, which is DRAM-bound
        return cand.filter(
            F.col("is_full")
            | inside("poly_ix", F.col("qlat").cast("int"),
                     F.col("qlon").cast("int"))
        ).select(*keep_cols, "polygon_id", "qlat", "qlon")

    # JVM variants (kept for environments without Python workers): unrolled
    # codegen expression for small rings, interpreted HOF for big ones.
    # Multi-ring geometries flatten to one edge array per polygon (each
    # ring closed separately), so the even-odd crossing count handles
    # holes/multipolygons here too.
    shift = GRID_BITS - res
    cover = polygon_cover(polygons, res)
    edges = polygons.select(
        "polygon_id",
        F.flatten(F.transform(_rings_norm_col(polygons),
                              lambda r: _edges_col(r))).alias("edges"),
    )
    cover_e = cover.join(edges, "polygon_id")

    def cand_for(cov):
        return points.join(
            F.broadcast(cov),
            (F.shiftright(points["qlat"], shift) == cov["cov_cy"])
            & (F.shiftright(points["qlon"], shift) == cov["cov_cx"]),
            "inner",
        )

    small = cover_e.filter(F.size("edges") <= MAX_UNROLLED_EDGES)
    out = cand_for(small).filter(
        _inside_col_unrolled(F.col("edges"), F.col("qlat"), F.col("qlon"))
    ).select(*keep_cols, "polygon_id", "qlat", "qlon")

    max_edges = polygons.select(
        F.max(F.size(F.flatten(_rings_norm_col(polygons))))
        .alias("m")).first()["m"] or 0
    if max_edges - 1 > MAX_UNROLLED_EDGES:
        big = cover_e.filter(F.size("edges") > MAX_UNROLLED_EDGES)
        out = out.unionByName(
            cand_for(big).filter(
                _inside_col(F.col("edges"), F.col("qlat"), F.col("qlon"))
            ).select(*keep_cols, "polygon_id", "qlat", "qlon")
        )
    return out


def pip_anti_join(
    points: DataFrame,
    polygons: DataFrame = None,
    res: int = DEFAULT_COVER_RES,
    keys: tuple[str, ...] = ("doc_id", "span_pos"),
    index: PolygonIndex | None = None,
) -> DataFrame:
    """Points contained in NO polygon — the spatial filter-out (mask out
    covered regions, keep open water/unzoned points, etc.).

    Scale shape: the ordinary pip_join finds the matches (broadcast
    classified cover, probe never shuffled), their `keys` are distinct'd
    (matches <= points, usually far fewer), and one LEFT ANTI equi-join on
    `keys` drops them from the original point set — the anti join shuffles
    on the compact key columns only, and every input column of `points`
    passes through untouched (the anti join adds none).

    `keys` must uniquely identify a point row (the engine contract's
    doc_id/span_pos); a duplicate key would drop its innocent twin.
    """
    hits = (
        pip_join(points, polygons=polygons, res=res,
                 keep_cols=tuple(keys), index=index)
        .select(*keys)
        .distinct()
    )
    return points.join(hits, list(keys), "left_anti")


def polygon_distance_join(
    points: DataFrame,
    polygons: DataFrame = None,
    radius: int = 512,
    keep_cols: tuple[str, ...] = ("doc_id", "span_pos"),
    index: PolygonIndex | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Distance-to-polygon join (nearest-feature matching): one row per
    (point, polygon) with grid distance <= radius — dist = 0.0 for
    contained points, else the minimum distance to any polygon edge
    (rounded to `round_to` dp; multi-ring geometries measure to shell AND
    hole edges, so a point inside a hole gets its hole-boundary
    distance).  Compose with a top-1 window for "nearest polygon".

    Physical plan (the pip_join recipe extended by a radius collar):
      1. prune — each classified-cover cell (full|boundary, i.e. cells
         the polygon actually intersects) explodes to its Chebyshev-k
         neighborhood, k = ceil(radius / cell_side), and broadcasts;
         any point within `radius` of the polygon lies in that
         neighborhood, so the point side is never shuffled;
      2. exact — ONE vectorized numpy pass per Arrow batch over the
         broadcast padded edge tensors computes crossings (even-odd,
         containment) AND the min point-to-segment distance together;
         padding rows are masked via the index's per-polygon edge count.

    Determinism: per-edge squared distances are computed in float64 with
    the identical projection formula the DuckDB mirror uses (integer
    inputs < 2^17, products exact; the one division rounds once) and
    rounded to `round_to` BEFORE the min, so engine and oracle agree at
    ties and at the radius boundary.

    Reference correspondence: the 2-D metric generalization of the
    deepest-containing-scope join (scope.go:96-130) — containment is the
    dist=0 case; the collar adds the near-miss band.
    """
    from ..config import GRID_BITS
    from .geo import kring_offsets

    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    spark = points.sparkSession
    idx = index if index is not None else PolygonIndex(
        spark, polygons, DEFAULT_COVER_RES)
    res = idx.res
    shift = GRID_BITS - res
    side = 1 << shift
    k = -(-int(radius) // side)  # ceil
    offs = kring_offsets(k)
    n_cells = 1 << res

    off = F.explode(F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy, dx in offs
    ])).alias("off")
    cover = (
        idx.cover_ix.select("polygon_id", "poly_ix", "cov_cy", "cov_cx")
        .select("*", off)
        .select(
            "polygon_id", "poly_ix",
            (F.col("cov_cy") + F.col("off.dy")).alias("cov_cy"),
            (F.col("cov_cx") + F.col("off.dx")).alias("cov_cx"),
        )
        .filter((F.col("cov_cy") >= 0) & (F.col("cov_cy") < n_cells)
                & (F.col("cov_cx") >= 0) & (F.col("cov_cx") < n_cells))
        .distinct()
    )

    b = idx.edges_bc
    ne_b = idx.n_edges_bc
    rr = round_to

    @F.pandas_udf("double")
    def poly_dist(poly_ix: pd.Series, qlat: pd.Series,
                  qlon: pd.Series) -> pd.Series:
        y1, x1, y2, x2 = b.value  # int32 [P, E] edge tables
        n_edges = ne_b.value
        ix = poly_ix.to_numpy()
        py = qlat.to_numpy(dtype=np.int64)
        px = qlon.to_numpy(dtype=np.int64)
        crossings = np.zeros(len(ix), dtype=np.int32)
        min_d2 = np.full(len(ix), np.inf)
        for e in range(y1.shape[1]):
            valid = e < n_edges[ix]
            if not valid.any():
                continue
            ay = y1[ix, e].astype(np.int64)
            ax = x1[ix, e].astype(np.int64)
            by = y2[ix, e].astype(np.int64)
            bx = x2[ix, e].astype(np.int64)
            # even-odd crossing (same half-open rule as pip_join)
            straddle = (ay > py) != (by > py)
            dy = by - ay
            lhs = (px - ax) * dy
            rhs = (py - ay) * (bx - ax)
            crossings += (valid & straddle
                          & np.where(dy > 0, lhs < rhs, lhs > rhs))
            # point-to-segment squared distance (projection clamp)
            l2 = (bx - ax) ** 2 + (by - ay) ** 2
            tn = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
            d2a = (px - ax) ** 2 + (py - ay) ** 2
            d2b = (px - bx) ** 2 + (py - by) ** 2
            with np.errstate(divide="ignore", invalid="ignore"):
                d2m = d2a - tn.astype(np.float64) ** 2 / l2
            d2 = np.where((l2 == 0) | (tn <= 0), d2a,
                          np.where(tn >= l2, d2b, d2m))
            d2 = np.round(d2, rr)
            min_d2 = np.where(valid, np.minimum(min_d2, d2), min_d2)
        inside = (crossings & 1).astype(bool)
        out = np.where(inside, 0.0,
                       np.round(np.sqrt(np.maximum(min_d2, 0.0)), rr))
        return pd.Series(out)

    cand = points.join(
        F.broadcast(cover),
        (F.shiftright(points["qlat"], shift) == cover["cov_cy"])
        & (F.shiftright(points["qlon"], shift) == cover["cov_cx"]),
        "inner",
    )
    return (
        cand.withColumn(
            "dist",
            poly_dist("poly_ix", F.col("qlat").cast("int"),
                      F.col("qlon").cast("int")))
        .filter(F.col("dist") <= F.lit(float(radius)))
        .select(*keep_cols, "polygon_id", "dist")
    )


def nearest_polygon(
    points: DataFrame,
    polygons: DataFrame = None,
    radius: int = 512,
    keep_cols: tuple[str, ...] = ("doc_id", "span_pos"),
    index: PolygonIndex | None = None,
) -> DataFrame:
    """Each point's single nearest polygon within `radius` (the
    nearest-zone / nearest-road assignment): polygon_distance_join +
    top-1 per point, distance ties broken on polygon_id so the
    assignment is deterministic.  Points with no polygon in range emit
    no row (left-join against the original set to keep them)."""
    from pyspark.sql import Window

    cand = polygon_distance_join(points, polygons, radius,
                                 keep_cols=keep_cols, index=index)
    w = Window.partitionBy(*keep_cols).orderBy(
        F.col("dist").asc(), F.col("polygon_id").asc())
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def buffer_cover(polygons: DataFrame, res: int, k: int) -> DataFrame:
    """Buffered polygon cover: the polygon's res-`res` cell cover dilated
    by Chebyshev distance `k` (morphological dilation on the cell grid) —
    the cheap "within ~k cells of the zone" geofence-buffer primitive
    that turns any downstream cell equi-join (points, tiles, other
    covers) into a buffered containment test without touching geometry.

    Output: (polygon_id, cov_cy, cov_cx), one row per distinct buffered
    cell, clamped to the grid.

    Scale shape: cover explode x (2k+1)^2 offsets + one distinct — the
    only shuffle, bounded by |cover| * (2k+1)^2 per polygon, and the
    distinct collapses overlap between neighboring source cells.  For a
    metric (not cell-quantized) buffer use dwithin_join against the
    polygon boundary instead; this is the raster-style fast path.
    """
    from .geo import kring_offsets

    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    n_cells = 1 << res
    cov = polygon_cover(polygons, res)
    off = F.explode(F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy, dx in kring_offsets(k)
    ])).alias("off")
    return (
        cov.select("polygon_id", "cov_cy", "cov_cx", off)
        .select(
            "polygon_id",
            (F.col("cov_cy") + F.col("off.dy")).alias("cov_cy"),
            (F.col("cov_cx") + F.col("off.dx")).alias("cov_cx"),
        )
        .filter((F.col("cov_cy") >= 0) & (F.col("cov_cy") < n_cells)
                & (F.col("cov_cx") >= 0) & (F.col("cov_cx") < n_cells))
        .distinct()
    )
