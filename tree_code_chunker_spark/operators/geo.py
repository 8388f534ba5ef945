"""Cell index + tile math: Morton/quadkey grid (H3/S2-equivalent contract).

Public-knowledge construction (Z-order curve / quadkeys, as in Bing Maps
quadkey docs and the classic "Bit Twiddling Hacks" part1by1 spread): quantize
lat/lon onto a 2^16 x 2^16 integer grid, bit-interleave (lat, lon) into a
32-bit Morton cell id; resolution r in [0,16] keeps the top 2r bits
(hierarchical prefix — parent/child by integer shift, so "cell-prefix" kNN and
k-ring are integer math).  All math is INTEGER after quantization — bit-exact
across partitions, cluster sizes, and the three synchronized backends:

 * Spark Column expressions (JVM whole-stage codegen — the engine hot path;
   no Python at all for cell/tile assignment),
 * numpy (inside pandas UDFs + pytest oracles),
 * DuckDB SQL strings (the driver's correctness oracle).

Tile scheme (raster/vector materialization): slippy-style z/x/y on the same
grid, x from west, y from north: x = qlon >> (16-z), y = (65535-qlat) >> (16-z).

Reference correspondence: the reference's interval containment/overlap joins
(scope.go:4-6, codechunk.go:631-651) are the 1-D versions of the cell-bucket
prune + exact test implemented here in 2-D (SURVEY.md §2.4 J2).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

from ..config import GRID_BITS

GRID_MAX = (1 << GRID_BITS) - 1  # 65535

# (shift, mask) pairs for the 16->32 bit interleave spread (part1by1).
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]

# ---------------------------------------------------------------- numpy ----


def quantize_np(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Float lat/lon -> integer grid coords (floor, clamped)."""
    qlat = np.floor((lat + 90.0) / 180.0 * 65536.0).astype(np.int64)
    qlon = np.floor((lon + 180.0) / 360.0 * 65536.0).astype(np.int64)
    return np.clip(qlat, 0, GRID_MAX), np.clip(qlon, 0, GRID_MAX)


def part1by1_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64) & 0xFFFF
    for shift, mask in _SPREAD:
        v = (v | (v << shift)) & mask
    return v


def cell_np(qlat: np.ndarray, qlon: np.ndarray) -> np.ndarray:
    """Morton cell id at full resolution (32-bit, lat bits in odd positions)."""
    return (part1by1_np(qlat) << 1) | part1by1_np(qlon)


def cell_at_res_np(cell: np.ndarray, r: int) -> np.ndarray:
    return cell >> (2 * (GRID_BITS - r))


def tile_np(qlat: np.ndarray, qlon: np.ndarray, z: int):
    x = qlon >> (GRID_BITS - z)
    y = (GRID_MAX - qlat) >> (GRID_BITS - z)
    return x, y


# ------------------------------------------------------- Spark columns ----


def quantize_col(lat: Column, lon: Column) -> tuple[Column, Column]:
    qlat = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(65536.0))
    qlon = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(65536.0))
    clamp = lambda c: F.greatest(F.lit(0), F.least(F.lit(GRID_MAX), c))
    return clamp(qlat).cast("long"), clamp(qlon).cast("long")


def part1by1_col(v: Column) -> Column:
    v = v.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def cell_col(qlat: Column, qlon: Column) -> Column:
    return F.shiftleft(part1by1_col(qlat), 1).bitwiseOR(part1by1_col(qlon))


def cell_at_res_col(cell: Column, r: int) -> Column:
    return F.shiftright(cell, 2 * (GRID_BITS - r))


def tile_cols(qlat: Column, qlon: Column, z: int) -> tuple[Column, Column]:
    x = F.shiftright(qlon, GRID_BITS - z)
    y = F.shiftright(F.lit(GRID_MAX) - qlat, GRID_BITS - z)
    return x, y


def kring_offsets(k: int, ring_only: bool = False) -> list[tuple[int, int]]:
    """Chebyshev disk (or ring shell) offsets around a grid cell at res r."""
    out = []
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            if ring_only and max(abs(dx), abs(dy)) != k:
                continue
            out.append((dy, dx))
    return out


# ----------------------------------------------------- DuckDB SQL mirror ----


def part1by1_sql(v: str) -> str:
    """SQL expression string computing part1by1 of integer expression `v`."""
    e = f"(({v}) & 65535)"
    for shift, mask in _SPREAD:
        e = f"((({e} | ({e} << {shift}))) & {mask})"
    return e


def cell_sql(qlat: str, qlon: str) -> str:
    return f"(({part1by1_sql(qlat)} << 1) | {part1by1_sql(qlon)})"


def cell_at_res_sql(cell: str, r: int) -> str:
    return f"(({cell}) >> {2 * (GRID_BITS - r)})"


def tile_sql(qlat: str, qlon: str, z: int) -> tuple[str, str]:
    return (
        f"(({qlon}) >> {GRID_BITS - z})",
        f"(({GRID_MAX} - ({qlat})) >> {GRID_BITS - z})",
    )


# --------------------------------------- derived deterministic point set ----
# Points for the driver-table correctness gate are derived from integer keys
# (documents doc_id x span_pos) by modular hashing — integer end-to-end so the
# Spark and DuckDB sides agree bit-for-bit.  20% of docs are redirected into 3
# hot cells (power-law skew) so the skew-handling paths are exercised with
# real skew, not just compiled (FIXTURES.md §3).

HASH_MULT = 2654435761  # Knuth multiplicative constant (public)
HASH_MOD = 1 << 32
HOT_CENTERS = [(52000, 9000), (21000, 43000), (40000, 60000)]  # (qlat, qlon)
HOT_JITTER = 64  # grid units of jitter inside a hot spot
HOT_DOC_MOD = 5  # doc_id % 5 == 0 -> hot (20% of docs)


def derive_point_cols(doc_id: Column, span_pos: Column) -> tuple[Column, Column]:
    """(qlat, qlon) integer grid coords derived from (doc_id, span_pos)."""
    h = (doc_id.cast("long") * F.lit(HASH_MULT)
         + span_pos.cast("long") * F.lit(40503) + F.lit(12345)) % F.lit(HASH_MOD)
    base_qlat = h % F.lit(65536)
    base_qlon = (h / F.lit(65536)).cast("long") % F.lit(65536)
    hot = (doc_id.cast("long") % HOT_DOC_MOD) == 0
    hot_ix = (doc_id.cast("long") / F.lit(HOT_DOC_MOD)).cast("long") % F.lit(3)
    hot_qlat = hot_qlon = None
    for i, (cy, cx) in enumerate(HOT_CENTERS):
        qa = F.lit(cy) + h % F.lit(HOT_JITTER)
        qo = F.lit(cx) + (h / F.lit(HOT_JITTER)).cast("long") % F.lit(HOT_JITTER)
        hot_qlat = qa if hot_qlat is None else F.when(hot_ix == i, qa).otherwise(hot_qlat)
        hot_qlon = qo if hot_qlon is None else F.when(hot_ix == i, qo).otherwise(hot_qlon)
    qlat = F.when(hot, hot_qlat).otherwise(base_qlat)
    qlon = F.when(hot, hot_qlon).otherwise(base_qlon)
    return qlat.cast("long"), qlon.cast("long")


def derive_point_sql(doc_id: str = "doc_id", span_pos: str = "span_pos") -> tuple[str, str]:
    """DuckDB SQL mirror of derive_point_cols (integer-exact)."""
    h = (f"((CAST({doc_id} AS BIGINT) * {HASH_MULT} + "
         f"CAST({span_pos} AS BIGINT) * 40503 + 12345) % {HASH_MOD})")
    base_qlat = f"({h} % 65536)"
    base_qlon = f"(({h} // 65536) % 65536)"
    hot = f"((CAST({doc_id} AS BIGINT) % {HOT_DOC_MOD}) = 0)"
    hot_ix = f"((CAST({doc_id} AS BIGINT) // {HOT_DOC_MOD}) % 3)"
    lat_cases = " ".join(
        f"WHEN {hot_ix} = {i} THEN ({cy} + {h} % {HOT_JITTER})"
        for i, (cy, cx) in enumerate(HOT_CENTERS)
    )
    lon_cases = " ".join(
        f"WHEN {hot_ix} = {i} THEN ({cx} + ({h} // {HOT_JITTER}) % {HOT_JITTER})"
        for i, (cy, cx) in enumerate(HOT_CENTERS)
    )
    qlat = f"(CASE WHEN {hot} THEN (CASE {lat_cases} END) ELSE {base_qlat} END)"
    qlon = f"(CASE WHEN {hot} THEN (CASE {lon_cases} END) ELSE {base_qlon} END)"
    return qlat, qlon


# ------------------------------------------------------ cover compaction ----


def compact_cover(cells, res: int, cell_col: str = "cell",
                  max_levels: int | None = None):
    """Normalize a quadtree cell cover: wherever all 4 siblings are present,
    replace them with their parent, repeatedly (S2 CellUnion.Normalize
    contract).  cells = DISTINCT cell ids at resolution `res`; returns the
    minimal equivalent cover as (res, cell) rows, mixed resolutions.

    Plan shape: one groupBy-on-parent + one anti-join per level, on a
    DataFrame that only ever SHRINKS (a promoted level has <= 1/4 the
    rows), for at most `res` levels — covers are metadata-sized by nature
    (bounded by the grid, not the corpus), so the chained lineage is cheap;
    at true scale persist each level or cut with max_levels.
    """
    from pyspark.sql import functions as F

    if max_levels is None:
        max_levels = res
    # localCheckpoint per level: each `promoted` feeds TWO consumers (the
    # anti-join build side and the next level), so truncating lineage both
    # avoids recomputing the whole upstream per level and keeps each
    # level's fused codegen stage small (the full chained lineage overflows
    # janino's 64 KB method limit and drops stages to interpreted mode).
    # Covers are metadata-sized by contract, so materializing is cheap.
    cur = cells.select(F.col(cell_col).alias("cell")).distinct() \
        .localCheckpoint(eager=False)
    out = []
    r = res
    for r in range(res, max(res - max_levels, 0), -1):
        grp = (
            cur.groupBy(F.shiftright("cell", 2).alias("p"))
            .agg(F.count("*").alias("_n"))
        )
        promoted = grp.filter(F.col("_n") == 4).select("p") \
            .localCheckpoint(eager=False)
        kept = cur.join(
            promoted, F.shiftright(cur["cell"], 2) == promoted["p"],
            "left_anti")
        out.append(kept.select(F.lit(r).cast("long").alias("res"), "cell"))
        cur = promoted.select(F.col("p").alias("cell"))
        r -= 1  # resolution of `cur` after the loop body
    acc = cur.select(F.lit(r).cast("long").alias("res"), "cell")
    # max_levels=0 (or res=0) runs zero promotion rounds: `acc` alone is
    # the cover unchanged, matching compact_cover_sql on the same args
    for df in out:
        acc = acc.unionByName(df)
    return acc


def compact_cover_sql(cells_cte: str, res: int,
                      max_levels: int | None = None,
                      as_cte: str | None = None) -> str:
    """DuckDB mirror of compact_cover: chained per-level CTEs over a cell
    CTE named `cells_cte` (DISTINCT cell ids at `res`).  Returns a full
    SELECT producing (res, cell) — or, with `as_cte`, the same result
    wrapped as one more named CTE so callers can keep composing."""
    if max_levels is None:
        max_levels = res
    lo = max(res - max_levels, 0)
    ctes, selects = [], []
    prev = cells_cte
    for r in range(res, lo, -1):
        ctes.append(
            f"prom{r} AS (SELECT cell >> 2 AS p FROM {prev} "
            f"GROUP BY 1 HAVING count(*) = 4)")
        ctes.append(
            f"kept{r} AS (SELECT CAST({r} AS BIGINT) AS res, cell "
            f"FROM {prev} WHERE (cell >> 2) NOT IN "
            f"(SELECT p FROM prom{r}))")
        ctes.append(f"lvl{r - 1} AS (SELECT p AS cell FROM prom{r})")
        selects.append(f"SELECT res, cell FROM kept{r}")
        prev = f"lvl{r - 1}"
    selects.append(
        f"SELECT CAST({lo} AS BIGINT) AS res, cell FROM {prev}")
    union = " UNION ALL ".join(selects)
    if as_cte is not None:
        return ", ".join(ctes) + f", {as_cte} AS ({union})"
    return ", ".join(ctes) + "\n" + union


def cover_overlap_join(a, b, a_keep: tuple = (), b_keep: tuple = ()):
    """Spatial join of two quadtree cell covers (mixed resolutions).

    a(res, cell, *a_keep) x b(res, cell, *b_keep) -> one row per overlapping
    cell pair.  Two quadtree cells overlap IFF one is an ancestor-or-equal
    of the other, so the join decomposes into EQUI-joins on (level,
    ancestor-cell): for each resolution level rb present in b, a-cells at
    res >= rb match on their ancestor at rb; symmetrically for strictly
    finer b-cells.  The level lists are collected on the driver (<= 17
    values each by construction — metadata, not data), so the plan is a
    union of hash joins: no range join, no cartesian, scalable to covers of
    any size.  Ancestors use floor(cell / 4^(res-rb)) since the shift
    distance varies per row (4^k is double-exact for k <= 16).

    Returns a_res, a_cell, *a_keep, b_res, b_cell, *b_keep.
    """
    from pyspark.sql import functions as F

    aa = a.select(*a_keep, F.col("res").alias("a_res"),
                  F.col("cell").alias("a_cell"))
    bb = b.select(*b_keep, F.col("res").alias("b_res"),
                  F.col("cell").alias("b_cell"))
    a_levels = sorted(r.a_res for r in aa.select("a_res").distinct().collect())
    b_levels = sorted(r.b_res for r in bb.select("b_res").distinct().collect())

    def _anc(cell_col_name, res_col_name, to_res):
        return F.expr(
            f"CAST(floor({cell_col_name} / pow(4, {res_col_name} - {to_res}))"
            " AS BIGINT)")

    # branch 1: b ancestor-or-equal of a  (a_res >= rb)
    probes = [
        aa.filter(F.col("a_res") >= rb).select(
            "*", F.lit(rb).cast("long").alias("k_res"),
            _anc("a_cell", "a_res", rb).alias("k_cell"))
        for rb in b_levels
    ]
    j1 = None
    if probes:
        p = probes[0]
        for q in probes[1:]:
            p = p.unionByName(q)
        j1 = p.join(bb, (p["k_res"] == bb["b_res"])
                    & (p["k_cell"] == bb["b_cell"]), "inner")
    # branch 2: a STRICT ancestor of b  (b_res > ra)
    probes2 = [
        bb.filter(F.col("b_res") > ra).select(
            "*", F.lit(ra).cast("long").alias("k_res"),
            _anc("b_cell", "b_res", ra).alias("k_cell"))
        for ra in a_levels
    ]
    j2 = None
    if probes2:
        p = probes2[0]
        for q in probes2[1:]:
            p = p.unionByName(q)
        j2 = p.join(aa, (p["k_res"] == aa["a_res"])
                    & (p["k_cell"] == aa["a_cell"]), "inner")
    cols = ["a_res", "a_cell", *a_keep, "b_res", "b_cell", *b_keep]
    out = None
    for j in (j1, j2):
        if j is not None:
            j = j.select(*cols)
            out = j if out is None else out.unionByName(j)
    if out is None:
        raise ValueError("cover_overlap_join: both covers are empty")
    return out


# ------------------------------------------------------------- geodesic ----

EARTH_RADIUS_M = 6371008.8  # IUGG mean radius (public constant)


def haversine_m_col(lat1: Column, lon1: Column,
                    lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between degree coordinates (haversine
    formula, JVM trig — whole-stage codegen, no Python).  Float output: used
    for ranking/thresholding, not for the integer-exact oracle contract
    (grid operators use integer d2; this is the degree-space counterpart)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon))
    # near-antipodal rounding can push a to 1 + ulp -> asin(sqrt) = NaN;
    # clamp (mirrored identically in the oracle SQL)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(F.lit(1.0), a)))


def haversine_m_np(lat1, lon1, lat2, lon2):
    """numpy mirror of haversine_m_col (same formula, same constant)."""
    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1) / 2
    dlon = np.radians(lon2 - lon1) / 2
    a = (np.sin(dlat) ** 2
         + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon) ** 2)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(1.0, a)))


GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(qlat: str = "qlat", qlon: str = "qlon",
                 precision: int = 6) -> str:
    """Portable SQL expression (valid in BOTH Spark SQL and DuckDB) for
    the standard base-32 geohash of an integer-grid point, treating the
    grid as the usual equirectangular mapping lat = qlat/65536*180 - 90,
    lon = qlon/65536*360 - 180.

    Geohash bisection bits ARE the grid coordinate's top bits (the grid
    is the 2^16 regular bisection of each axis), interleaved lon-first:
    global bit i = bit (15 - i//2) of qlon for even i, of qlat for odd i;
    char j encodes bits 5j..5j+4.  precision <= 6 (30 bits) keeps every
    bit inside the 16 available per axis.  Bits are extracted with
    floor(x / 2^k) % 2 — double-exact below 2^53 and the identical
    spelling parses in both engines (Spark has no `>>` operator and
    DuckDB has no shiftright function).
    """
    if not 1 <= precision <= 6:
        raise ValueError(f"precision must be in 1..6, got {precision}")
    chars = []
    for j in range(precision):
        terms = []
        for t in range(5):
            i = 5 * j + t
            src = qlon if i % 2 == 0 else qlat
            k = 15 - i // 2
            terms.append(
                f"(CAST(floor(({src}) / {1 << k}.0) AS BIGINT) % 2)"
                f" * {1 << (4 - t)}")
        v = " + ".join(terms)
        chars.append(f"substring('{GEOHASH_B32}', CAST({v} AS INT) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def geohash_col(qlat: str, qlon: str, precision: int = 6):
    """Column form of geohash_expr, by column NAME (the same generated
    expression string feeds both engines, so they agree byte-for-byte)."""
    from pyspark.sql import functions as F

    return F.expr(geohash_expr(qlat, qlon, precision))
