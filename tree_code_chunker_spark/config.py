"""Engine configuration, mirroring the reference defaults.

Reference: ChunkOptions defaults at /root/reference/types.go:171-189 and
re-application at codechunk.go:122-133 — MaxChunkSize=1500 NWS chars,
ContextMode=full, SiblingDetail=signatures, FilterImports=false,
OverlapLines=10.  Batch adds Concurrency=10 (types.go:206-218) — in Spark the
task scheduler plays that role, so Concurrency maps to partition count.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

DEFAULT_MAX_CHUNK_SIZE = 1500  # NWS chars             (types.go:183)
DEFAULT_OVERLAP_LINES = 10  # lines of prev chunk      (types.go:187)
DEFAULT_CONTEXT_MODE = "full"  # none|minimal|full     (types.go:155-159)
DEFAULT_SIBLING_DETAIL = "signatures"  # none|names|signatures (types.go:164-168)
DEFAULT_FILTER_IMPORTS = False  # keep only used imports (types.go:180)
MAX_SIBLINGS = 3  # per side                           (codechunk.go:593)
IMPORT_HEADER_CAP = 10  # names in '# Uses:'           (codechunk.go:538-541)

# Geospatial engine constants (target engine; no reference counterpart).
GRID_BITS = 16  # quantized lat/lon grid is 2^16 x 2^16
MAX_RES = GRID_BITS  # Morton cell resolution r in [0, 16]
DEFAULT_CELL_RES = 12
TILE_ZOOMS = (4, 8, 12)


@dataclass(frozen=True)
class ChunkOptions:
    """Spark-side equivalent of reference ChunkOptions (types.go:171-189).

    Zero-value-means-inherit merge semantics (codechunk.go:342-359) are
    modeled by `merged()` treating None as "inherit from session default".
    """

    max_chunk_size: int = DEFAULT_MAX_CHUNK_SIZE
    context_mode: str = DEFAULT_CONTEXT_MODE
    sibling_detail: str = DEFAULT_SIBLING_DETAIL
    filter_imports: bool = DEFAULT_FILTER_IMPORTS
    overlap_lines: int = DEFAULT_OVERLAP_LINES
    language: str | None = None  # forced language; None/"" = auto-detect
    # (types.go:174 Language, merged per file at codechunk.go:352-354)

    def merged(self, **overrides) -> "ChunkOptions":
        """Field-wise merge: None means inherit (codechunk.go:737-760)."""
        return replace(
            self, **{k: v for k, v in overrides.items() if v is not None}
        )


DEFAULT_OPTIONS = ChunkOptions()
