"""User-facing façade: the reference's reusable `Chunker` surface on Spark.

Reference correspondence (codechunk.go:722-760): a Chunker holds default
ChunkOptions; each call may pass overrides merged with zero-means-inherit —
ints merge when > 0, strings when non-empty, and FilterImports merges ONLY
WHEN TRUE.  Note this is deliberately DIFFERENT from the per-file batch
merge (codechunk.go:341-358), where a present options struct overwrites
FilterImports unconditionally — both reference quirks are preserved
(chunker.merge_row_options carries the batch one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .config import ChunkOptions
from .operators.chunker import chunk_documents, chunk_documents_binary
from .operators.entities import _PATTERNS, chunk_documents_with_context


def is_language_supported(lang: str) -> bool:
    """Reference IsLanguageSupported (languages.go:45-57): the six grammars."""
    return lang in _PATTERNS


class SparkChunker:
    """Reusable chunker instance with default options."""

    def __init__(self, options: ChunkOptions | None = None):
        self.options = options or ChunkOptions()

    def merged(self, **overrides) -> ChunkOptions:
        """Per-call merge, reference Chunker.Chunk semantics
        (codechunk.go:737-758)."""
        kw = {}
        for field in ("max_chunk_size", "overlap_lines"):
            v = overrides.get(field)
            if v is not None and v > 0:
                kw[field] = v
        for field in ("context_mode", "sibling_detail", "language"):
            v = overrides.get(field)
            if v:
                kw[field] = v
        if overrides.get("filter_imports"):  # true-only override
            kw["filter_imports"] = True
        return self.options.merged(**kw)

    def chunk(self, df: DataFrame, **overrides) -> DataFrame:
        """documents(doc_id, spans) -> chunk rows (W1-W4 fold)."""
        o = self.merged(**overrides)
        return chunk_documents(df, max_size=o.max_chunk_size)

    def chunk_bytes(self, df: DataFrame, payload_col: str = "payload",
                    **overrides) -> DataFrame:
        """documents(doc_id, payload binary) -> chunk rows (S2 ChunkBytes)."""
        o = self.merged(**overrides)
        return chunk_documents_binary(df, payload_col=payload_col,
                                      max_size=o.max_chunk_size)

    def chunk_with_context(self, df: DataFrame, filepath_col=None,
                           lang_col=None, options_col=None,
                           **overrides) -> DataFrame:
        """Fused chunk + entities/scope/siblings/imports + formatting."""
        o = self.merged(**overrides)
        return chunk_documents_with_context(
            df,
            max_size=o.max_chunk_size,
            overlap_lines=o.overlap_lines,
            context_mode=o.context_mode,
            filter_imports=o.filter_imports,
            sibling_detail=o.sibling_detail,
            language=o.language,
            filepath_col=filepath_col,
            lang_col=lang_col,
            options_col=options_col,
        )
