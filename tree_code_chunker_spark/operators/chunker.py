"""Core chunking operator: the reference window algebra over span sequences.

A document is an ordered sequence of spans ``(kind, text, media_ref, offset)``
(BASELINE input_hint).  Spans play the role of the reference's top-level AST
nodes; the document's canonical byte stream is the span payloads joined by
single ``\\n`` separators, where a media span's payload is the token
``<media:{media_ref}>``.  The window algebra is an exact re-expression of
/root/reference/chunking.go:

 * W1 greedy window assignment  — chunking.go:77-134
 * W2 oversized-leaf line split — chunking.go:137-197 (spans are leaves here,
   so an oversized span is split by lines with IsPartialNode=True and
   explicit LineRanges)
 * W3 adjacent-window merge     — chunking.go:214-242
 * W4 text rebuild              — chunking.go:252-310 (including the pinned
   trailing-'\\n' trim loop with endByte decrement, chunking.go:283-287, and
   the LineRanges override of the computed line range)

Spark packaging: ``chunk_documents(df)`` is a ``mapInPandas`` flatMap — each
input row (one document, spans nested in-row) independently produces N chunk
rows.  No shuffle, no groupBy: documents are the parallel unit, so this scales
linearly with executors at 10^12 docs (SURVEY.md §7.2).  The per-doc fold is
data-dependent sequential state and cannot be a SQL window function
(SURVEY.md §2.6); everything around it stays in built-in column ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from ..config import DEFAULT_MAX_CHUNK_SIZE, ChunkOptions
from ..functions.nws import count_nws, nws_cumsum, nws_range


def merge_row_options(base: ChunkOptions, row_opts) -> ChunkOptions:
    """Reference per-file option merge (codechunk.go:341-358), field for
    field: MaxChunkSize/OverlapLines inherit unless > 0, ContextMode/
    SiblingDetail/Language inherit unless non-empty, and FilterImports is
    overwritten UNCONDITIONALLY whenever a per-row options struct is present
    (the reference quirk — a bare struct resets it to its zero value false).

    row_opts: a mapping-like row (pandas struct cell) or None."""
    if row_opts is None:
        return base
    get = row_opts.get
    kw = {}
    v = get("max_chunk_size")
    if v is not None and int(v) > 0:
        kw["max_chunk_size"] = int(v)
    v = get("overlap_lines")
    if v is not None and int(v) > 0:
        kw["overlap_lines"] = int(v)
    for field in ("context_mode", "sibling_detail", "language"):
        v = get(field)
        if v:
            kw[field] = str(v)
    fi = get("filter_imports")
    kw["filter_imports"] = bool(fi) if fi is not None else False
    return base.merged(**kw)

MEDIA_TOKEN_FMT = "<media:{ref}>"
SPAN_SEP = "\n"


def span_payload(kind: str, text: str, media_ref: str) -> str:
    """Canonical byte payload of one span in the document stream."""
    if kind == "media":
        return MEDIA_TOKEN_FMT.format(ref=media_ref or "")
    return text or ""


def serialize_document(kinds, texts, refs) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Spans -> (doc_bytes, span byte starts, span byte ends).

    Payloads joined by a single '\\n'; offsets are byte offsets (UTF-8).
    """
    payloads = [
        span_payload(k, t, r).encode("utf-8")
        for k, t, r in zip(kinds, texts, refs)
    ]
    starts = np.zeros(len(payloads), dtype=np.int64)
    ends = np.zeros(len(payloads), dtype=np.int64)
    pos = 0
    for i, p in enumerate(payloads):
        starts[i] = pos
        pos += len(p)
        ends[i] = pos
        pos += 1  # separator
    doc = SPAN_SEP.encode().join(payloads)
    return doc, starts, ends


@dataclass
class _Window:
    """An assigned window: list of (span_idx, byte_start, byte_end, partial)."""

    items: list = field(default_factory=list)
    size: int = 0
    is_partial: bool = False
    line_ranges: list = field(default_factory=list)  # [(start_line, end_line)]


def _count_newlines(code: bytes, start: int, end: int) -> int:
    """Newline count in code[start:end] (chunking.go:200-211, clamped end)."""
    end = min(end, len(code))
    if end <= start:
        return 0
    return code.count(b"\n", start, end)


def _split_oversized_leaf(
    span_idx: int, start: int, end: int, code: bytes, max_size: int
) -> list[_Window]:
    """W2 — greedy line-packing of one oversized span (chunking.go:137-197).

    Exact parity notes: the running chunk length is measured in BYTES
    (``currentChunk.Len()``), each non-final line keeps its trailing '\\n',
    a line that does not fit starts a new chunk even if it alone exceeds
    max_size, and every emitted window is IsPartialNode with one LineRange
    computed by counting newlines from byte 0 of the document.
    """
    text = code[start:end]
    lines = text.split(b"\n")
    windows: list[_Window] = []
    cur_len = 0  # bytes in current chunk
    cur_size = 0  # NWS in current chunk
    chunk_start_offset = 0

    def emit(cur_len: int, cur_size: int, chunk_start_offset: int) -> None:
        s = start + chunk_start_offset
        e = s + cur_len
        start_line = _count_newlines(code, 0, s)
        end_line = _count_newlines(code, 0, e)
        windows.append(
            _Window(
                items=[(span_idx, s, e, True)],
                size=cur_size,
                is_partial=True,
                line_ranges=[(start_line, end_line)],
            )
        )

    for i, line in enumerate(lines):
        line_nws = count_nws(line)
        line_len = len(line) + (1 if i < len(lines) - 1 else 0)
        if cur_size + line_nws <= max_size:
            cur_len += line_len
            cur_size += line_nws
        else:
            if cur_len > 0:
                emit(cur_len, cur_size, chunk_start_offset)
            chunk_start_offset += cur_len
            cur_len = line_len
            cur_size = line_nws
    if cur_len > 0:
        emit(cur_len, cur_size, chunk_start_offset)
    return windows


def greedy_assign_windows(
    span_ranges: list[tuple[int, int, int]],
    code: bytes,
    cumsum: np.ndarray,
    max_size: int,
) -> list[_Window]:
    """W1 — greedy fold over spans in document order (chunking.go:77-134).

    span_ranges: [(span_idx, byte_start, byte_end)].  Rules, in order:
      (a) cur.size + span.size <= max  -> append to current window
      (b) span.size > max              -> flush current; line-split the span
                                          (spans are leaves — no children)
      (c) else                         -> flush current; start new with span
    Trailing window flushed.
    """
    windows: list[_Window] = []
    cur = _Window()
    for idx, s, e in span_ranges:
        size = nws_range(cumsum, s, e)
        if cur.size + size <= max_size:
            cur.items.append((idx, s, e, False))
            cur.size += size
        elif size > max_size:
            if cur.items:
                windows.append(cur)
                cur = _Window()
            windows.extend(_split_oversized_leaf(idx, s, e, code, max_size))
        else:
            if cur.items:
                windows.append(cur)
            cur = _Window(items=[(idx, s, e, False)], size=size)
    if cur.items:
        windows.append(cur)
    return windows


def merge_adjacent_windows(windows: list[_Window], max_size: int) -> list[_Window]:
    """W3 — single left-to-right merge pass (chunking.go:214-242)."""
    if not windows:
        return windows
    merged: list[_Window] = []
    cur = windows[0]
    for nxt in windows[1:]:
        if cur.size + nxt.size <= max_size:
            cur = _Window(
                items=cur.items + nxt.items,
                size=cur.size + nxt.size,
                is_partial=cur.is_partial or nxt.is_partial,
                line_ranges=cur.line_ranges + nxt.line_ranges,
            )
        else:
            merged.append(cur)
            cur = nxt
    merged.append(cur)
    return merged


def rebuild_text(win: _Window, code: bytes) -> tuple[str, int, int, int, int]:
    """W4 — (text, byte_start, byte_end, line_start, line_end).

    chunking.go:252-310: range = [min starts, max ends) clamped; ALL trailing
    newlines trimmed with byte_end decremented per trim; line range from
    newline counts, overridden by explicit LineRanges when present.
    """
    if not win.items:
        return "", 0, 0, 0, 0
    start = min(it[1] for it in win.items)
    end = max(it[2] for it in win.items)
    end = min(end, len(code))
    start = max(start, 0)
    while end > start and code[end - 1 : end] == b"\n":
        end -= 1
    text = code[start:end].decode("utf-8", errors="replace")
    start_line = _count_newlines(code, 0, start)
    end_line = _count_newlines(code, 0, end)
    if win.line_ranges:
        start_line = win.line_ranges[0][0]
        end_line = win.line_ranges[-1][1]
    return text, start, end, start_line, end_line


def chunk_spans_py(
    kinds: list[str],
    texts: list[str],
    refs: list[str],
    orders: list[int],
    max_size: int = DEFAULT_MAX_CHUNK_SIZE,
) -> list[dict]:
    """Full per-document fold: serialize -> W1 -> W3 -> W4 -> chunk dicts.

    Output chunk dict: chunk_index, total_chunks, text, byte_start, byte_end,
    line_start, line_end, nws_size, is_partial, spans=[{kind, text, media_ref,
    order, part, parts}] where split spans appear as fragments (part k of n)
    whose concatenation in (chunk_index, part) order restores the payload —
    the span-sequence equality invariant.
    """
    order_ix = np.argsort(np.asarray(orders, dtype=np.int64), kind="stable")
    kinds = [kinds[i] for i in order_ix]
    texts = [texts[i] for i in order_ix]
    refs = [refs[i] for i in order_ix]
    orders = [int(orders[i]) for i in order_ix]

    code, starts, ends = serialize_document(kinds, texts, refs)
    cumsum = nws_cumsum(code)
    ranges = [(i, int(starts[i]), int(ends[i])) for i in range(len(kinds))]
    windows = merge_adjacent_windows(
        greedy_assign_windows(ranges, code, cumsum, max_size), max_size
    )

    # fragment counts per span (for part/parts bookkeeping)
    frag_total: dict[int, int] = {}
    for w in windows:
        for idx, _s, _e, _p in w.items:
            frag_total[idx] = frag_total.get(idx, 0) + 1

    out: list[dict] = []
    frag_seen: dict[int, int] = {}
    total = len(windows)
    for ci, w in enumerate(windows):
        text, bs, be, ls, le = rebuild_text(w, code)
        spans = []
        for idx, s, e, partial in w.items:
            part = frag_seen.get(idx, 0)
            frag_seen[idx] = part + 1
            parts = frag_total[idx]
            if parts == 1:
                frag_text = texts[idx] if kinds[idx] == "text" else ""
            else:
                # split spans (text OR media) keep the byte-slice fragment so
                # concatenation in (chunk_index, part) order restores the
                # payload — the span-sequence equality invariant holds for
                # every kind, not just text
                frag_text = code[s:e].decode("utf-8", errors="replace")
            spans.append(
                {
                    "kind": kinds[idx],
                    "text": frag_text,
                    "media_ref": refs[idx] if kinds[idx] == "media" else "",
                    "order": orders[idx],
                    "part": part,
                    "parts": parts,
                }
            )
        out.append(
            {
                "chunk_index": ci,
                "total_chunks": total,
                "text": text,
                "byte_start": bs,
                "byte_end": be,
                "line_start": ls,
                "line_end": le,
                "nws_size": w.size,
                "is_partial": w.is_partial,
                "spans": spans,
            }
        )
    return out


CHUNK_SCHEMA = (
    "doc_id string, chunk_index int, total_chunks int, text string, "
    "byte_start bigint, byte_end bigint, line_start int, line_end int, "
    "nws_size int, is_partial boolean, "
    "spans array<struct<kind:string,text:string,media_ref:string,"
    "order:int,part:int,parts:int>>, error string"
)


def chunk_documents(
    df,
    max_size: int = DEFAULT_MAX_CHUNK_SIZE,
    streaming: bool = False,
    options_col: str | None = None,
    progress=None,
):
    """documents(doc_id, spans) -> chunks DataFrame via mapInPandas.

    One doc row in -> N chunk rows out (UDTF-shaped, like reference
    codechunk.go:43 Chunk: 1 file -> N chunks).

    Per-row error isolation as in ChunkBatch (codechunk.go:295-391,
    codechunk_test.go:297-318: other rows still succeed): a failing document
    yields one row with `error` set and chunk_index = -1; successful chunks
    carry error = null — the job itself never fails on bad input.

    Per-row option override (codechunk.go:342-359, zero-means-inherit): pass
    options_col naming a struct column with a nullable `max_chunk_size`
    field; null inherits the session-level max_size.

    streaming=True stamps total_chunks = -1 (the ChunkStream sentinel,
    codechunk.go:284) since a global per-doc count is unknown mid-stream.

    progress: optional Spark accumulator incremented once per processed
    document (≙ reference ChunkBatch's mutex-protected completed counter +
    OnProgress callback, codechunk.go:377-382 — A5).
    """

    cols = [
        "doc_id", "chunk_index", "total_chunks", "text",
        "byte_start", "byte_end", "line_start", "line_end",
        "nws_size", "is_partial", "spans", "error",
    ]

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation (list-of-dicts -> DataFrame was ~30% of
            # the chunk stage's time at small doc sizes)
            out: dict[str, list] = {c: [] for c in cols}
            opts = pdf[options_col] if options_col is not None else None
            base = ChunkOptions(max_chunk_size=max_size)
            for i, (doc_id, spans) in enumerate(zip(pdf["doc_id"], pdf["spans"])):
                row_max = max_size
                if opts is not None:
                    row_max = merge_row_options(base, opts.iloc[i]).max_chunk_size
                try:
                    spans = list(spans)
                    chunks = chunk_spans_py(
                        [s["kind"] for s in spans],
                        [s["text"] for s in spans],
                        [s["media_ref"] for s in spans],
                        [s["offset"] for s in spans],
                        row_max,
                    )
                except Exception as e:  # row-level isolation
                    for c, v in (("doc_id", doc_id), ("chunk_index", -1),
                                 ("total_chunks", 0), ("text", ""),
                                 ("byte_start", 0), ("byte_end", 0),
                                 ("line_start", 0), ("line_end", 0),
                                 ("nws_size", 0), ("is_partial", False),
                                 ("spans", []), ("error", str(e)[:500])):
                        out[c].append(v)
                    continue
                for c in chunks:
                    out["doc_id"].append(doc_id)
                    out["chunk_index"].append(c["chunk_index"])
                    out["total_chunks"].append(-1 if streaming
                                               else c["total_chunks"])
                    out["text"].append(c["text"])
                    out["byte_start"].append(c["byte_start"])
                    out["byte_end"].append(c["byte_end"])
                    out["line_start"].append(c["line_start"])
                    out["line_end"].append(c["line_end"])
                    out["nws_size"].append(c["nws_size"])
                    out["is_partial"].append(c["is_partial"])
                    out["spans"].append(c["spans"])
                    out["error"].append(None)
                if progress is not None:
                    progress.add(1)
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(fn, schema=CHUNK_SCHEMA)


def chunk_documents_binary(
    df,
    payload_col: str = "payload",
    max_size: int = DEFAULT_MAX_CHUNK_SIZE,
    **kw,
):
    """S2 ChunkBytes analog (codechunk.go:52-58): documents arriving as a
    raw BYTES column instead of pre-split spans.  The payload is decoded
    (UTF-8) and wrapped as a single text span entirely in JVM column ops —
    no extra Python pass — then flows through the same chunk fold, so a
    bytes-sourced document produces chunks identical to the string path."""
    from pyspark.sql import functions as F

    spans = F.array(F.struct(
        F.lit("text").alias("kind"),
        F.decode(F.col(payload_col), "UTF-8").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("offset"),
    ))
    docs = df.select(F.col("doc_id").cast("string").alias("doc_id"),
                     spans.alias("spans"))
    return chunk_documents(docs, max_size=max_size, **kw)
