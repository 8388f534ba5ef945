"""Non-whitespace (NWS) counting — byte semantics, numpy-vectorized.

Reference semantics (/root/reference/chunking.go:13-49):
 * a byte is whitespace iff its value <= 32 — this INCLUDES NUL and all
   control characters, and is defined on BYTES, not Unicode codepoints
   (multi-byte UTF-8 payload bytes are all > 32, so they each count).
 * ``preprocessNwsCumsum`` builds a prefix-sum array for O(1) range queries;
   ``getNwsCountFromCumsum`` clamps at both ends.

These run inside Arrow-batched UDFs (the Spark-column equivalent for plain
strings is ``F.length(F.regexp_replace(text, '[\\x00-\\x20]', ''))``, see
functions/columns.py).
"""

from __future__ import annotations

import numpy as np

WS_MAX = 32  # byte values <= 32 are whitespace (chunking.go:23-25)


def count_nws(text: str | bytes) -> int:
    """Count of bytes with value > 32 (chunking.go:13-21)."""
    if isinstance(text, str):
        text = text.encode("utf-8")
    if not text:
        return 0
    arr = np.frombuffer(text, dtype=np.uint8)
    return int((arr > WS_MAX).sum())


def nws_cumsum(code: bytes) -> np.ndarray:
    """Prefix-sum array of length len(code)+1; cumsum[i] = NWS of code[:i].

    (chunking.go:28-39 — O(n) preprocess enabling O(1) range queries.)
    """
    out = np.zeros(len(code) + 1, dtype=np.int64)
    if code:
        arr = np.frombuffer(code, dtype=np.uint8)
        np.cumsum(arr > WS_MAX, out=out[1:])
    return out


def nws_range(cumsum: np.ndarray, start: int, end: int) -> int:
    """NWS count of code[start:end], clamped at both ends (chunking.go:42-49)."""
    n = len(cumsum) - 1
    if end > n:
        end = n
    if start < 0:
        start = 0
    if end < start:
        return 0
    return int(cumsum[end] - cumsum[start])
