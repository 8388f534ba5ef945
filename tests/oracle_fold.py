"""Independent, deliberately-naive single-process oracle of the reference
window algebra (W1-W4, /root/reference/chunking.go) — written WITHOUT the
engine's cumsum/vectorization so implementation bugs don't cancel out.

Used by tests to pin span-sequence equality (FIXTURES.md §1)."""

from __future__ import annotations


def nws(s: bytes) -> int:
    return sum(1 for b in s if b > 32)


def oracle_chunks(kinds, texts, refs, orders, max_size):
    """Returns list of (text, byte_start, byte_end, size, is_partial,
    line_start, line_end)."""
    idx = sorted(range(len(orders)), key=lambda i: orders[i])
    kinds = [kinds[i] for i in idx]
    texts = [texts[i] for i in idx]
    refs = [refs[i] for i in idx]

    payloads = []
    for k, t, r in zip(kinds, texts, refs):
        payloads.append((f"<media:{r}>" if k == "media" else (t or "")).encode())
    code = b"\n".join(payloads)
    spans = []
    pos = 0
    for p in payloads:
        spans.append((pos, pos + len(p)))
        pos += len(p) + 1

    # W1 greedy assignment (+ W2 line split), windows = (items, size, partial, lranges)
    windows = []
    cur, cur_size = [], 0
    for (s, e) in spans:
        size = nws(code[s:e])
        if cur_size + size <= max_size:
            cur.append((s, e))
            cur_size += size
        elif size > max_size:
            if cur:
                windows.append((cur, cur_size, False, []))
                cur, cur_size = [], 0
            # line split
            lines = code[s:e].split(b"\n")
            buf, bufsize, off = b"", 0, 0
            pieces = []
            for i, line in enumerate(lines):
                lw = line + (b"\n" if i < len(lines) - 1 else b"")
                ln = nws(line)
                if bufsize + ln <= max_size:
                    buf += lw
                    bufsize += ln
                else:
                    if len(buf) > 0:
                        pieces.append((off, len(buf), bufsize))
                    off += len(buf)
                    buf, bufsize = lw, ln
            if len(buf) > 0:
                pieces.append((off, len(buf), bufsize))
            for off, ln_, sz in pieces:
                a, b = s + off, s + off + ln_
                lr = (code[:a].count(b"\n"), code[:b].count(b"\n"))
                windows.append(([(a, b)], sz, True, [lr]))
        else:
            if cur:
                windows.append((cur, cur_size, False, []))
            cur, cur_size = [(s, e)], size
    if cur:
        windows.append((cur, cur_size, False, []))

    # W3 merge
    merged = []
    curw = windows[0] if windows else None
    for nxt in windows[1:]:
        if curw[1] + nxt[1] <= max_size:
            curw = (curw[0] + nxt[0], curw[1] + nxt[1],
                    curw[2] or nxt[2], curw[3] + nxt[3])
        else:
            merged.append(curw)
            curw = nxt
    if curw:
        merged.append(curw)

    # W4 rebuild
    out = []
    for items, size, partial, lranges in merged:
        start = min(a for a, _ in items)
        end = min(max(b for _, b in items), len(code))
        start = max(start, 0)
        while end > start and code[end - 1:end] == b"\n":
            end -= 1
        text = code[start:end].decode("utf-8", errors="replace")
        ls = code[:start].count(b"\n")
        le = code[:end].count(b"\n")
        if lranges:
            ls, le = lranges[0][0], lranges[-1][1]
        out.append((text, start, end, size, partial, ls, le))
    return out
