"""Pure string helpers mirroring reference scalar semantics (SURVEY.md §2.9).

These run inside pandas UDFs; the SQL-expressible ones also have Spark column
equivalents in functions/columns.py.  Cites point at the behavior being
matched, the implementations are fresh Python.
"""

from __future__ import annotations

import re

_WS_RUN = re.compile(r"[ \t\r\n]+")


def clean_signature(sig: str) -> str:
    """Newlines -> spaces, collapse whitespace runs, trim
    (reference signature.go:225-246)."""
    return _WS_RUN.sub(" ", sig).strip()


def strip_quotes(s: str) -> str:
    """Strip one MATCHING pair of \"/'/` quotes; needs len>=2 — a lone quote
    is NOT stripped (reference signature.go:356-365, pinned by
    signature_test.go:217-236)."""
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "\"'`":
        return s[1:-1]
    return s


def last_path_segments(path: str, n: int = 3) -> str:
    """Last n '/'-separated segments (reference codechunk.go:579-585)."""
    parts = path.split("/")
    return "/".join(parts[-n:]) if len(parts) > n else path


def last_segment(s: str) -> str:
    """Tail of a '::'-separated path (reference imports.go:230-237)."""
    return s.rsplit("::", 1)[-1]


def is_ident_start(c: str) -> bool:
    return c.isascii() and (c.isalpha() or c == "_")


def find_body_delimiter_pos(text: str, delimiter: str) -> int:
    """Stateful delimiter scan: quote-aware (escape-aware, same-char close),
    paren/bracket/angle depth tracking; `<` opens a generic-depth only when
    followed by ident-start/`>`/space/`<`; match only at depth 0.
    (reference signature.go:29-89; exact-position goldens
    coverage_test.go:1663-1690, e.g. 'func(a map[string]int) {}' -> 23.)
    """
    paren = bracket = angle = 0
    in_string = False
    string_char = ""
    for i, ch in enumerate(text):
        prev = text[i - 1] if i > 0 else ""
        if ch in "\"'`" and prev != "\\":
            if not in_string:
                in_string, string_char = True, ch
            elif ch == string_char:
                in_string, string_char = False, ""
            continue
        if in_string:
            continue
        if ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        elif ch == "[":
            bracket += 1
        elif ch == "]":
            bracket -= 1
        elif ch == "<":
            if i + 1 < len(text) and (
                is_ident_start(text[i + 1]) or text[i + 1] in "> <"
            ):
                angle += 1
        elif ch == ">":
            if angle > 0:
                angle -= 1
        if ch == delimiter and paren == 0 and bracket == 0 and angle == 0:
            return i
    return -1


BODY_DELIMITERS = {
    "typescript": "{",
    "javascript": "{",
    "python": ":",
    "rust": "{",
    "go": "{",
    "java": "{",
}


def _first_line(text: str) -> str:
    nl = text.find("\n")
    return text[:nl] if nl != -1 else text


def extract_signature(text: str, entity_type: str, lang: str) -> str:
    """Text-only signature dispatch (reference signature.go:131-217).

    function/method: cut at body delimiter (depth-0 scan); no delimiter ->
      whole text.  class/interface: same but no-delimiter falls back to the
      first line.  type/enum: cut at earliest of plain '=' index (NOT
      depth-aware — reference quirk), depth-aware '{', and depth-aware ':'
      for Python; fallback first line.  import/export: whole text.
      default: first line.
    """
    delim = BODY_DELIMITERS.get(lang, "{")
    if entity_type in ("function", "method"):
        pos = find_body_delimiter_pos(text, delim)
        if pos == -1:
            return clean_signature(text)
        return clean_signature(text[:pos].strip())
    if entity_type in ("class", "interface"):
        pos = find_body_delimiter_pos(text, delim)
        if pos == -1:
            return clean_signature(_first_line(text))
        return clean_signature(text[:pos].strip())
    if entity_type in ("type", "enum"):
        candidates = [p for p in (
            text.find("="),
            find_body_delimiter_pos(text, "{"),
            find_body_delimiter_pos(text, ":") if lang == "python" else -1,
        ) if p != -1]
        if not candidates:
            return clean_signature(_first_line(text))
        return clean_signature(text[: min(candidates)].strip())
    if entity_type in ("import", "export"):
        return clean_signature(text)
    return clean_signature(_first_line(text))
