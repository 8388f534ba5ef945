"""Doc-comment classification and cleaning (reference docstring.go).

Pinned truth table (docstring_test.go:129-165): '// line' IS a doc comment in
Go but NOT in TypeScript; Rust accepts ///, //!, /**, /*!; Python uses
triple-quoted strings.
"""

from __future__ import annotations

DOC_COMMENT_PREFIXES = {
    "typescript": ("/**", "///"),
    "javascript": ("/**", "///"),
    "python": ('"""', "'''"),
    "rust": ("///", "//!", "/**", "/*!"),
    "go": ("//", "/*"),
    "java": ("/**", "///"),
}


def is_doc_comment(text: str, lang: str) -> bool:
    """(reference docstring.go:31-44): trimmed text starts with a per-language
    doc prefix; unknown language -> False."""
    prefixes = DOC_COMMENT_PREFIXES.get(lang)
    if not prefixes:
        return False
    return text.strip().startswith(prefixes)


def _strip_prefix(line: str, *prefixes: str) -> str:
    for p in prefixes:
        if line.startswith(p):
            return line[len(p):]
    return line


def _strip_suffix(line: str, *suffixes: str) -> str:
    for s in suffixes:
        if line.endswith(s):
            return line[: -len(s)]
    return line


def clean_doc_comment(text: str, lang: str) -> str:
    """Strip comment markers per language and join non-empty lines with
    single spaces (reference docstring.go:143-197).

    Per-language rules (order matters — pinned by docstring_test.go):
      ts/js/java: whole-text /** ... */ and /// stripped first, then per-line
        trim + leading '*' strip;  go: per-line '//' strip;  rust: per-line
        ///, //!, /**, /*! prefixes and */ suffix and '*' strip;
      other languages: trimmed text unchanged.
    """
    text = text.strip()
    if lang in ("typescript", "javascript", "java"):
        text = _strip_prefix(text, "/**")
        text = _strip_suffix(text, "*/")
        text = _strip_prefix(text, "///")
        lines = []
        for line in text.split("\n"):
            line = _strip_prefix(line.strip(), "*").strip()
            if line:
                lines.append(line)
        return " ".join(lines)
    if lang == "go":
        lines = []
        for line in text.split("\n"):
            line = _strip_prefix(line.strip(), "//").strip()
            if line:
                lines.append(line)
        return " ".join(lines)
    if lang == "rust":
        lines = []
        for line in text.split("\n"):
            line = _strip_prefix(line.strip(), "///", "//!", "/**", "/*!")
            line = _strip_suffix(line, "*/")
            line = _strip_prefix(line, "*").strip()
            if line:
                lines.append(line)
        return " ".join(lines)
    return text


def clean_python_docstring(s: str) -> str | None:
    """Triple-quote strip + trim; empty -> None (docstring.go:84-96 —
    TrimPrefix/TrimSuffix once each, both quote styles)."""
    s = _strip_prefix(s, '"""', "'''")
    s = _strip_suffix(s, '"""', "'''")
    s = s.strip()
    return s or None
