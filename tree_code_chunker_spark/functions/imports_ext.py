"""Import-symbol extraction: one import statement -> N (name, source) rows.

Line-based re-expression of reference imports.go:10-278 +
signature.go:249-337 (the reference walks tree-sitter nodes; tree-sitter is
unavailable here, so these parse the statement text directly while matching
the reference's OUTPUT contract, pinned by imports_test.go goldens):

  go:     `import "fmt"`       -> [fmt], source fmt (path-tail naming)
          `import f "fmt"`     -> [f], source fmt
          `import ( "a" "b" )` -> [a, b] (block)
  python: `import a.b as c`    -> [c], source a.b
          `from m import x, y as z` -> [x, z], source m
          `from m import *`    -> [*]
  ts/js:  `import d from 'm'`  -> [d];  `import {a, b as c} from 'm'` -> [a, c]
          `import * as ns from 'm'` -> [ns]; bare `import 'm'` -> [import]
  rust:   `use std::io::Result;` -> [Result], source std::io::Result
          `use a::{c, d as e};`  -> [c, e];  `use a::*;` -> [*]
  java:   `import a.b.C;`      -> [C], source a.b.C
  fallback symbol when nothing extracted: 'import' ('use' never falls back
  to empty — reference imports.go:191-237).

This is the engine's UDTF-shaped operator: 1 row in -> N rows out
(== posexplode downstream, SURVEY.md §2.2 P14).
"""

from __future__ import annotations

import re

from .strings import last_segment, strip_quotes

_QUOTED = re.compile(r"""["'`]([^"'`]*)["'`]""")


def _go_path_name(path: str) -> str:
    return path.rsplit("/", 1)[-1]


def extract_import_symbols(text: str, lang: str) -> list[tuple[str, str]]:
    """statement text -> [(name, source)]."""
    text = text.strip()
    if lang == "go":
        m = re.match(r'import\s+\(\s*(.*)\s*\)\s*$', text, re.S)
        if m:  # spec list: names from path tails, per-spec alias honored
            out = []
            for spec in m.group(1).splitlines():
                spec = spec.strip()
                if not spec:
                    continue
                am = re.match(r'(?:(\w+|\.)\s+)?"([^"]*)"', spec)
                if am:
                    alias, path = am.group(1), am.group(2)
                    out.append((alias or _go_path_name(path), ""))
            return out or [("import", "")]
        am = re.match(r'import\s+(?:(\w+|\.)\s+)?"([^"]*)"', text)
        if am:
            alias, path = am.group(1), am.group(2)
            return [(alias or _go_path_name(path), path)]
        return [("import", "")]

    if lang == "python":
        m = re.match(r"from\s+([\w\.]+)\s+import\s+(.*)$", text)
        if m:
            source, items = m.group(1), m.group(2)
            out = []
            for item in items.split(","):
                item = item.strip().strip("()")
                if not item:
                    continue
                if item == "*":
                    out.append(("*", source))
                    continue
                am = re.match(r"([\w\.]+)(?:\s+as\s+(\w+))?$", item)
                if am:
                    out.append((am.group(2) or am.group(1), source))
            return out or [("import", source)]
        m = re.match(r"import\s+(.*)$", text)
        if m:
            out = []
            for item in m.group(1).split(","):
                item = item.strip()
                am = re.match(r"([\w\.]+)(?:\s+as\s+(\w+))?$", item)
                if am:
                    name = am.group(2) or am.group(1)
                    out.append((name, am.group(1)))
            return out or [("import", "")]
        return [("import", "")]

    if lang in ("typescript", "javascript"):
        srcm = _QUOTED.search(text)
        source = srcm.group(1) if srcm else ""
        out = []
        clause = re.match(r"import\s+(.*?)\s+from\s+", text)
        if clause:
            body = clause.group(1)
            ns = re.search(r"\*\s+as\s+(\w+)", body)
            if ns:
                out.append((ns.group(1), source))
            named = re.search(r"\{(.*?)\}", body, re.S)
            if named:
                for spec in named.group(1).split(","):
                    spec = spec.strip()
                    if not spec:
                        continue
                    am = re.match(r"(\w+)(?:\s+as\s+(\w+))?$", spec)
                    if am:
                        out.append((am.group(2) or am.group(1), source))
            default = re.match(r"(\w+)\s*(?:,|$)", body)
            if default and default.group(1) not in ("type",):
                out.insert(0, (default.group(1), source))
        return out or [("import", source)]

    if lang == "rust":
        m = re.match(r"use\s+(.*?);?\s*$", text)
        if not m:
            return [("use", "")]
        path = m.group(1).strip()
        grouped = re.match(r"(.*)::\{(.*)\}$", path, re.S)
        if grouped:
            prefix, items = grouped.group(1), grouped.group(2)
            out = []
            for item in items.split(","):
                item = item.strip()
                if not item:
                    continue
                am = re.match(r"([\w:\*]+)(?:\s+as\s+(\w+))?$", item)
                if am:
                    name = am.group(2) or last_segment(am.group(1))
                    out.append((name, f"{prefix}::{am.group(1)}"))
            return out or [("use", path)]
        am = re.match(r"(.*?)\s+as\s+(\w+)$", path)
        if am:
            return [(am.group(2), am.group(1))]
        if path.endswith("::*"):
            return [("*", path)]
        return [(last_segment(path) or "use", path)]

    if lang == "java":
        m = re.match(r"import\s+(?:static\s+)?([\w\.\*]+)\s*;?", text)
        if m:
            path = m.group(1)
            return [(path.rsplit(".", 1)[-1], path)]
        return [("import", "")]

    src = _QUOTED.search(text)
    return [("import", strip_quotes(src.group(0)) if src else "")]
