"""Entity/scope/context semantics vs reference contracts (scope_test.go
truth tables, codechunk_test.go formatting contract)."""

import pytest

from tree_code_chunker_spark.operators.entities import (
    assign_scope_parents,
    detect_language,
    entities_in_range,
    format_chunk_with_context,
    overlap_from_prev,
    parse_entities,
    relevant_imports,
    scope_chain_at,
    siblings_for,
)


def _ent(type_, name, bs, be, sig="", src=None):
    return {"type": type_, "name": name, "signature": sig, "docstring": None,
            "source": src, "byte_start": bs, "byte_end": be,
            "line_start": 0, "line_end": 0, "parent": None}


# reference scope_test.go:7-27 — containment truth table
# rangeContains(outer, inner) == outer.start <= inner.start && inner.end <= outer.end
@pytest.mark.parametrize(
    "outer,inner,contained",
    [
        ((0, 100), (10, 50), True),
        ((0, 100), (0, 100), True),   # equal ranges contain
        ((10, 50), (0, 100), False),
        ((0, 50), (40, 60), False),   # overlap but not contained
        ((50, 100), (0, 49), False),
    ],
)
def test_containment(outer, inner, contained):
    ents = [_ent("function", "outer", *outer), _ent("function", "inner", *inner)]
    parents = assign_scope_parents(ents)
    if contained and outer != inner:
        assert parents[1] == 0
    elif outer == inner:
        # insertion order: first-at-same-start becomes the parent of second
        assert parents[1] == 0
    else:
        assert parents[1] in (-1, 0) if inner[0] <= outer[0] else parents[1] == -1


def test_deepest_parent_wins():
    ents = [
        _ent("class", "Outer", 0, 200),
        _ent("function", "mid", 10, 150),
        _ent("function", "inner", 20, 100),
    ]
    parents = assign_scope_parents(ents)
    assert parents == [-1, 0, 1]


# reference scope_test.go:140-214 — offset probes: gap => no scope;
# nested offset => innermost-first chain
def test_scope_at_offset():
    ents = [
        _ent("function", "a", 0, 50),
        _ent("function", "b", 60, 120),
        _ent("class", "C", 130, 300),
        _ent("method", "m", 140, 200),
    ]
    parents = assign_scope_parents(ents)
    assert [e["name"] for e in scope_chain_at(ents, parents, 55)] == []  # gap
    assert [e["name"] for e in scope_chain_at(ents, parents, 150)] == ["m", "C"]
    assert [e["name"] for e in scope_chain_at(ents, parents, 49)] == ["a"]
    assert [e["name"] for e in scope_chain_at(ents, parents, 50)] == []  # end-exclusive


def test_entities_in_range_partial_flag():
    # codechunk.go:631-651: overlap predicate + is_partial
    ents = [_ent("function", "f", 10, 90)]
    got = entities_in_range(ents, 0, 100)
    assert got[0]["is_partial"] is False
    got = entities_in_range(ents, 20, 100)
    assert got[0]["is_partial"] is True
    assert entities_in_range(ents, 90, 100) == []  # end-exclusive


def test_siblings_first_in_doc_order():
    # codechunk.go:653-689: first 3 per side by document order, imports skipped
    ents = [_ent("import", "fmt", 0, 5)] + [
        _ent("function", f"f{i}", i * 10 + 10, i * 10 + 18) for i in range(6)
    ]
    sibs = siblings_for(ents, 100, 110)
    before = [s for s in sibs if s["position"] == "before"]
    assert [s["name"] for s in before] == ["f0", "f1", "f2"]
    assert [s["distance"] for s in before] == [1, 2, 3]


def test_relevant_imports_semi_join():
    # codechunk.go:691-720: name equality OR signature contains
    ents = [
        _ent("import", "fmt", 0, 5, src="fmt"),
        _ent("import", "os", 6, 10, src="os"),
        _ent("import", "unused", 11, 20, src="x"),
    ]
    chunk_ents = [
        {"name": "main", "signature": "func main() { fmt.Println }", "type": "function"},
        {"name": "os", "signature": "", "type": "function"},
    ]
    got = relevant_imports(chunk_ents, ents, True)
    assert [i["name"] for i in got] == ["fmt", "os"]
    got_all = relevant_imports(chunk_ents, ents, False)
    assert [i["name"] for i in got_all] == ["fmt", "os", "unused"]


# codechunk_test.go:441-511 — formatting contract
def test_format_empty_context_identity():
    assert format_chunk_with_context("raw text") == "raw text"


def test_format_header_order_and_inversion():
    out = format_chunk_with_context(
        "body",
        filepath="r/a/b/c/d.go",
        scope=[{"name": "inner"}, {"name": "outer"}],  # innermost-first in
        entities=[
            {"name": "f", "type": "function", "signature": "func f()"},
            {"name": "fmt", "type": "import", "signature": "import \"fmt\""},
        ],
        imports=[{"name": f"i{k}", "source": ""} for k in range(12)],
        siblings=[
            {"name": "pre", "position": "before"},
            {"name": "post", "position": "after"},
        ],
        overlap_text="prev1\nprev2",
    )
    lines = out.split("\n")
    assert lines[0] == "# b/c/d.go"                      # last 3 segments
    assert lines[1] == "# Scope: outer > inner"          # reversed
    assert lines[2] == "# Defines: func f()"             # imports excluded
    assert lines[3] == "# Uses: " + ", ".join(f"i{k}" for k in range(10))  # cap 10
    assert lines[4] == "# After: pre"                    # inversion pinned
    assert lines[5] == "# Before: post"
    assert lines[6] == ""
    assert lines[7] == "# ..."
    assert lines[8:10] == ["prev1", "prev2"]
    assert lines[10] == "# ---"
    assert lines[11] == "body"


def test_overlap_from_prev_clamped():
    assert overlap_from_prev("a\nb\nc", 10) == "a\nb\nc"
    assert overlap_from_prev("a\nb\nc", 2) == "b\nc"
    assert overlap_from_prev(None, 5) == ""
    assert overlap_from_prev("x", 0) == ""


def test_parse_entities_go_golden():
    code = ('import "fmt"\n\n// Add adds\nfunc Add(a, b int) int {\n'
            '\treturn a + b\n}\n')
    ents = parse_entities(code, "go")
    assert [(e["type"], e["name"]) for e in ents] == [
        ("import", "fmt"), ("function", "Add")]
    assert ents[1]["signature"] == "func Add(a, b int) int"
    assert ents[1]["docstring"] == "Add adds"


def test_parse_entities_python_method():
    code = ("class A:\n    def m(self):\n        return 1\n\ndef f():\n"
            "    pass\n")
    ents = parse_entities(code, "python")
    types = {e["name"]: e["type"] for e in ents}
    assert types == {"A": "class", "m": "method", "f": "function"}
    assert ents[1]["parent"] == "A"


def test_detect_language():
    assert detect_language("func main() {}", None) == "go"
    assert detect_language("def f():\n    pass") == "python"
    assert detect_language("whatever", "x/y/z.rs") == "rust"
    assert detect_language("no markers at all") == "unknown"
