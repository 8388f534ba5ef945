"""Scalar golden tests ported from the reference's inline tables
(FIXTURES.md §6): signatures, delimiter positions, doc comments, imports,
path/quote helpers."""

import pytest

from tree_code_chunker_spark.functions.doccomment import (
    clean_doc_comment,
    clean_python_docstring,
    is_doc_comment,
)
from tree_code_chunker_spark.functions.imports_ext import extract_import_symbols
from tree_code_chunker_spark.functions.strings import (
    clean_signature,
    extract_signature,
    find_body_delimiter_pos,
    last_path_segments,
    last_segment,
    strip_quotes,
)


# reference coverage_test.go:1663-1690 — exact delimiter positions
@pytest.mark.parametrize(
    "text,delim,want",
    [
        ("func(a map[string]int) {}", "{", 23),
        ("func f() {}", "{", 9),
        ('func f(s string) { return "{" }', "{", 17),
        ("def f(x):", ":", 8),
        ("def f(d: dict):", ":", 14),  # ':' inside parens skipped
        ("no delimiter here", "{", -1),
        ("List<Map<String, Integer>> x {", "{", 29),
    ],
)
def test_find_body_delimiter_pos(text, delim, want):
    assert find_body_delimiter_pos(text, delim) == want


# reference signature_test.go:8-88 — exact signature strings
@pytest.mark.parametrize(
    "text,etype,lang,want",
    [
        ("func add(a, b int) int {\n\treturn a + b\n}", "function", "go",
         "func add(a, b int) int"),
        ("func (u *User) Greet() string {\n\treturn u.Name\n}", "method", "go",
         "func (u *User) Greet() string"),
        ("type User struct {\n\tName string\n}", "class", "go",
         "type User struct"),
        ("function greet(name: string): string {\n  return name;\n}",
         "function", "typescript", "function greet(name: string): string"),
        ("class Foo {\n  bar() {}\n}", "class", "typescript", "class Foo"),
        ("def add(a, b):\n    return a + b", "function", "python",
         "def add(a, b)"),
        ("type Alias = string", "type", "typescript", "type Alias"),
        ("import \"fmt\"", "import", "go", "import \"fmt\""),
    ],
)
def test_extract_signature(text, etype, lang, want):
    assert extract_signature(text, etype, lang) == want


# reference signature_test.go:196-215
@pytest.mark.parametrize(
    "sig,want",
    [
        ("func  add(a,\n\tb int)", "func add(a, b int)"),
        ("\r\nx   y\t z \r\n", "x y z"),
        ("already clean", "already clean"),
    ],
)
def test_clean_signature(sig, want):
    assert clean_signature(sig) == want


# reference signature_test.go:217-236 — lone quote NOT stripped
@pytest.mark.parametrize(
    "s,want",
    [
        ('"fmt"', "fmt"),
        ("'m'", "m"),
        ("`tpl`", "tpl"),
        ('"', '"'),          # len<2 -> unchanged (pinned quirk)
        ("'", "'"),
        ('"mismatch\'', '"mismatch\''),
        ("bare", "bare"),
    ],
)
def test_strip_quotes(s, want):
    assert strip_quotes(s) == want


# reference codechunk_test.go:513-532
@pytest.mark.parametrize(
    "path,want",
    [
        ("a/b/c/d/e.go", "c/d/e.go"),
        ("a/b.go", "a/b.go"),
        ("e.go", "e.go"),
        ("/x/y/z/w.py", "y/z/w.py"),
    ],
)
def test_last_path_segments(path, want):
    assert last_path_segments(path, 3) == want


def test_last_segment():
    assert last_segment("std::io::Result") == "Result"
    assert last_segment("plain") == "plain"


# reference docstring_test.go:129-165 truth table (// doc in Go, NOT in TS)
@pytest.mark.parametrize(
    "text,lang,want",
    [
        ("// plain comment", "go", True),
        ("/* block */", "go", True),
        ("// plain comment", "typescript", False),
        ("/** jsdoc */", "typescript", True),
        ("/// triple", "typescript", True),
        ("/// rust doc", "rust", True),
        ("//! inner doc", "rust", True),
        ("/*! inner block */", "rust", True),
        ("// not doc", "rust", False),
        ('"""py docstring"""', "python", True),
        ("'''py'''", "python", True),
        ("# hash", "python", False),
        ("/** javadoc */", "java", True),
        ("// line", "java", False),
    ],
)
def test_is_doc_comment(text, lang, want):
    assert is_doc_comment(text, lang) == want


@pytest.mark.parametrize(
    "text,lang,want",
    [
        ("// Add adds two ints\n// and returns the sum", "go",
         "Add adds two ints and returns the sum"),
        ("/**\n * Greets.\n * @param name x\n */", "java",
         "Greets. @param name x"),
        ("/// Does things\n/// carefully", "rust", "Does things carefully"),
        ("plain text", "python", "plain text"),
    ],
)
def test_clean_doc_comment(text, lang, want):
    assert clean_doc_comment(text, lang) == want


def test_clean_python_docstring():
    assert clean_python_docstring('"""doc"""') == "doc"
    assert clean_python_docstring("'''  doc  '''") == "doc"
    assert clean_python_docstring('""""""') is None


# reference imports_test.go:111-165, 304-368
@pytest.mark.parametrize(
    "text,lang,want_names,want_source",
    [
        ('import "fmt"', "go", ["fmt"], "fmt"),
        ('import f "fmt"', "go", ["f"], "fmt"),
        ('import (\n  "fmt"\n  "strings"\n)', "go", ["fmt", "strings"], ""),
        ('import "github.com/x/y"', "go", ["y"], "github.com/x/y"),
        ("import os.path as p", "python", ["p"], "os.path"),
        ("import os", "python", ["os"], "os"),
        ("from os import path, sep as s", "python", ["path", "s"], "os"),
        ("from os import *", "python", ["*"], "os"),
        ("import { useState as state } from 'react';", "typescript",
         ["state"], "react"),
        ("import React, { useState } from 'react';", "typescript",
         ["React", "useState"], "react"),
        ("import * as ns from 'mod';", "javascript", ["ns"], "mod"),
        ("import 'side-effect';", "javascript", ["import"], "side-effect"),
        ("use std::io::Result;", "rust", ["Result"], "std::io::Result"),
        ("use a::b::{c, d as e};", "rust", ["c", "e"], None),
        ("use a::*;", "rust", ["*"], "a::*"),
        ("import java.util.List;", "java", ["List"], "java.util.List"),
    ],
)
def test_extract_import_symbols(text, lang, want_names, want_source):
    got = extract_import_symbols(text, lang)
    assert [n for n, _ in got] == want_names
    if want_source is not None:
        assert got[0][1] == want_source


# reference signature_test.go:90-194 — Python (contains), Rust/Java (exact),
# driven through the line-grammar extractor end-to-end
@pytest.mark.parametrize(
    "code,lang,want,exact",
    [
        ("def hello():\n    pass", "python", "def hello()", False),
        ("def add(a: int, b: int) -> int:\n    return a + b", "python",
         "def add(a: int, b: int)", False),
        ("class User:\n    pass", "python", "class User", False),
        ("fn hello() {}", "rust", "fn hello()", True),
        ("fn add(a: i32, b: i32) -> i32 { a + b }", "rust",
         "fn add(a: i32, b: i32) -> i32", True),
        ("struct Point { x: i32, y: i32 }", "rust", "struct Point", True),
        ("class Main { void hello() {} }", "java", "class Main", True),
    ],
)
def test_entity_signature_goldens(code, lang, want, exact):
    from tree_code_chunker_spark.operators.entities import parse_entities

    ents = parse_entities(code, lang)
    assert ents, f"no entities for {code!r}"
    if exact:
        assert ents[0]["signature"] == want
    else:
        assert want in ents[0]["signature"]


def test_bpe_token_count_goldens(spark):
    """GPT-2-style pre-tokenizer count: Java (Spark) and RE2 (DuckDB)
    engines must agree; values pinned on punctuation-heavy goldens."""
    import duckdb
    from pyspark.sql import functions as F

    from tree_code_chunker_spark.operators.textstats import (
        bpe_token_count_col,
        bpe_token_count_sql,
    )

    samples = {
        "hello, world! it's 42 tokens?": 9,
        "a.b.c": 5,
        "": 0,
        "   ": 0,
        "code(x,y)": 6,
        "don't stop... #hash_tag 3.14!": 12,
    }
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r[0] for r in
           df.select(bpe_token_count_col(F.col("s"))).collect()]
    assert got == list(samples.values())
    con = duckdb.connect()
    q = bpe_token_count_sql("s")
    for s, want in samples.items():
        assert con.execute(f"SELECT {q} FROM (SELECT ? AS s)",
                           [s]).fetchone()[0] == want


def test_poly31_vectorized_matches_bigint_horner():
    """The chunked power-table poly31 must equal straightforward bigint
    Horner on short, boundary-length, and multi-chunk payloads."""
    import numpy as np

    from tree_code_chunker_spark.operators.media import POLY_MOD, poly31_bytes

    rng = np.random.RandomState(31)
    cases = [b"", b"a", b"ref://doc/4", bytes(rng.randint(0, 256, 255)),
             bytes(rng.randint(0, 256, 256)),
             bytes(rng.randint(0, 256, 65537)),
             bytes(rng.randint(0, 256, (1 << 23) + 3))]
    for payload in cases:
        want = 0
        for b in payload:
            want = (want * 31 + b) % POLY_MOD
        assert poly31_bytes(payload) == want, len(payload)
