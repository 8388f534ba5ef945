"""Spark Column equivalents of the §2.9 scalar surface (JVM-side, no
Python), each with a DuckDB SQL mirror for the oracle gate.

Reference semantics: cleanSignature (signature.go:225-246), stripQuotes
(signature.go:356-365 — lone quote NOT stripped), getLastPathSegments
(codechunk.go:579-585), getLastSegment (imports.go:230-237), docstring
null-on-empty (docstring.go:91-93).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def clean_signature_col(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"[ \t\r\n]+", " "))


def clean_signature_sql(c: str) -> str:
    return f"trim(regexp_replace({c}, '[ \\t\\r\\n]+', ' ', 'g'))"


def strip_quotes_col(name: str) -> Column:
    c = F.col(name)
    first = F.substring(c, 1, 1)
    last = F.substring(c, -1, 1)
    matched = (
        (F.length(c) >= 2) & (first == last) & first.isin('"', "'", "`")
    )
    return F.when(
        matched, F.substring(c, 2, F.length(c) - 2)
    ).otherwise(c)


def strip_quotes_sql(c: str) -> str:
    return (
        f"CASE WHEN length({c}) >= 2 AND substring({c}, 1, 1) = "
        f"substring({c}, length({c}), 1) AND substring({c}, 1, 1) IN "
        f"('\"', '''', '`') THEN substring({c}, 2, length({c}) - 2) "
        f"ELSE {c} END"
    )


def last_path_segments_col(name: str, n: int = 3) -> Column:
    c = F.col(name)
    parts = F.split(c, "/")
    return F.when(
        F.size(parts) > n, F.concat_ws("/", F.slice(parts, -n, n))
    ).otherwise(c)


def last_path_segments_sql(c: str, n: int = 3) -> str:
    return (
        f"CASE WHEN len(string_split({c}, '/')) > {n} THEN "
        f"array_to_string(string_split({c}, '/')[-{n}:], '/') ELSE {c} END"
    )


def last_segment_col(name: str) -> Column:
    return F.element_at(F.split(F.col(name), "::"), -1)


def last_segment_sql(c: str) -> str:
    return f"string_split({c}, '::')[-1]"


def nullif_empty_col(name: str) -> Column:
    return F.nullif(F.col(name), F.lit(""))


def nullif_empty_sql(c: str) -> str:
    return f"nullif({c}, '')"
