"""PII redaction: pattern semantics, chain order, and engine<->DuckDB
dialect agreement on adversarial inputs (the mirror must match
byte-for-byte or the gate hash check would be meaningless)."""

import duckdb
import pandas as pd

from tree_code_chunker_spark.operators.textstats import (
    redact_pii,
    redact_pii_sql,
)

CASES = [
    (0, "reach me at alice.smith+x@sub.example.co.uk today"),
    (1, "server 10.0.255.7 and fallback 192.168.1.1"),
    (2, "tel 555-123-4567 or 555.123.4567 x89"),
    (3, "embedded u@10.0.0.7.net host counts as email only"),
    (10, "numeric host user@10.0.0.7 is no email; its quad is an ip"),
    (4, "no pii here, just 12345 and a.b"),
    (5, "edge 999.999.999.999 still dotted-quad shaped"),
    (6, "a@b.co minimal and trailing dot user@x.org."),
    (7, "unicode héllo@exämple.com ascii-only classes"),
    (8, "two mails x@y.io z@w.ai and ip 1.2.3.4.5 run-on"),
    (9, ""),
]


def test_redact_known_cases(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r.id: (r.redacted, r.n_email, r.n_phone, r.n_ipv4)
           for r in redact_pii(df).collect()}
    assert got[0] == ("reach me at <EMAIL> today", 1, 0, 0)
    assert got[1] == ("server <IP> and fallback <IP>", 0, 0, 2)
    assert got[2] == ("tel <PHONE> or <PHONE> x89", 0, 2, 0)
    # chain order: the email (incl. its dotted-quad host part) goes first
    assert got[3] == ("embedded <EMAIL> host counts as email only", 1, 0, 0)
    # a purely numeric host fails the alphabetic-TLD requirement: the
    # address is NOT an email and its dotted quad is typed as an ip
    assert got[10] == (
        "numeric host user@<IP> is no email; its quad is an ip", 0, 0, 1)
    assert got[4] == ("no pii here, just 12345 and a.b", 0, 0, 0)
    # 999.999... is dotted-quad SHAPED; the scrubber is shape-based
    assert got[5][3] == 1
    assert got[8][1] == 2 and got[8][3] == 1
    assert got[9] == ("", 0, 0, 0)


def test_engine_matches_duckdb_mirror(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    eng = (redact_pii(df).toPandas()
           .sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(CASES, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_pd")
    ora = (con.execute(redact_pii_sql("documents")).fetchdf()
           .sort_values("id").reset_index(drop=True))
    for c in ("redacted", "n_email", "n_phone", "n_ipv4"):
        assert list(eng[c]) == list(ora[c]), c
