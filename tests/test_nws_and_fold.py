"""Golden scalar tests (ported verbatim from the reference's inline tables)
plus span-sequence equality of the engine fold vs the naive oracle.

Reference tables: chunking_test.go:9-48 (NWS), :50-99 (cumsum),
:144-180 (merge arithmetic); coverage_test.go:1774-1793.
"""

import numpy as np
import pytest

from tree_code_chunker_spark.functions.nws import count_nws, nws_cumsum, nws_range
from tree_code_chunker_spark.operators.chunker import (
    _Window,
    chunk_spans_py,
    merge_adjacent_windows,
    serialize_document,
)
from tests.oracle_fold import oracle_chunks


# reference chunking_test.go:9-48 — whitespace is byte<=32 incl. controls
@pytest.mark.parametrize(
    "text,want",
    [
        ("", 0),
        ("    ", 0),
        ("\t\n\r ", 0),
        ("abc", 3),
        ("a b c", 3),
        ("\t\n  test\t\n", 4),
        ("hello world", 10),
        ("a\x00b", 2),      # NUL is whitespace (c<=32)
        ("a\x1fb", 2),      # control char is whitespace
        ("a!b", 3),         # '!' (33) is NWS
        ("héllo", 6),       # byte semantics: é is 2 UTF-8 bytes, both >32
    ],
)
def test_count_nws(text, want):
    assert count_nws(text) == want


def test_cumsum_range():
    # reference chunking_test.go:50-99 — clamped range queries
    code = b"\t\n  test\t\nabc"
    cs = nws_cumsum(code)
    assert nws_range(cs, 0, len(code)) == 7
    assert nws_range(cs, 0, 4) == 0
    assert nws_range(cs, 4, 8) == 4
    assert nws_range(cs, -5, 999) == 7  # clamps both ends
    assert nws_range(cs, 8, 8) == 0


def test_merge_arithmetic():
    # reference chunking_test.go:144-180: 30+40+20 @max100 -> 1; 60+60 -> 2
    mk = lambda s: _Window(items=[(0, 0, 1, False)], size=s)
    out = merge_adjacent_windows([mk(30), mk(40), mk(20)], 100)
    assert [w.size for w in out] == [90]
    out = merge_adjacent_windows([mk(60), mk(60)], 100)
    assert [w.size for w in out] == [60, 60]


def _rand_doc(rng, n_spans):
    kinds, texts, refs = [], [], []
    for i in range(n_spans):
        if rng.rand() < 0.25:
            kinds.append("media"); texts.append(""); refs.append(f"ref://x/{i}")
        else:
            n_lines = rng.randint(1, 12)
            lines = []
            for _ in range(n_lines):
                ln = "".join(rng.choice(list("abc de\tf!?"), size=rng.randint(0, 120)))
                lines.append(ln)
            kinds.append("text"); texts.append("\n".join(lines)); refs.append("")
    return kinds, texts, refs, list(range(n_spans))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("max_size", [50, 100, 1500])
def test_fold_matches_oracle(seed, max_size):
    rng = np.random.RandomState(seed)
    kinds, texts, refs, orders = _rand_doc(rng, rng.randint(1, 25))
    got = chunk_spans_py(kinds, texts, refs, orders, max_size)
    want = oracle_chunks(kinds, texts, refs, orders, max_size)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["text"], g["byte_start"], g["byte_end"], g["nws_size"],
                g["is_partial"], g["line_start"], g["line_end"]) == w
    # structural invariants (reference codechunk_test.go:33-43)
    for i, g in enumerate(got):
        assert g["chunk_index"] == i
        assert g["total_chunks"] == len(got)
        assert g["byte_start"] <= g["byte_end"]
        assert g["line_start"] <= g["line_end"]


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_span_sequence_equality(seed):
    """THE per-row invariant: (kind, text, media_ref, order) sequence is
    preserved across chunking (BASELINE input_hint)."""
    rng = np.random.RandomState(seed)
    kinds, texts, refs, orders = _rand_doc(rng, 30)
    got = chunk_spans_py(kinds, texts, refs, orders, 120)
    frags = {}
    seq = []
    for c in got:
        for s in c["spans"]:
            if s["part"] == 0:
                seq.append(s["order"])
            frags.setdefault(s["order"], []).append(s)
    assert seq == sorted(seq) == orders  # order preserved, each span once
    for o in orders:
        fs = sorted(frags[o], key=lambda s: s["part"])
        assert [f["part"] for f in fs] == list(range(fs[0]["parts"]))
        assert all(f["kind"] == kinds[o] for f in fs)
        if kinds[o] == "media":
            assert fs[0]["media_ref"] == refs[o]
        else:
            recon = ("".join(f["text"] for f in fs)
                     if fs[0]["parts"] > 1 else fs[0]["text"])
            assert recon == texts[o]


def test_oversized_single_line_stays_whole():
    # parity with reference: a single line > max cannot be split further
    got = chunk_spans_py(["text"], ["z" * 2000], [""], [0], 100)
    assert len(got) == 1 and got[0]["nws_size"] == 2000 and got[0]["is_partial"]


def test_trailing_newline_trim():
    # chunking.go:283-287 — ALL trailing newlines trimmed, end decremented
    got = chunk_spans_py(["text"], ["abc\n\n\n"], [""], [0], 100)
    assert got[0]["text"] == "abc"
    assert got[0]["byte_end"] == 3


def test_serialize_offsets():
    doc, starts, ends = serialize_document(
        ["text", "media", "text"], ["ab", "", "cd"], ["", "r", ""]
    )
    assert doc == b"ab\n<media:r>\ncd"
    assert starts.tolist() == [0, 3, 13]
    assert ends.tolist() == [2, 12, 15]


def test_split_media_span_fragments_restore_payload():
    # a multi-line media_ref forces W2 to split the media span across
    # windows; fragments must keep their byte-slice text so concatenation in
    # (chunk_index, part) order restores the payload for EVERY kind
    ref = "\n".join(f"seg{i}" + "y" * 20 for i in range(10))
    out = chunk_spans_py(["media"], [""], [ref], [0], 40)
    frags = sorted(
        ((c["chunk_index"], s["part"], s) for c in out for s in c["spans"]),
        key=lambda t: (t[0], t[1]),
    )
    assert frags[0][2]["parts"] == len(frags) > 1
    assert "".join(t[2]["text"] for t in frags) == "<media:" + ref + ">"
    assert all(t[2]["media_ref"] == ref for t in frags)
