"""Property-based pinning of the window algebra (hypothesis): for ANY span
sequence and max size, the engine fold must (a) match the naive oracle
exactly and (b) preserve the span sequence (kind, text, media_ref, order)."""

from hypothesis import given, settings, strategies as st

from tests.oracle_fold import oracle_chunks
from tree_code_chunker_spark.operators.chunker import chunk_spans_py

span_text = st.text(
    alphabet=st.sampled_from("ab c\t\nx!?.é\x00"), min_size=0, max_size=300
)


@st.composite
def doc(draw):
    n = draw(st.integers(1, 15))
    kinds, texts, refs = [], [], []
    for i in range(n):
        if draw(st.booleans()) and draw(st.integers(0, 3)) == 0:
            kinds.append("media")
            texts.append("")
            refs.append(f"ref://{draw(st.integers(0, 99))}")
        else:
            kinds.append("text")
            texts.append(draw(span_text))
            refs.append("")
    return kinds, texts, refs, list(range(n))


@settings(max_examples=120, deadline=None)
@given(doc=doc(), max_size=st.sampled_from([1, 7, 40, 200, 1500]))
def test_fold_equals_oracle(doc, max_size):
    kinds, texts, refs, orders = doc
    got = chunk_spans_py(kinds, texts, refs, orders, max_size)
    want = oracle_chunks(kinds, texts, refs, orders, max_size)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["text"], g["byte_start"], g["byte_end"], g["nws_size"],
                g["is_partial"], g["line_start"], g["line_end"]) == w


@settings(max_examples=120, deadline=None)
@given(doc=doc(), max_size=st.sampled_from([1, 7, 40, 200]))
def test_span_sequence_preserved(doc, max_size):
    kinds, texts, refs, orders = doc
    got = chunk_spans_py(kinds, texts, refs, orders, max_size)
    frags: dict[int, list] = {}
    first_seen = []
    for c in got:
        for s in c["spans"]:
            if s["part"] == 0:
                first_seen.append(s["order"])
            frags.setdefault(s["order"], []).append(s)
    assert first_seen == orders  # every span exactly once, in order
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
