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


def test_w1_w3_recurrence_model_matches_fold():
    """The chunk_spans DuckDB oracle re-expresses the fold as a state
    recurrence (__spark_entry__._chunk_fold_ctes).  Pin that model against
    chunk_spans_py on randomized span sequences (ASCII, no intra-span
    newlines — the adapter's span shape) so the oracle's foundation is
    guarded beyond the driver data."""
    import numpy as np

    from tree_code_chunker_spark.operators.chunker import (
        chunk_spans_py,
        span_payload,
    )

    rng = np.random.RandomState(7)
    for trial in range(60):
        n = int(rng.randint(1, 15))
        max_size = int(rng.randint(5, 80))
        kinds, texts, refs = [], [], []
        for i in range(n):
            if rng.rand() < 0.25:
                kinds.append("media")
                texts.append("")
                refs.append("r" * int(rng.randint(0, 60)) or "r")
            else:
                kinds.append("text")
                texts.append(" ".join(
                    "w" * int(rng.randint(1, 9))
                    for _ in range(int(rng.randint(1, 12)))))
                refs.append("")
        orders = list(range(n))
        want = chunk_spans_py(kinds, texts, refs, orders, max_size)

        # the oracle's recurrence
        def nws(s):
            return sum(1 for b in s.encode() if b > 32)

        sizes = [nws(span_payload(k, t, r))
                 for k, t, r in zip(kinds, texts, refs)]
        wid, sz_open, closed = -1, 0, True
        w_of, partial = [], []
        for sz in sizes:
            if sz > max_size:
                wid += 1
                sz_open, closed = 0, True
                w_of.append(wid)
                partial.append(True)
            elif closed or sz_open + sz > max_size:
                wid += 1
                sz_open, closed = sz, False
                w_of.append(wid)
                partial.append(False)
            else:
                sz_open += sz
                w_of.append(wid)
                partial.append(False)
        ws = [0] * (wid + 1)
        for i, w in enumerate(w_of):
            ws[w] += sizes[i]
        mwin_of, m, acc = [0], 0, ws[0]
        for w in range(1, wid + 1):
            if acc + ws[w] <= max_size:
                acc += ws[w]
            else:
                m, acc = m + 1, ws[w]
            mwin_of.append(m)

        got_groups = {}
        for i in range(n):
            got_groups.setdefault(mwin_of[w_of[i]], []).append(i)
        assert len(want) == m + 1, (trial, max_size)
        for c in want:
            members = got_groups[c["chunk_index"]]
            assert c["nws_size"] == sum(sizes[i] for i in members)
            assert c["is_partial"] == any(partial[i] for i in members)
