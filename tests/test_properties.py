"""Property-based parity: Spark column expressions vs pure-Python
transcriptions of the reference span/assembly semantics on random
inputs (hypothesis). The transcriptions are independent rewrites of
the documented behaviors (models/seqie.py:58-72, run.py:29-41,
run.py:148-178) — not imports of reference code."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

TAGS = st.lists(st.sampled_from(["O", "P-B", "P-I"]), min_size=0, max_size=12)
WORD = st.text(alphabet="abcxyz", min_size=1, max_size=4)


def seqie_spans_py(tags):
    spans, cur = [], []
    for i, t in enumerate(tags):
        if t == "P-B":
            if cur:
                spans.append(cur)
            cur = [i]
        elif t == "P-I":
            cur.append(i)
    if cur:
        spans.append(cur)
    return spans


def tag2span_py(tags):
    spans = []
    l = r = -1
    for i, t in enumerate(tags):
        if t == "P-B":
            l = i
            r = i
        elif t == "P-I":
            r = i
        else:
            if l != -1 and [l, r] not in spans:
                spans.append([l, r])
            l = r = -1
    return spans


@settings(max_examples=20, deadline=None)
@given(st.lists(TAGS, min_size=1, max_size=16))
def test_span_exprs_match_python(spark, cases):
    from openie_spark.functions.arrays import seqie_spans, tag2span_spans

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, tags array<string>")
    got = {
        r.i: (r.s, r.t)
        for r in df.select(
            "i", seqie_spans(F.col("tags")).alias("s"), tag2span_spans(F.col("tags")).alias("t")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i][0] == seqie_spans_py(c), (c, "seqie")
        assert got[i][1] == tag2span_py(c), (c, "tag2span")


def assemble_py(words, l, r):
    """run.py:148-178 binarized: pred = span words (or ' '), arg0/arg1 =
    non-punct words before/after; subj = arg0 or arg1; obj = arg1 iff
    arg0 non-empty."""
    punct = {".", "!", "?"}
    pred = " ".join(words[l:r + 1]) or " "
    a0 = " ".join(w for w in words[:l] if w not in punct)
    a1 = " ".join(w for w in words[r + 1:] if w not in punct)
    subj = a0 if a0 else a1
    obj = a1 if a0 else ""
    return pred, subj, obj


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_assembly_matches_python(spark, data):
    from openie_spark.operators.extract import assemble_triples_fast

    rows = []
    n_cases = data.draw(st.integers(1, 10))
    for i in range(n_cases):
        words = data.draw(st.lists(st.one_of(WORD, st.sampled_from([".", "!", "?"])),
                                   min_size=1, max_size=10))
        l = data.draw(st.integers(0, len(words) - 1))
        r = data.draw(st.integers(l, len(words) - 1))
        rows.append(("c", 0, i, " ".join(words), words, 0, l, r))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, sent_idx int, sent string, "
        "words array<string>, ext_idx int, span_l int, span_r int",
    )
    got = {r.sent_idx: r for r in assemble_triples_fast(df).collect()}
    for (c, t, i, sent, words, e, l, r) in rows:
        pred, subj, obj = assemble_py(words, l, r)
        g = got[i]
        assert (g.pred, g.subj, g.obj) == (pred, subj, obj), (words, l, r)
        assert g.confidence == 1.0


@settings(max_examples=30, deadline=None)
@given(
    pred=st.lists(WORD, min_size=1, max_size=4),
    args=st.lists(st.lists(WORD, min_size=1, max_size=4), min_size=1, max_size=3),
)
def test_matcher_self_match_is_perfect(pred, args):
    """binary_lenient_match(x, x) is always (1, 1): every token
    multiset overlaps itself fully."""
    from openie_spark.eval.matcher import binary_lenient_match

    p = " ".join(pred)
    a = [" ".join(x) for x in args]
    prec, rec = binary_lenient_match(p, a, p, a)
    assert prec == pytest.approx(1.0) and rec == pytest.approx(1.0)
