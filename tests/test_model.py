"""Neural backend unit + e2e tests (SURVEY.md §5: T1/T3/T4/T5/T8)."""

from __future__ import annotations

import numpy as np
import pytest

from openie_spark.config import IDX2TAG, TAGSET_OIE2016
from openie_spark.model import kernel, tokenizer, weights


def test_viterbi_matches_brute_force():
    """CRF decode must equal exhaustive search (torchcrf semantics,
    /root/reference/modules/decoder.py:15-17)."""
    w = weights.build_tagger(7)
    rng = np.random.default_rng(0)
    for T in (1, 2, 3, 4):
        emis = rng.normal(size=(1, T, weights.NTAGS)).astype(np.float32) * 3
        got = kernel.viterbi(w, emis, np.array([T]))[0]
        want = kernel.viterbi_brute(w, emis[0])
        assert got.tolist() == want.tolist(), f"T={T}"


def test_viterbi_batch_mask_independence():
    """Padding rows must not change a sequence's decode — decode each
    sequence alone vs inside a ragged batch."""
    w = weights.build_tagger(11)
    rng = np.random.default_rng(1)
    lens = np.array([3, 7, 5])
    T = int(lens.max())
    emis = rng.normal(size=(3, T, weights.NTAGS)).astype(np.float32)
    batch_paths = kernel.viterbi(w, emis, lens)
    for b, L in enumerate(lens):
        solo = kernel.viterbi(w, emis[b : b + 1, :L], np.array([L]))[0]
        assert batch_paths[b].tolist() == solo.tolist()


def test_tokenizer_alignment_contract():
    """Per-word pieces, is_head on first piece only, CLS/SEP wrapping
    (/root/reference/utils/dataset.py:43-46,110-114)."""
    words = ["Hi", "extraordinarily", "."]
    ids, seg, is_head, lengths, widx = tokenizer.encode_batch([words])
    L = int(lengths[0])
    assert ids[0, 0] == tokenizer.CLS_ID and ids[0, L - 1] == tokenizer.SEP_ID
    assert not is_head[0, 0] and not is_head[0, L - 1]
    # "extraordinarily" (15 chars, PIECE=6) → 3 pieces, one head
    assert is_head[0].sum() == len(words)
    heads_widx = widx[0, is_head[0]]
    assert heads_widx.tolist() == [0, 1, 2]
    # continuation pieces carry the same word index as their head
    assert (widx[0, 1:L - 1] >= 0).all()


def test_tokenizer_ids_stable():
    assert tokenizer.tokenize_word("hello") == tokenizer.tokenize_word("hello")
    assert tokenizer.piece_id("abc") != tokenizer.piece_id("##abc")


def test_weights_deterministic_and_versioned():
    a, b = weights.build_tagger(5), weights.build_tagger(5)
    assert a.version == b.version
    assert np.array_equal(a.embedding, b.embedding)
    assert weights.build_tagger(6).version != a.version


def test_decode_words_deterministic_and_valid():
    from openie_spark.model.infer import _decode_words

    sents = [["The", "cat", "sat", "."], ["Dogs", "bark", "loudly"]]
    t1 = _decode_words(sents, None, weights.PRED_SEED)
    t2 = _decode_words(sents, None, weights.PRED_SEED)
    assert t1 == t2
    for ws, tags in zip(sents, t1):
        assert len(tags) == len(ws)
        assert all(t in TAGSET_OIE2016 for t in tags)


def test_seg_channel_changes_decode_interface():
    """Stage-2 must actually consume the segment channel: identical
    inputs with different seg must be *able* to differ (emissions differ)."""
    from openie_spark.model.kernel import emissions
    from openie_spark.model.tokenizer import encode_batch

    w = weights.get_tagger(weights.ARG_SEED)
    words = [["alpha", "beta", "gamma", "delta"]]
    seg0 = [np.array([0, 0, 0, 0], dtype=np.int8)]
    seg1 = [np.array([0, 1, 1, 0], dtype=np.int8)]
    e0 = emissions(w, *_enc(encode_batch(words, seg0)))
    e1 = emissions(w, *_enc(encode_batch(words, seg1)))
    assert not np.allclose(e0, e1)


def _enc(enc):
    ids, seg, _, lengths, _ = enc
    return ids, seg, lengths


def test_neural_pipeline_end_to_end(spark):
    """transcripts → triples with backend='neural': valid schema, tag
    vocabulary, per-span fan-out keys, determinism across runs."""
    from openie_spark.operators.extract import (
        explode_extractions,
        extract_triples,
        tag_predicates,
    )
    from openie_spark.operators.sentences import segment_transcripts

    rows = [
        ("c0", 0, "user", "John is a teacher in London .", None),
        ("c0", 1, "assistant", "Mary wrote three books . They sold well .", None),
        ("c1", 0, "user", "The quick brown fox jumps over the lazy dog", None),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    sents = segment_transcripts(t)
    tagged = tag_predicates(sents, backend="neural")
    got = tagged.select("conv_id", "turn_idx", "sent_idx", "pred_tags", "n_words").collect()
    assert len(got) == 4
    for r in got:
        assert len(r.pred_tags) == r.n_words
        assert all(tag in TAGSET_OIE2016 for tag in r.pred_tags)

    exts = explode_extractions(tagged, backend="neural")
    for r in exts.collect():
        assert len(r.tags) == len(r.words)

    t1 = extract_triples(t, backend="neural").orderBy("conv_id", "turn_idx", "sent_idx", "ext_idx").collect()
    t2 = extract_triples(t, backend="neural").orderBy("conv_id", "turn_idx", "sent_idx", "ext_idx").collect()
    assert t1 == t2
    for r in t1:
        assert r.confidence == 1.0
        assert r.pred  # never empty (empty → ' ' literal)
