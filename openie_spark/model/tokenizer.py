"""Deterministic wordpiece tokenizer.

Replicates the reference's *alignment contract* (/root/reference/utils/dataset.py:56-131):
per-word tokenization, ``is_heads = [1, 0, 0, …]`` per word, label/seg
attach to every piece of the word but predictions are projected back
through the head mask only (/root/reference/run.py:233-235).

The piece rule is the real greedy longest-match-first WordPiece
algorithm (openie_spark.model.wordpiece — the algorithm
bert-base-cased applies per word, dataset.py:70-73) over a checked-in
mini-vocab; piece ids are the vocab line numbers. Words the vocab
cannot cover (non-ASCII, >100 chars — where BERT emits [UNK]) fall
back to deterministic crc32 hash-bucket chunks ABOVE the vocab id
range, preserving per-word distinguishability instead of collapsing
every OOV word onto one [UNK] embedding (documented stand-in: the
sandbox has no bert-base-cased vocab file, SURVEY.md §7 risk register).

Special tokens [CLS]/[SEP] wrap every sentence
(/root/reference/utils/dataset.py:43-46) and are stripped after decode
(/root/reference/run.py:235).
"""

from __future__ import annotations

import zlib
from functools import lru_cache

import numpy as np

from openie_spark.model.weights import VOCAB_BUCKETS
from openie_spark.model.wordpiece import load_vocab, wordpiece_pieces

PIECE = 6
CLS_ID = 1
SEP_ID = 2
PAD_ID = 0
_N_RESERVED = 4  # 0=[PAD] 1=[CLS] 2=[SEP] 3=[UNK]


def _fallback_base() -> int:
    return len(load_vocab())


def piece_id(piece: str) -> int:
    """Hash-bucket id for fallback pieces — disjoint from vocab ids."""
    base = _fallback_base()
    return base + zlib.crc32(piece.encode("utf-8")) % (VOCAB_BUCKETS - base)


@lru_cache(maxsize=65536)
def tokenize_word(word: str) -> tuple[int, ...]:
    """word → piece ids; empty word → [PAD] (dataset.py:71-72).
    Cached per process: natural text repeats words heavily, and the
    greedy matcher is the only per-character python loop on the
    neural hot path."""
    if not word:
        return (PAD_ID,)
    vocab = load_vocab()
    pieces = wordpiece_pieces(word, vocab)
    if pieces is not None:
        return tuple(vocab[p] for p in pieces)
    out = [piece_id(word[:PIECE])]
    for i in range(PIECE, len(word), PIECE):
        out.append(piece_id("##" + word[i:i + PIECE]))
    return tuple(out)


def encode_batch(
    words_batch: list[list[str]],
    seg_word_batch: list[np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorize a batch of tokenized sentences.

    Returns (ids, seg, is_head, lengths, word_index) padded to batch max:
      ids        (B, T) int32   piece ids, [CLS] … [SEP], 0-padded
      seg        (B, T) int8    per-piece segment id (word's seg id on every piece)
      is_head    (B, T) bool    first piece of each real word (False on CLS/SEP/pad)
      lengths    (B,)   int32   true piece length incl. CLS/SEP
      word_index (B, T) int32   0-based word idx per piece, -1 on specials/pad
    """
    B = len(words_batch)
    pieces_all: list[list[int]] = []
    heads_all: list[list[bool]] = []
    widx_all: list[list[int]] = []
    for words in words_batch:
        pid: list[int] = [CLS_ID]
        head: list[bool] = [False]
        widx: list[int] = [-1]
        for wi, w in enumerate(words):
            ps = tokenize_word(w)
            pid.extend(ps)
            head.extend([True] + [False] * (len(ps) - 1))
            widx.extend([wi] * len(ps))
        pid.append(SEP_ID)
        head.append(False)
        widx.append(-1)
        pieces_all.append(pid)
        heads_all.append(head)
        widx_all.append(widx)

    lengths = np.array([len(p) for p in pieces_all], dtype=np.int32)
    T = int(lengths.max()) if B else 0
    ids = np.zeros((B, T), dtype=np.int32)
    is_head = np.zeros((B, T), dtype=bool)
    word_index = np.full((B, T), -1, dtype=np.int32)
    for i, (p, h, wi) in enumerate(zip(pieces_all, heads_all, widx_all)):
        ids[i, : len(p)] = p
        is_head[i, : len(h)] = h
        word_index[i, : len(wi)] = wi

    seg = np.zeros((B, T), dtype=np.int8)
    if seg_word_batch is not None:
        for i, seg_words in enumerate(seg_word_batch):
            wi = word_index[i]
            valid = wi >= 0
            seg[i, valid] = seg_words[wi[valid]]
    return ids, seg, is_head, lengths, word_index
