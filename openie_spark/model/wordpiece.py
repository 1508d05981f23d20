"""Greedy longest-match-first WordPiece (the public BERT algorithm)
against a checked-in mini-vocab.

The reference tokenizes word-by-word with bert-base-cased
(/root/reference/utils/dataset.py:17,70-73). That vocab file (~29k
entries) and the transformers package are not available in this
sandbox, so we ship the *algorithm* — identical to BERT's
``WordpieceTokenizer.tokenize`` (greedy longest prefix in vocab,
continuations prefixed ``##``, per-word character cap, unmatchable →
[UNK]) — over a small deterministic vocabulary
(``wordpiece_vocab.txt``: specials, printable-ASCII single characters
and their ## continuations, common English suffixes, and frequent
English words). Because every printable-ASCII character is in the
vocab, greedy matching only fails on non-ASCII words; the caller
(model.tokenizer) falls back to the hash-bucket piece rule there to
preserve per-word distinguishability instead of collapsing them all to
one [UNK] id.

Parity with the reference's per-word loop (dataset.py:70-73) —
including the empty-tokenization → ['[PAD]'] rule — is pinned by
tests/test_model.py against an independent transcription of the
public algorithm.
"""

from __future__ import annotations

import os

MAX_WORD_CHARS = 100  # BERT WordpieceTokenizer.max_input_chars_per_word
UNK = "[UNK]"

_VOCAB_PATH = os.path.join(os.path.dirname(__file__), "wordpiece_vocab.txt")
_VOCAB: dict[str, int] | None = None


def _read_vocab_text(path: str) -> str:
    """Read the vocab file both on a plain filesystem install and when
    the package ships as a zip (``spark-submit --py-files`` /
    ``sc.addPyFile``): inside a zip ``__file__`` is not openable, but
    the zipimport loader serves package resources."""
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return f.read()
    from importlib import resources

    return (
        resources.files(__package__)
        .joinpath(os.path.basename(path))
        .read_text(encoding="utf-8")
    )


def load_vocab(path: str = _VOCAB_PATH) -> dict[str, int]:
    """token -> id, line number = id (the standard vocab.txt layout).
    Cached per process (workers load once, like the weights)."""
    global _VOCAB
    if _VOCAB is None or path != _VOCAB_PATH:
        text = _read_vocab_text(path)
        vocab = {ln: i for i, ln in enumerate(text.split("\n")) if ln.strip()}
        if path != _VOCAB_PATH:
            return vocab
        _VOCAB = vocab
    return _VOCAB


def wordpiece_pieces(word: str, vocab: dict[str, int],
                     max_chars: int = MAX_WORD_CHARS) -> list[str] | None:
    """Greedy longest-match-first WordPiece of one word.

    Returns the piece strings, or ``None`` where BERT would emit
    [UNK] (word too long, or some position has no vocab prefix —
    the caller picks the stand-in policy).
    """
    if len(word) > max_chars:
        return None
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return None
        pieces.append(cur)
        start = end
    return pieces
