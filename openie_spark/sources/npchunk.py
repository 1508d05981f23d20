"""S3 — NP-chunk annotation for 01-col → 02-np conversion.

Reference: data/corups/oie2016/02-np/col2np.py:1-40 — per block, tag
every word 'NP' if it falls inside a noun chunk of the joined sentence,
else 'O', then append the NP column to each line ('train' keeps the
original line, 'dev' rewrites it as word \t O \t NP). The reference
uses spaCy en_core_web_trf; chunk spans are mapped back to the
whitespace words via first-subtoken heads (col2np.py:14-31).

Spark shape: the chunker runs as an Arrow-batched ``mapInPandas`` with
a per-worker model singleton — the identical plumbing a spaCy/trf
pipeline needs on a real cluster image. This container has no spaCy,
so the default chunker is a deterministic closed-class heuristic
(maximal runs of non-function words), clearly a stand-in: swap
``chunker='spacy'`` on an image that has it. The 02-np column contract
(consumed by read_column_file(np_col=True)) is exercised for real
either way — tests round-trip annotate → np_lines → reader.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from openie_spark.config import PRED_LEXICON, SENT_PUNCT

# Closed-class words that never open/continue a noun phrase in the
# heuristic chunker (engine choice — a deterministic stand-in for the
# spaCy noun_chunks model, NOT a reimplementation of it).
NP_FUNCTION_WORDS = frozenset(PRED_LEXICON) | set(SENT_PUNCT) | {
    "a", "an", "and", "or", "but", "if", "then", "so", "because",
    "of", "in", "on", "at", "to", "for", "with", "by", "from", "as",
    "that", "which", "who", "not", "no", "very", "also", "when",
    ",", ";", ":", "-",
}
# determiners attach to the following NP run
NP_DETERMINERS = frozenset({"the", "a", "an", "this", "that", "these", "those"})


def heuristic_chunks(words: list[str]) -> list[tuple[int, int]]:
    """Deterministic NP spans: maximal runs of non-function words,
    optionally preceded by a determiner. Returns [start, end) spans."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(words)
    while i < n:
        w = words[i].lower()
        if w in NP_DETERMINERS and i + 1 < n and words[i + 1].lower() not in NP_FUNCTION_WORDS:
            start = i
            i += 1
            while i < n and words[i].lower() not in NP_FUNCTION_WORDS:
                i += 1
            spans.append((start, i))
        elif w not in NP_FUNCTION_WORDS and w not in NP_DETERMINERS:
            start = i
            while i < n and words[i].lower() not in NP_FUNCTION_WORDS:
                i += 1
            spans.append((start, i))
        else:
            i += 1
    return spans


_SPACY_NLP = None


def _spacy_chunks(words: list[str]) -> list[tuple[int, int]]:
    """Real spaCy noun_chunks mapped back to whitespace words via
    first-subtoken heads (col2np.py:14-31). Per-worker model singleton
    — loaded once per executor Python process, reused across batches."""
    global _SPACY_NLP
    import spacy  # raises ImportError on images without spaCy

    if _SPACY_NLP is None:
        _SPACY_NLP = spacy.load("en_core_web_trf")
    nlp = _SPACY_NLP
    heads: list[int] = []
    for w in words:
        n_sub = len(nlp(w)) or 1
        heads.extend([1] + [0] * (n_sub - 1))
    doc = nlp(" ".join(words))
    tags = ["O"] * len(list(doc))
    for chunk in doc.noun_chunks:
        for i in range(chunk.start, chunk.end):
            if i < len(tags):
                tags[i] = "NP"
    word_tags = [t for t, h in zip(tags, heads) if h == 1]
    spans: list[tuple[int, int]] = []
    start = None
    for i, t in enumerate(word_tags[: len(words)]):
        if t == "NP" and start is None:
            start = i
        elif t != "NP" and start is not None:
            spans.append((start, i))
            start = None
    if start is not None:
        spans.append((start, len(words)))
    return spans


def annotate_np(cols: DataFrame, chunker: str = "heuristic") -> DataFrame:
    """01-col blocks (needs a ``words array<string>`` column) →
    + ``np_tags array<string>`` ('NP' inside a chunk, else 'O')."""
    chunk_fn = {"heuristic": heuristic_chunks, "spacy": _spacy_chunks}[chunker]
    schema = StructType(
        list(cols.schema.fields) + [StructField("np_tags", ArrayType(StringType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tag_col = []
            for ws in pdf["words"]:
                words = list(ws)
                tags = ["O"] * len(words)
                for s, e in chunk_fn(words):
                    for i in range(s, e):
                        tags[i] = "NP"
                tag_col.append(tags)
            out = pdf.copy()
            out["np_tags"] = tag_col
            yield out

    return cols.mapInPandas(run, schema)


def np_lines(annotated: DataFrame, style: str = "dev") -> DataFrame:
    """02-np line format per block (col2np.py:33-39):
    'train' = original word+tag columns with NP appended is the
    caller's concern (needs the raw lines); this writer emits the
    'dev' shape the np-reader consumes: word \t O \t NP."""
    if style != "dev":
        raise ValueError("only the 'dev' line shape is emitted here")
    lines = F.zip_with(
        "words", "np_tags",
        lambda w, t: F.concat_ws("\t", w, F.lit("O"), t))
    return annotated.select(
        "file", "block_idx", F.array_join(lines, "\n").alias("block_text"))
