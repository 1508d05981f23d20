"""Stages B-E — predicate tagging, span fan-out, argument tagging,
triple assembly (SURVEY.md §3.4).

The ``backend='rule'`` path is 100% JVM column expressions; the
``backend='neural'`` path swaps stages B/D for the Arrow-batched
numpy BiLSTM+CRF kernel (openie_spark.model.infer) behind the same
DataFrame contract. Span fan-out (T7) is ``posexplode`` — a narrow
row-multiplier (~spans-per-sentence ×), never a shuffle.

Reference parity:
  * stage-1 tags ≙ `preds` after head-projection (/root/reference/run.py:233-235)
  * spans ≙ Joint.get_predicate_span (/root/reference/models/seqie.py:58-72);
    joint inference applies NO span cap (seqie.py:169-177) — ``limit``
    defaults to None for parity, PREDICATE_LIMIT=3 applies only on the
    pipeline-style path (run.py:75-76, configs/joint.cfg:59).
  * triple assembly ≙ write_output (/root/reference/run.py:148-178)
    including arg-slot compaction and the empty-predicate ' ' literal.
  * confidence = 1.0 literal (goldReader.py:26,31; decoder returns no
    score, modules/decoder.py:16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.config import CONFIDENCE
from openie_spark.functions.arrays import (
    args_array,
    pred_string,
    rule_ext_tags,
    rule_pred_tags,
    seqie_spans,
)

_KEYS = ["conv_id", "turn_idx", "sent_idx"]


def tag_predicates(sentences: DataFrame, backend: str = "rule") -> DataFrame:
    """sentences → tagged (adds per-word pred_tags). Stage B."""
    if backend == "rule":
        return sentences.withColumn("pred_tags", rule_pred_tags(F.col("words")))
    if backend == "neural":
        from openie_spark.model.infer import tag_predicates_neural

        return tag_predicates_neural(sentences)
    raise ValueError(f"unknown tagger backend: {backend}")


def explode_extractions(tagged: DataFrame, backend: str = "rule", limit: int | None = None) -> DataFrame:
    """tagged → extractions: one row per predicate span, with the full
    18-tag argument sequence. Stages C+D."""
    spans = seqie_spans(F.col("pred_tags"))
    if limit is not None:
        spans = F.slice(spans, 1, limit)
    fanned = tagged.select(
        *_KEYS, "words", "sent",
        F.posexplode(spans).alias("ext_idx", "span"),
    )
    if backend == "rule":
        return fanned.withColumn("tags", rule_ext_tags(F.col("words"), F.col("span")))
    if backend == "neural":
        from openie_spark.model.infer import tag_arguments_neural

        return tag_arguments_neural(fanned)
    raise ValueError(f"unknown tagger backend: {backend}")


def assemble_triples(extractions: DataFrame) -> DataFrame:
    """extractions → triples. Stage E, pure column expressions (K1)."""
    w, t = F.col("words"), F.col("tags")
    args = args_array(w, t)
    return extractions.select(
        *_KEYS,
        "ext_idx",
        F.col("sent"),
        pred_string(w, t).alias("pred"),
        args.alias("args"),
        # try_element_at: args may be empty (span covers the whole
        # sentence) and ANSI element_at throws on out-of-bounds.
        F.coalesce(F.try_element_at(args, F.lit(1)), F.lit("")).alias("subj"),
        F.array_join(F.slice(args, 2, F.greatest(F.size(args) - 1, F.lit(1))), " ").alias("obj"),
        F.lit(CONFIDENCE).alias("confidence"),
    )


def extract_triples(transcripts: DataFrame, backend: str = "rule", limit: int | None = None) -> DataFrame:
    """transcripts → triples: the full extraction pipeline A→E."""
    from openie_spark.operators.sentences import segment_transcripts

    sentences = segment_transcripts(transcripts)
    tagged = tag_predicates(sentences, backend=backend)
    extractions = explode_extractions(tagged, backend=backend, limit=limit)
    return assemble_triples(extractions)
