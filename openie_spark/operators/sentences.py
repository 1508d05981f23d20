"""Stage A — sentence segmentation (SURVEY.md §3.4).

transcripts → sentences(conv_id, turn_idx, sent_idx, words, n_words, sent)

Pure narrow plan: tokenize + segment are array expressions, the
per-turn sentence fan-out is ``posexplode`` — no shuffle, survives any
scale because rows never leave their input partition. Reference
analogue: the blank-line block scan, /root/reference/utils/dataset.py:28-53,
with MAX_LEN=98 chunking replacing the reference's hard assert
(utils/dataset.py:39-41) — deviation recorded in lineage manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.config import MAX_SENT_WORDS
from openie_spark.functions.arrays import segment_words, words_of


def segment_transcripts(transcripts: DataFrame, max_words: int = MAX_SENT_WORDS) -> DataFrame:
    from openie_spark.functions.partitioning import spread

    sents = segment_words(words_of(F.col("text")), max_words)
    return (
        spread(transcripts, "conv_id")
        .select("conv_id", "turn_idx", F.posexplode(sents).alias("sent_idx", "words"))
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            "words",
            F.size("words").alias("n_words"),
            F.array_join("words", " ").alias("sent"),
        )
    )
