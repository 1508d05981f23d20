"""Stage F input — entity mentions from triples.

One mention occurrence per non-empty subj/obj; normalization (lower,
strip punctuation, collapse whitespace) defines mention identity for
linking. Role-like/pronoun strings are filtered by stopword policy — a
documented engine choice, not reference behavior (SURVEY.md §7 risk
register: 'user'/'assistant'/common pronouns would be mega-hubs at
transcript scale and are linkage-useless).

The distinct-vocabulary projection is the scale hinge: linking runs on
|distinct normalized mentions| (sub-linear in corpus size), never on
occurrences. Occurrences re-attach at edge-build time by hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.config import STOP_MENTIONS

_KEYS = ["conv_id", "turn_idx", "sent_idx", "ext_idx"]


def norm_mention_col(c: F.Column) -> F.Column:
    """lower → strip non-alnum/space → collapse runs of spaces → trim."""
    x = F.lower(c)
    x = F.regexp_replace(x, r"[^a-z0-9 ]", "")
    x = F.regexp_replace(x, r"\s+", " ")
    return F.trim(x)


def extract_mentions(triples: DataFrame) -> DataFrame:
    """triples → mentions(conv_id, turn_idx, sent_idx, ext_idx, side,
    mention, norm). Narrow: explode of a 2-element array, then filter."""
    m = triples.select(
        *_KEYS,
        F.explode(
            F.array(
                F.struct(F.lit("subj").alias("side"), F.col("subj").alias("mention")),
                F.struct(F.lit("obj").alias("side"), F.col("obj").alias("mention")),
            )
        ).alias("m"),
    ).select(*_KEYS, "m.side", "m.mention")
    m = m.withColumn("norm", norm_mention_col(F.col("mention")))
    return m.filter((F.col("norm") != "") & ~F.col("norm").isin(*STOP_MENTIONS))


def mention_vocab(mentions: DataFrame) -> DataFrame:
    """Distinct normalized mentions with occurrence counts — the
    linking working set. One hash-agg shuffle on norm."""
    return (
        mentions.groupBy("norm")
        .agg(F.count(F.lit(1)).alias("freq"))
        # DISTINCT tokens: pair similarity is set-Jaccard (mirrored in
        # the DuckDB oracle via list_distinct)
        .withColumn("tokens", F.array_distinct(F.split("norm", " ")))
        .withColumn("n_tokens", F.size("tokens"))
    )
