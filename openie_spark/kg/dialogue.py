"""Dialogue structure over transcripts — topic segmentation.

``topic_segments`` is the TextTiling-style lexical-cohesion pass
(Hearst 1997, reduced to its deterministic core): a new topic segment
starts where the token-set overlap between a turn and its predecessor
drops below a threshold. Segments scope downstream KG passes — they
are the natural provenance unit for salience and coref windows in
long multi-session transcripts (a 1,000-turn support thread is many
topics, not one).

Everything is exact integer arithmetic (round-half-up ppm overlap, no
float division) so the DuckDB oracle reproduces the output
bit-for-bit.

Scale shape: ONE shuffle — the conv_id window partition (turn-count
bounded) serves both the lag and the running boundary sum; token
arrays never leave their row, and the regex tokenizer runs once per
turn (turn-scale, not occurrence-scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# a turn sharing under 40% of its distinct tokens with its predecessor
# starts a new segment (picked against the sandbox corpus where
# adjacent-turn overlap centers ~60%; real deployments tune per corpus)
SEGMENT_THRESH_PPM = 400_000


def topic_segments(transcripts: DataFrame,
                   thresh_ppm: int = SEGMENT_THRESH_PPM) -> DataFrame:
    """transcripts → (conv_id, turn_idx, overlap_ppm, is_boundary,
    seg_idx): exact-ppm token-set overlap with the previous turn; a
    boundary is the first turn or overlap < ``thresh_ppm`` (an
    empty-union comparison counts as zero overlap); seg_idx is the
    0-based running boundary count."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id", "turn_idx",
        F.array_distinct(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("toks"),
    )
    staged = t.withColumn("prev", F.lag("toks").over(w)).select(
        "conv_id", "turn_idx",
        F.coalesce(F.size(F.array_intersect("toks", "prev")), F.lit(0))
        .alias("n_inter"),
        F.coalesce(F.size(F.array_distinct(F.concat("toks", "prev"))),
                   F.lit(0)).alias("n_union"),
        F.col("prev").isNull().alias("is_first"),
    )
    seg = staged.withColumn(
        "overlap_ppm",
        F.when(F.col("is_first") | (F.col("n_union") == 0), F.lit(0).cast("long"))
        .otherwise(F.expr("(2 * n_inter * 1000000 + n_union) DIV (2 * n_union)")),
    ).withColumn(
        "is_boundary",
        F.col("is_first") | (F.col("overlap_ppm") < thresh_ppm),
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        seg.withColumn(
            "seg_idx",
            (F.sum(F.col("is_boundary").cast("int")).over(run) - 1).cast("int"))
        .select("conv_id", "turn_idx", "overlap_ppm", "is_boundary", "seg_idx")
    )
