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


_ALLOWED = sorted("abcdefghijklmnopqrstuvwxyz0123456789 ")


def norm_mention_udf():
    """Arrow-batched pandas normalizer — identical output to
    norm_mention_col (tests pin equality). Used on the occurrence-scale
    hot path (kg.graph.norm_triples): Python workers are separate
    processes, so at high thread counts this sidesteps the single-JVM
    GC wall the char-array expression hits in local mode (measured:
    chars 65s@8 -> 31s@32 on 10.6M norms — GC-bound 2.1x; pandas
    27s@8 -> 20s@32 with ~8s fixed startup, marginal cost ~4x).
    On a real multi-executor cluster both scale; pandas is also ~2x
    cheaper per row."""
    import re

    import pandas as pd

    rx = re.compile(r"[^a-z0-9 ]")
    ws = re.compile(r" +")

    def norm(s: "pd.Series") -> "pd.Series":
        return (
            s.str.lower().str.replace(rx, "", regex=True)
            .str.replace(ws, " ", regex=True).str.strip()
        )

    # explicit returnType; annotation-based inference would need pd in
    # the module namespace (PEP 563 string hints)
    norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(norm, "string")


def norm_mention_col(c: F.Column) -> F.Column:
    """lower → strip non-alnum/space → collapse runs of spaces → trim.

    Implemented as a char-array filter + word re-join, NOT
    regexp_replace: equivalent output (any non-allowed char — including
    all whitespace except ' ' — is dropped; space runs collapse via the
    word split), but ~2.4x faster per row in this Spark build, whose
    regexp_replace costs ~350us per evaluation on 180-char strings.
    The DuckDB oracles keep the regex formulation (same results)."""
    kept = F.filter(F.split(F.lower(c), ""), lambda ch: ch.isin(*_ALLOWED))
    words = F.filter(F.split(F.array_join(kept, ""), " "), lambda w: w != "")
    return F.array_join(words, " ")


def extract_mentions(triples: DataFrame, keep_stops: bool = False) -> DataFrame:
    """triples → mentions(conv_id, turn_idx, sent_idx, ext_idx, side,
    mention, norm). Narrow: explode of a 2-element array, then filter.

    norm is computed INSIDE the exploded struct: the Generate node owns
    the expression, so the downstream filter references the attribute
    instead of re-inlining the normalization (predicate pushdown
    through a Project would otherwise evaluate it twice per row).

    ``keep_stops=True`` keeps STOP_MENTIONS rows (pronouns, role
    strings) — the coref-lite pass needs the unfiltered occurrence
    stream; entity linking never does."""
    from openie_spark.functions.partitioning import spread

    m = spread(triples, "conv_id").select(
        *_KEYS,
        F.explode(
            F.array(
                F.struct(F.lit("subj").alias("side"), F.col("subj").alias("mention"),
                         norm_mention_col(F.col("subj")).alias("norm")),
                F.struct(F.lit("obj").alias("side"), F.col("obj").alias("mention"),
                         norm_mention_col(F.col("obj")).alias("norm")),
            )
        ).alias("m"),
    )
    m = m.filter(F.col("m.norm") != "")
    if not keep_stops:
        m = m.filter(~F.col("m.norm").isin(*STOP_MENTIONS))
    return m.select(*_KEYS, "m.side", "m.mention", "m.norm")


def mentions_from_norm(tn: DataFrame) -> DataFrame:
    """Pre-normalized triples (graph.norm_triples output) → mention
    occurrences. Same rows as extract_mentions(triples) minus the raw
    surface form — zero string work (norm already computed)."""
    m = tn.select(
        *_KEYS,
        F.explode(
            F.array(
                F.struct(F.lit("subj").alias("side"), F.col("subj_norm").alias("norm")),
                F.struct(F.lit("obj").alias("side"), F.col("obj_norm").alias("norm")),
            )
        ).alias("m"),
    )
    m = m.filter((F.col("m.norm") != "") & ~F.col("m.norm").isin(*STOP_MENTIONS))
    return m.select(*_KEYS, "m.side", "m.norm")


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
