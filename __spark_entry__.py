"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-runnable ANSI-SQL equivalent the driver compares against at
sf=0.01 (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tune(spark: SparkSession) -> SparkSession:
    """Driver may hand us a vanilla session; apply runtime-settable conf."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        spark.conf.set(k, v)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG extraction — transcripts → (subj, pred, obj)
    triples — on /root/testdata/sf0.001."""
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    t = read_transcripts(_tune(spark), "/root/testdata/sf0.001")
    return extract_triples(t)


# --------------------------------------------------------------------
# queries / oracles
# --------------------------------------------------------------------

def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.sources.transcripts import read_transcripts

    return read_transcripts(_tune(spark), sf_dir)


def _q_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.operators.sentences import segment_transcripts
    from openie_spark.sources.transcripts import read_transcripts

    return segment_transcripts(read_transcripts(_tune(spark), sf_dir)).select(
        "conv_id", "turn_idx", "sent_idx", "sent", "n_words"
    )


def _q_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.operators.extract import fan_out_spans, tag_predicates
    from openie_spark.operators.sentences import segment_transcripts
    from openie_spark.sources.transcripts import read_transcripts

    fanned = fan_out_spans(
        tag_predicates(segment_transcripts(read_transcripts(_tune(spark), sf_dir)))
    )
    return fanned.select("conv_id", "turn_idx", "sent_idx", "ext_idx", "span_l", "span_r")


def _q_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    return extract_triples(read_transcripts(_tune(spark), sf_dir)).select(
        "conv_id", "turn_idx", "sent_idx", "ext_idx", "sent", "pred", "subj", "obj", "confidence"
    )


def _q_turn_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.operators.sentences import segment_transcripts
    from openie_spark.sources.transcripts import read_transcripts

    t = read_transcripts(_tune(spark), sf_dir)
    sents = segment_transcripts(t)
    recon = sents.groupBy("conv_id", "turn_idx").agg(
        F.array_join(F.array_sort(F.collect_list(F.struct("sent_idx", "sent"))).sent, " ").alias("reconstructed")
    )
    orig = t.select(
        "conv_id", "turn_idx",
        F.array_join(F.filter(F.split("text", " "), lambda w: w != ""), " ").alias("orig"),
    )
    joined = recon.join(orig, ["conv_id", "turn_idx"])
    return joined.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("reconstructed") != F.col("orig"), 1).otherwise(0)).alias("n_mismatch"),
    )


def _q_triples_neural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neural (numpy BiLSTM+CRF mapInPandas) extraction path — not
    SQL-expressible, driver records the weaker rows-only check."""
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    return extract_triples(
        read_transcripts(_tune(spark), sf_dir), backend="neural"
    ).select(
        "conv_id", "turn_idx", "sent_idx", "ext_idx", "sent", "pred", "subj", "obj", "confidence"
    )


def _q_carb_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CaRB scorer (E1-E6) on engine triples vs themselves — the parity
    self-check: P=R=F1=1 plus the gold-sentence count."""
    from openie_spark.eval.carb import carb_compare, triples_as_tuples
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    triples = triples_as_tuples(extract_triples(read_transcripts(_tune(spark), sf_dir)))
    return carb_compare(triples, triples)


def _q_carb_degraded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CaRB scorer on deterministically degraded predictions (every arg
    truncated to its first token): non-trivial single-point P/R/F1.
    Greedy bipartite matching isn't SQL-expressible → rows-only check."""
    from openie_spark.eval.carb import carb_compare, triples_as_tuples
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    gold = triples_as_tuples(extract_triples(read_transcripts(_tune(spark), sf_dir)))
    pred = gold.withColumn("args", F.transform("args", lambda a: F.split(a, " ")[0]))
    return carb_compare(gold, pred)


# ------------------------------------------------------------- KG F-H

def _kg_parts(spark: SparkSession, sf_dir: str):
    from openie_spark.kg.canon import canonical_map, connected_components
    from openie_spark.kg.linking import exact_pairs
    from openie_spark.kg.mentions import extract_mentions, mention_vocab
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    triples = extract_triples(read_transcripts(_tune(spark), sf_dir))
    vocab = mention_vocab(extract_mentions(triples))
    pairs = exact_pairs(vocab)
    canon = canonical_map(vocab, connected_components(pairs))
    return triples, vocab, pairs, canon


def _q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.kg.mentions import extract_mentions
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    return extract_mentions(
        extract_triples(read_transcripts(_tune(spark), sf_dir))
    ).select("conv_id", "turn_idx", "sent_idx", "ext_idx", "side", "mention", "norm")


def _q_kg_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, pairs, _ = _kg_parts(spark, sf_dir)
    return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _q_kg_pairs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-LSH pair path (scale variant) — hash-dependent candidate
    set, rows-only check; recall vs exact pinned in tests/test_kg.py."""
    from openie_spark.kg.linking import minhash_pairs
    from openie_spark.kg.mentions import extract_mentions, mention_vocab
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    vocab = mention_vocab(extract_mentions(
        extract_triples(read_transcripts(_tune(spark), sf_dir))))
    return minhash_pairs(vocab).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _q_kg_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, _, canon = _kg_parts(spark, sf_dir)
    return canon.select("norm", "freq", "component")


def _q_kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.kg.graph import build_nodes

    _, _, _, canon = _kg_parts(spark, sf_dir)
    return build_nodes(canon).select("entity_id", "canonical", "n_aliases", "freq")


def _q_kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.kg.graph import build_edges

    triples, _, _, canon = _kg_parts(spark, sf_dir)
    # salted strategy on the driver path: exercises the skew-safe join
    # (result is provably identical to broadcast/shuffle joins)
    return build_edges(triples, canon, strategy="salted")


def _q_kg_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.kg.graph import build_edges, degree_stats

    triples, _, _, canon = _kg_parts(spark, sf_dir)
    return degree_stats(build_edges(triples, canon, strategy="broadcast"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_derive": _q_transcripts,
        "sentence_segment": _q_sentences,
        "predicate_spans": _q_spans,
        "triples_extract": _q_triples,
        "triples_extract_neural": _q_triples_neural,
        "carb_score_self": _q_carb_self,
        "carb_score_degraded": _q_carb_degraded,
        "kg_mentions": _q_kg_mentions,
        "kg_pairs_exact": _q_kg_pairs,
        "kg_pairs_minhash": _q_kg_pairs_minhash,
        "kg_components": _q_kg_components,
        "kg_nodes": _q_kg_nodes,
        "kg_edges": _q_kg_edges,
        "kg_degree": _q_kg_degree,
        "turn_text_invariant": _q_turn_invariant,
    }


def oracle_sql() -> dict[str, str]:
    from openie_spark.plans import oracles as o

    return {
        "transcripts_derive": o.transcripts_sql(),
        "sentence_segment": o.sentences_sql(),
        "predicate_spans": o.spans_sql(),
        "triples_extract": o.triples_sql(),
        "carb_score_self": o.carb_self_sql(),
        "kg_mentions": o.kg_mentions_sql(),
        "kg_pairs_exact": o.kg_pairs_sql(),
        "kg_components": o.kg_components_sql(),
        "kg_nodes": o.kg_nodes_sql(),
        "kg_edges": o.kg_edges_sql(),
        "kg_degree": o.kg_degree_sql(),
        "turn_text_invariant": o.turn_invariant_sql(),
    }
