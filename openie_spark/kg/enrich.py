"""Stage I+ — KG semantic enrichment: entity typing, relation
canonicalization, per-conversation entity salience.

These are the standard post-materialize enrichment passes of a KG
construction pipeline (the reference stops at triples + eval —
AntNLP/OpenIE has no KG stage at all — so like the rest of ``kg/``
this surface is engine-original, designed for the 10^12-turn north
star rather than ported):

  * ``entity_types`` — deterministic rule-ladder typing of canonical
    entity labels (numeric / year / code / measure / person / org /
    place / phrase / term). Rules are pure string predicates over the
    ``[a-z0-9 ]`` normalized-mention alphabet, so typing is exactly
    reproducible in any engine.
  * ``relation_canon`` — groups surface predicates into canonical
    relations: drop auxiliary/modal tokens, then apply a small
    deterministic suffix-rule lemmatizer (plural/-ing/-ed with
    doubled-consonant halving; an s-stemmer extension in the spirit of
    Harman 1991). No backreferences anywhere, so the same rules run
    under Java regex (Spark) and RE2 (DuckDB).
  * ``entity_salience`` — per-conversation top-k entities by an
    exact-integer tf*idf-style score (local mentions scaled by the
    entity's inverse conversation frequency).

All three do their string work on VOCABULARY-sized tables (distinct
labels / distinct predicates) and reattach occurrence counts by join,
so the regexp ladder never runs at occurrence scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# auxiliaries/modals dropped from predicates before lemma grouping
AUX_TOKENS = (
    "is are was were be been being am do does did has have had "
    "will would can could shall should may might must not to"
).split()

# last-resort suffix rules, FIRST match wins; (regex, chars-to-strip,
# append). Doubled-consonant branches come before their plain
# counterparts so 'running' -> 'run' but 'ring' stays 'ring'.
LEMMA_RULES = [
    ("^[a-z]{2,}ies$", 3, "y"),                          # studies -> study
    ("^[a-z]{2,}(ch|sh|x|z|ss)es$", 2, ""),              # matches -> match
    ("^[a-z]{2,}[abcdefghjklmnopqrtvwxyz]s$", 1, ""),    # scans -> scan
    ("^[a-z]+(bb|dd|gg|mm|nn|pp|rr|tt)ing$", 4, ""),     # running -> run
    ("^[a-z]{3,}ing$", 3, ""),                           # meeting -> meet
    ("^[a-z]+(bb|dd|gg|mm|nn|pp|rr|tt)ed$", 3, ""),      # stopped -> stop
    ("^[a-z]{3,}ed$", 2, ""),                            # merged -> merg
]

# entity-typing rule ladder, FIRST match wins (over the normalized
# [a-z0-9 ] alphabet — no case or punctuation to consider)
PERSON_PREFIXES = "mr mrs ms dr prof sir president ceo judge captain".split()
ORG_SUFFIXES = ("inc corp llc ltd co company university institute"
                " committee department agency ministry").split()
PLACE_SUFFIXES = ("city county state country river mountain street"
                  " avenue island valley lake bay").split()


def lemma_col(tok: F.Column) -> F.Column:
    """Apply LEMMA_RULES to one lowercase token column (first match
    wins); identity when nothing matches."""
    out = tok
    for rx, strip, app in reversed(LEMMA_RULES):
        stem = F.substring(tok, F.lit(1), F.length(tok) - strip)
        out = F.when(tok.rlike(rx),
                     F.concat(stem, F.lit(app)) if app else stem).otherwise(out)
    return out


def canon_relation_col(pred: F.Column) -> F.Column:
    """Predicate -> canonical relation key: drop auxiliary/modal
    tokens FIRST (so inflected auxes can't slip past the set after
    stemming, e.g. 'does'->'doe'), lemmatize the surviving content
    tokens, join with ' '. An aux-only predicate is kept verbatim
    (never empties, never stems its auxes)."""
    toks = F.filter(F.split(pred, " "), lambda t: t != "")
    content = F.filter(toks, lambda t: ~t.isin(*AUX_TOKENS))
    return F.when(
        F.size(content) > 0,
        F.array_join(F.transform(content, lemma_col), " "),
    ).otherwise(F.array_join(toks, " "))


def relation_canon(edges: DataFrame) -> DataFrame:
    """Canonical relations: group the edge table's surface predicates
    by their aux-stripped lemma key and report per-relation support
    plus the sorted surface-form inventory.

    Scale shape: the lemma ladder runs on the DISTINCT-predicate table
    (relation vocabularies follow Heaps' law — tiny), which joins back
    to edges on pred; AQE broadcasts that side. Edge counting is one
    partial-aggregated groupBy on (pred) then a vocab-sized re-group
    on the canon key — the occurrence-scale shuffle is the same one
    relation_weights already pays, never the regexp work."""
    per_pred = edges.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    keyed = per_pred.withColumn("rel_canon", canon_relation_col(F.col("pred")))
    return keyed.groupBy("rel_canon").agg(
        F.count(F.lit(1)).cast("int").alias("n_forms"),
        # '|'-joined string, not array<string>: the driver's pandas
        # harness cannot sort/hash list cells (round-3 red)
        F.array_join(F.sort_array(F.collect_list("pred")), "|").alias("forms"),
        F.sum("n_edges").alias("n_edges"),
        F.sum("n_convs").alias("n_convs_sum"),
    )


def etype_col(label: F.Column) -> F.Column:
    """Rule-ladder entity type for a normalized [a-z0-9 ] label."""
    first = F.element_at(F.split(label, " "), 1)
    last = F.element_at(F.split(label, " "), -1)
    return (
        F.when(label.rlike("^(1[0-9]{3}|2[0-9]{3})$"), "year")
        .when(label.rlike("^[0-9]+$"), "numeric")
        .when(~label.contains(" ")
              & label.rlike("[0-9]") & label.rlike("[a-z]"), "code")
        .when(label.rlike("^[0-9]+ ") & last.rlike("^[a-z]+$"), "measure")
        .when(first.isin(*PERSON_PREFIXES), "person")
        .when(last.isin(*ORG_SUFFIXES), "org")
        .when(last.isin(*PLACE_SUFFIXES), "place")
        .when(label.contains(" "), "phrase")
        .otherwise("term")
    )


def entity_types(nodes: DataFrame) -> DataFrame:
    """Typed node table (entity_id, canonical, etype, freq) — the
    deterministic heuristic type-assignment pass every downstream KG
    consumer wants before schema mapping. Vocabulary-scale map-only
    work on the nodes table (no shuffle at all beyond the scan)."""
    return nodes.select(
        "entity_id", "canonical",
        etype_col(F.col("canonical")).alias("etype"),
        "freq",
    )


SALIENCE_TOP = 5


def entity_salience(edges: DataFrame, k: int = SALIENCE_TOP) -> DataFrame:
    """Per-conversation salient entities: top-``k`` by the exact-
    integer score n_local * n_total_convs DIV n_convs_with_entity —
    the tf*idf shape without a float log (a 1-ulp log difference could
    flip ranks between engines; the integer rational cannot).

    Scale shape: one partial-agg shuffle on (conv_id, entity_id), a
    vocabulary-sized entity-df aggregation joined back (AQE broadcasts
    it), a 1-row total broadcast-crossjoin, and a per-conversation
    row_number window whose partitions are bounded by entities-per-
    conversation (turn-bounded), not corpus size."""
    occ = edges.select("conv_id", F.col("src_id").alias("entity_id")).unionAll(
        edges.select("conv_id", F.col("dst_id").alias("entity_id")))
    tf = occ.groupBy("conv_id", "entity_id").agg(
        F.count(F.lit(1)).alias("n_local"))
    idf = tf.groupBy("entity_id").agg(F.count(F.lit(1)).alias("n_convs"))
    total = occ.agg(F.countDistinct("conv_id").alias("n_total"))
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("salience"), F.asc("entity_id"))
    return (
        tf.join(idf, "entity_id")
        .crossJoin(F.broadcast(total))
        .withColumn("salience", F.expr("(n_local * n_total) DIV n_convs"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("conv_id", "entity_id", "n_local", "n_convs",
                "salience", "rank")
    )


SCHEMA_TOP = 3


def relation_schema(edges: DataFrame, nodes: DataFrame,
                    k: int = SCHEMA_TOP) -> DataFrame:
    """Schema induction — the ontology pass of a KG construction
    pipeline: for every canonical relation, the top-``k`` (src_type,
    dst_type) signatures by edge support, with conversation support and
    an exact-ppm share of the relation's edges. Downstream consumers
    read this as the induced relation signature ("founded: person ->
    org") and as an outlier detector (a low-share type pair on a
    high-support relation is usually an extraction error).

    Scale shape: the lemma ladder runs on the DISTINCT-pred table
    (explicitly broadcast — predicate vocabularies are Heaps'-law
    tiny); the two type attaches are node-sized equi-joins AQE
    broadcasts when they fit, plain shuffle joins when they don't.
    One partial-aggregated (rel, src_type, dst_type) rollup, then
    rank/share windows over the TYPE-PAIR table (bounded by
    |relations| x |types|^2, independent of corpus size)."""
    types = entity_types(nodes).select("entity_id", "etype")
    rel = (edges.select("pred").distinct()
           .withColumn("rel_canon", canon_relation_col(F.col("pred"))))
    typed = (
        edges.select("pred", "src_id", "dst_id", "conv_id")
        .join(F.broadcast(rel), "pred")
        .join(types.select(F.col("entity_id").alias("src_id"),
                           F.col("etype").alias("src_type")), "src_id")
        .join(types.select(F.col("entity_id").alias("dst_id"),
                           F.col("etype").alias("dst_type")), "dst_id")
    )
    counts = typed.groupBy("rel_canon", "src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    w = Window.partitionBy("rel_canon").orderBy(
        F.desc("n_edges"), F.asc("src_type"), F.asc("dst_type"))
    tot = Window.partitionBy("rel_canon")
    return (
        counts
        .withColumn("rank", F.row_number().over(w))
        .withColumn("rel_total", F.sum("n_edges").over(tot))
        .filter(F.col("rank") <= k)
        .withColumn("share_ppm", F.expr(
            "(2 * n_edges * 1000000 + rel_total) DIV (2 * rel_total)"))
        .select("rel_canon", "src_type", "dst_type", "n_edges", "n_convs",
                "rank", "share_ppm")
    )


def segment_salience(edges: DataFrame, segments: DataFrame,
                     k: int = SALIENCE_TOP) -> DataFrame:
    """Per-TOPIC-SEGMENT salient entities — entity_salience re-scoped
    from whole conversations to the dialogue.topic_segments units, the
    granularity a long multi-session transcript actually needs (a
    1,000-turn thread is many topics; conversation-level tf drowns the
    brief ones). Same exact-integer score, with segment frequency as
    the idf axis: n_local * n_total_segments DIV n_segments_with_entity.

    Scale shape: one (conv, turn)-keyed equi-join to stamp seg_idx
    onto provenance edges (both sides partition on the same key), then
    exactly the entity_salience plan with a composite (conv_id,
    seg_idx) key — partial-agg tf shuffle, vocabulary-sized idf
    aggregate, 1-row total broadcast, per-segment rank window bounded
    by entities-per-segment."""
    seg = segments.select("conv_id", "turn_idx", "seg_idx")
    # join ONCE, fan endpoints out with a narrow explode — a unionAll
    # of two joined branches would pay the occurrence-scale join twice
    occ = (
        edges.join(seg, ["conv_id", "turn_idx"])
        .select("conv_id", "seg_idx",
                F.explode(F.array("src_id", "dst_id")).alias("entity_id"))
    )
    tf = occ.groupBy("conv_id", "seg_idx", "entity_id").agg(
        F.count(F.lit(1)).alias("n_local"))
    idf = tf.groupBy("entity_id").agg(F.count(F.lit(1)).alias("n_segs"))
    total = (occ.select("conv_id", "seg_idx").distinct()
             .agg(F.count(F.lit(1)).alias("n_total")))
    w = Window.partitionBy("conv_id", "seg_idx").orderBy(
        F.desc("salience"), F.asc("entity_id"))
    return (
        tf.join(idf, "entity_id")
        .crossJoin(F.broadcast(total))
        .withColumn("salience", F.expr("(n_local * n_total) DIV n_segs"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("conv_id", "seg_idx", "entity_id", "n_local", "n_segs",
                "salience", "rank")
    )


def statement_role_provenance(edges: DataFrame,
                              transcripts: DataFrame) -> DataFrame:
    """Role provenance per statement -> (src_id, pred, dst_id,
    n_mentions, n_user, n_assistant, n_system, n_tool, tool_src_ppm):
    how many of a statement's supporting mentions came from each
    speaker role, plus the exact round-half-up share that originated
    in TOOL output — the trust signal a downstream consumer weighs
    before acting on a fact (user-asserted vs model-generated vs
    tool-retrieved provenance are not interchangeable at any scale).

    Scale shape: one (conv_id, turn_idx) equi-join of the provenance
    edges against the role projection (column pruning reaches both
    scans), then ONE partial-aggregated statement rollup — the same
    join profile as temporal_relations. Integer-only outputs."""
    r = transcripts.select("conv_id", "turn_idx", "role")
    j = edges.select("conv_id", "turn_idx", "src_id", "pred", "dst_id") \
        .join(r, ["conv_id", "turn_idx"])

    def n_of(role: str):
        return F.sum(F.when(F.col("role") == role, 1).otherwise(0))

    return (
        j.groupBy("src_id", "pred", "dst_id")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            n_of("user").alias("n_user"),
            n_of("assistant").alias("n_assistant"),
            n_of("system").alias("n_system"),
            n_of("tool").alias("n_tool"),
        )
        .withColumn(
            "tool_src_ppm",
            F.expr("(2 * n_tool * 1000000 + n_mentions) DIV (2 * n_mentions)"))
    )
