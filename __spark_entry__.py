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


_PKG_ZIP: str | None = None
_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make openie_spark importable on executor Python workers
    regardless of the driver's cwd/PYTHONPATH: pandas-UDF closures
    reference the module by name, and a vanilla session launched from
    another directory has no way to import it. addPyFile distributes a
    zip and prepends it to every worker's sys.path."""
    global _PKG_ZIP
    import os
    import tempfile
    import zipfile

    if _PKG_ZIP is None:
        root = os.path.dirname(os.path.abspath(__file__))
        zp = os.path.join(tempfile.mkdtemp(prefix="openie_spark_pkg"), "openie_spark.zip")
        with zipfile.ZipFile(zp, "w") as z:
            for dirpath, _, files in os.walk(os.path.join(root, "openie_spark")):
                for f in files:
                    # .txt rides along for package data (the WordPiece
                    # vocab must reach zipimport-ed executor workers).
                    if f.endswith((".py", ".txt")):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
        _PKG_ZIP = zp
    app = spark.sparkContext.applicationId
    if app not in _SHIPPED:
        spark.sparkContext.addPyFile(_PKG_ZIP)
        _SHIPPED.add(app)


def _tune(spark: SparkSession) -> SparkSession:
    """Driver may hand us a vanilla session; apply runtime-settable conf."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        spark.conf.set(k, v)
    # One BLAS thread per python worker: task-level parallelism already
    # fills every core, and 2 OpenBLAS threads/worker × N workers just
    # spin-contend (measured 2x slower decode). sc.environment feeds
    # the envVars of every subsequently-created python UDF worker, so
    # this works even on the driver's vanilla already-started session.
    for k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        spark.sparkContext.environment.setdefault(k, "1")
    _ship_package(spark)
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


def _q_triples_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused Arrow extraction backend — row-identical to
    triples_extract (same DuckDB oracle), several times faster in this
    Spark build (see operators/fast_extract.py)."""
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    return extract_triples(
        read_transcripts(_tune(spark), sf_dir), backend="rule_arrow"
    ).select(
        "conv_id", "turn_idx", "sent_idx", "ext_idx", "sent", "pred", "subj", "obj", "confidence"
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


_TRIPLES_MEMO: dict = {}


def _triples_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-backend extraction, computed ONCE per (application, sf_dir)
    and localCheckpointed: the three carb queries and the six kg
    queries all consume this table, and without eager materialization
    each re-ran the extraction chain from the parquet scan up — worse,
    carb_compare(t, t) duplicated the branch on BOTH cogroup sides.
    (`triples_extract` itself stays un-memoized so its bench time
    reflects the real end-to-end cost.)

    Backend: rule_arrow — row-identical to 'rule' (both hash-green vs
    the same DuckDB oracle; pinned by test_fast_extract.py) and ~10x
    cheaper to materialize, which is all a memo build is."""
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.transcripts import read_transcripts

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TRIPLES_MEMO:
        _evict_stale(_TRIPLES_MEMO, key)
        _TRIPLES_MEMO[key] = extract_triples(
            read_transcripts(_tune(spark), sf_dir), backend="rule_arrow",
        ).localCheckpoint(eager=True)
    return _TRIPLES_MEMO[key]


_WINNOW_FP_MEMO: dict = {}


def _winnow_fp_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, fp) winnowing fingerprints, computed ONCE per
    (application, sf_dir) and localCheckpointed: dp_winnow_pairs and
    dp_containment both start from this table, and the winnowing pass
    (md5 per char-8-gram) is the dominant cost of each — the same
    share-the-scan rationale as _TRIPLES_MEMO. (dp_winnow itself stays
    un-memoized: it emits the positioned (doc, pos, fp) table and its
    bench time reflects the real fingerprinting cost.)"""
    from openie_spark.datapipe.textstats import winnow_fingerprints

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WINNOW_FP_MEMO:
        _evict_stale(_WINNOW_FP_MEMO, key)
        _WINNOW_FP_MEMO[key] = (
            winnow_fingerprints(_docs(spark, sf_dir))
            .select("doc_id", "fp").distinct()
            .localCheckpoint(eager=True))
    return _WINNOW_FP_MEMO[key]


_COMENTION_MEMO: dict = {}


def _comention_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full co-mention pair table (a, b, n_convs), computed ONCE
    per (application, sf_dir) and localCheckpointed: five queries
    (truss, clustering, assoc Dice, weighted PageRank, and the raw
    pair query's consumers) start from this table — the warehouse
    pattern again (a real deployment materializes the co-mention sink
    once and analytics read the TABLE), same rationale as
    _TRIPLES_MEMO. (kg_comention itself stays un-memoized so its
    bench time reflects the real build cost.)"""
    from openie_spark.kg.analytics import comention_pairs

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _COMENTION_MEMO:
        _evict_stale(_COMENTION_MEMO, key)
        _, edges = _graph_parts(spark, sf_dir)
        _COMENTION_MEMO[key] = comention_pairs(edges).localCheckpoint(
            eager=True)
    return _COMENTION_MEMO[key]


_SEEDBALL_MEMO: dict = {}


def _seedball_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The source-labeled truncated-BFS table (src, entity_id, dist),
    computed ONCE per (application, sf_dir) and localCheckpointed:
    kg_harmonic (per-src rollup) and kg_khop (min over src) both start
    from this table — previously each ran its own k-round BFS over the
    same seeds, and the labeled one dominated the analytics board.
    Warehouse pattern, same rationale as _COMENTION_MEMO."""
    from openie_spark.kg.analytics import seed_ball_distances

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SEEDBALL_MEMO:
        _evict_stale(_SEEDBALL_MEMO, key)
        nodes, edges = _graph_parts(spark, sf_dir)
        _SEEDBALL_MEMO[key] = seed_ball_distances(
            nodes, edges).localCheckpoint(eager=True)
    return _SEEDBALL_MEMO[key]


def _evict_stale(memo: dict, new_key) -> None:
    """Keep only the latest (application, sf_dir): a long-lived driver
    iterating sf dirs must not pin every dir's checkpointed tables for
    the application lifetime. unpersist() is best-effort (checkpoint
    blocks are reclaimed by the ContextCleaner once unreferenced) —
    dropping the dict reference is what matters."""
    for k in [k for k in memo if k != new_key]:
        vals = memo.pop(k)
        for df in (vals if isinstance(vals, tuple) else (vals,)):
            try:
                df.unpersist()
            except Exception:
                pass


_CARB_MEMO: dict = {}


def _carb_parts(spark: SparkSession, sf_dir: str):
    """The carb eval family's shared inputs, computed ONCE per
    (application, sf_dir): (gold, pred) where gold is the engine
    triples as scorer tuples WITH the normalized sentence key already
    computed, and pred is the deterministically degraded
    varied-confidence prediction side all four degraded-eval queries
    consume. Both are hash-REPARTITIONED on norm_key to the session
    shuffle parallelism and PERSISTED (cache, not localCheckpoint: a
    checkpointed RDD comes back as UnknownPartitioning, while the
    cached plan keeps its HashPartitioning) — the cogroup in every
    carb query then starts from co-partitioned children and elides
    both child exchanges (the keyed eval table is built and shuffled
    once, not once per query; the warehouse pattern, same rationale
    as _TRIPLES_MEMO)."""
    from openie_spark.datapipe.hashing import md5h60
    from openie_spark.eval.carb import normalize_key_col, triples_as_tuples

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CARB_MEMO:
        _evict_stale(_CARB_MEMO, key)
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        gold = (
            triples_as_tuples(_triples_memo(spark, sf_dir))
            .withColumn("norm_key", normalize_key_col(F.col("sent")))
            .repartition(n, "norm_key")
            .persist())
        gold.count()   # materialize eagerly, like the other memos
        pred = (
            gold
            .withColumn("args",
                        F.transform("args", lambda a: F.split(a, " ")[0]))
            .withColumn("confidence",
                        (F.pmod(md5h60(F.concat_ws("|", "sent", "pred")),
                                F.lit(4)) + 1) / 4.0)
            .persist())   # projection preserves the hash partitioning
        pred.count()
        _CARB_MEMO[key] = (gold, pred)
    return _CARB_MEMO[key]


def _q_carb_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CaRB scorer (E1-E6) on engine triples vs themselves — the parity
    self-check: P=R=F1=1 plus the gold-sentence count."""
    from openie_spark.eval.carb import carb_compare

    gold, _ = _carb_parts(spark, sf_dir)
    return carb_compare(gold, gold)


def _q_carb_degraded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CaRB scorer on deterministically degraded predictions (every arg
    truncated to its first token): non-trivial single-point P/R/F1.
    Greedy bipartite matching isn't SQL-expressible → rows-only check."""
    from openie_spark.eval.carb import carb_compare

    gold, pred = _carb_parts(spark, sf_dir)
    return carb_compare(gold, pred.drop("confidence"))


def _q_carb_pr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full E5 threshold sweep (reference carb.py:77-160 semantics) on
    deterministically degraded predictions with md5-derived varied
    confidences in {0.25, 0.5, 0.75, 1.0} — a 4-point PR curve. Greedy
    matching per threshold isn't SQL-expressible → rows-only check;
    value-pinned against a reference-loop transcription in
    tests/test_carb.py."""
    from openie_spark.eval.carb import carb_pr_curve

    gold, pred = _carb_parts(spark, sf_dir)
    return carb_pr_curve(gold, pred)


def _q_carb_o2o_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 sweep with the one-to-one recall strategy (reference
    benchmark.py:218-243 CaRB_compare recall_strategy='o2o') on the
    same degraded varied-confidence predictions as carb_pr_sweep.
    Greedy matching isn't SQL-expressible → rows-only; parity-pinned
    vs the imported reference in tests/test_benchmark.py."""
    from openie_spark.eval.carb import carb_pr_curve

    gold, pred = _carb_parts(spark, sf_dir)
    return carb_pr_curve(gold, pred, recall_strategy="o2o")


def _q_carb_oie16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oie16_compare flow (reference benchmark.py:48-121): boolean
    lexical matching with prediction consumption, sklearn-twin PR
    curve, recallMultiplier. One summary row. Sequential matching isn't
    SQL-expressible → rows-only; parity-pinned vs the imported
    reference in tests/test_benchmark.py."""
    from openie_spark.eval.benchmark import oie16_compare, oie16_summary_df

    gold, pred = _carb_parts(spark, sf_dir)
    return oie16_summary_df(spark, oie16_compare(gold, pred))


# ------------------------------------------------------------- KG F-H

_KG_MEMO: dict = {}


def _kg_parts(spark: SparkSession, sf_dir: str):
    """Shared KG upstream (triples → vocab → pairs → canon), computed
    ONCE per (application, sf_dir) and localCheckpointed: six driver
    queries consume these tables, and without the eager materialization
    each one re-ran the whole extraction chain from the parquet scan up
    (the round-1 bench's single biggest waste). The warehouse analogue
    is pipeline.py materializing each stage as a table."""
    from openie_spark.kg.canon import canonical_map, connected_components
    from openie_spark.kg.linking import exact_pairs
    from openie_spark.kg.mentions import extract_mentions, mention_vocab

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _KG_MEMO:
        _evict_stale(_KG_MEMO, key)
        triples = _triples_memo(spark, sf_dir)
        vocab = mention_vocab(extract_mentions(triples)).localCheckpoint(eager=True)
        pairs = exact_pairs(vocab).localCheckpoint(eager=True)
        canon = canonical_map(
            vocab, connected_components(pairs)).localCheckpoint(eager=True)
        _KG_MEMO[key] = (triples, vocab, pairs, canon)
    return _KG_MEMO[key]


_GRAPH_MEMO: dict = {}


def _graph_parts(spark: SparkSession, sf_dir: str):
    """Materialized (nodes, edges) — the analytics queries' input
    tables, checkpointed ONCE per (application, sf_dir) exactly like
    the pipeline materializes its nodes/edges stages (a warehouse
    consumer reads the edge TABLE; it does not re-join triples per
    query). kg_nodes / kg_edges themselves stay un-memoized so their
    bench numbers reflect the real build cost."""
    from openie_spark.kg.graph import build_edges, build_nodes

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _GRAPH_MEMO:
        _evict_stale(_GRAPH_MEMO, key)
        triples, _, _, canon = _kg_parts(spark, sf_dir)
        _GRAPH_MEMO[key] = (
            build_nodes(canon).localCheckpoint(eager=True),
            build_edges(triples, canon, strategy="broadcast").localCheckpoint(eager=True),
        )
    return _GRAPH_MEMO[key]


def _q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.kg.mentions import extract_mentions

    triples, _, _, _ = _kg_parts(spark, sf_dir)
    return extract_mentions(triples).select(
        "conv_id", "turn_idx", "sent_idx", "ext_idx", "side", "mention", "norm")


def _q_kg_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, pairs, _ = _kg_parts(spark, sf_dir)
    return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _q_kg_pairs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-LSH pair path (scale variant). md5-derived hashes make
    the full LSH structure DuckDB-recomputable (kg_pairs_minhash_sql);
    recall vs exact additionally pinned in tests/test_kg.py."""
    from openie_spark.kg.linking import minhash_pairs

    _, vocab, _, _ = _kg_parts(spark, sf_dir)
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
    from openie_spark.kg.graph import degree_stats

    _, edges = _graph_parts(spark, sf_dir)
    return degree_stats(edges)


def _q_kg_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted relation edges (src, dst, pred, support counts) — the
    compact graph-materialize sink a KG consumer reads instead of the
    occurrence-scale provenance edges."""
    from openie_spark.kg.analytics import relation_weights

    _, edges = _graph_parts(spark, sf_dir)
    return relation_weights(edges)


def _q_kg_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Display-name selection per entity: max-freq alias, ties to the
    shorter then lexicographically smaller string (vocab-scale)."""
    from openie_spark.kg.graph import display_labels

    _, _, _, canon = _kg_parts(spark, sf_dir)
    return display_labels(canon)


def _q_kg_entity_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rule-ladder entity typing over the nodes table
    (year/numeric/code/measure/person/org/place/phrase/term)."""
    from openie_spark.kg.enrich import entity_types

    nodes, _ = _graph_parts(spark, sf_dir)
    return entity_types(nodes)


def _q_kg_relation_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical relations: surface predicates grouped by their
    aux-stripped suffix-rule lemma key, with the sorted surface-form
    inventory and summed support."""
    from openie_spark.kg.enrich import relation_canon

    _, edges = _graph_parts(spark, sf_dir)
    return relation_canon(edges)


def _q_kg_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation salient entities: top-k by the exact-integer
    tf*idf-style score (no float log to drift between engines)."""
    from openie_spark.kg.enrich import entity_salience

    _, edges = _graph_parts(spark, sf_dir)
    return entity_salience(edges)


def _q_kg_topic_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling-style topic segmentation: exact-ppm token overlap
    with the previous turn, running boundary sum — one conv window."""
    from openie_spark.kg.dialogue import topic_segments
    from openie_spark.sources.transcripts import read_transcripts

    return topic_segments(read_transcripts(_tune(spark), sf_dir))


def _q_kg_dialogue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation dialogue analytics (turn/role mix, tool usage,
    wall-clock span, assistant/user verbosity ppm, longest same-role
    run) — one conv-window shuffle + two partial-agg rollups, exact
    integer arithmetic throughout."""
    from openie_spark.kg.dialogue import dialogue_stats
    from openie_spark.sources.transcripts import read_transcripts

    return dialogue_stats(read_transcripts(_tune(spark), sf_dir))


def _q_kg_coref_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges recovered by applying coref-lite resolutions to the
    normalized triples (repaired fragment endpoints -> entities)."""
    from openie_spark.kg.coref import coref_edges

    triples, _, _, canon = _kg_parts(spark, sf_dir)
    return coref_edges(triples, canon)


def _q_kg_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema induction: top type signatures (src_type, dst_type) per
    canonical relation with exact-ppm edge shares."""
    from openie_spark.kg.enrich import relation_schema

    nodes, edges = _graph_parts(spark, sf_dir)
    return relation_schema(edges, nodes)


def _q_kg_coref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coref-lite: each pronoun occurrence resolved to the most recent
    prior entity mention in its conversation (recency heuristic) — one
    conv-partitioned window, no joins."""
    from openie_spark.kg.coref import resolve_pronouns

    triples, _, _, _ = _kg_parts(spark, sf_dir)
    return resolve_pronouns(triples)


def _q_kg_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal KG edges: relation validity intervals [first_us,
    last_us] from the turn timestamps — one equi-join on the
    (conv_id, turn_idx) provenance key plus one grouped aggregate."""
    from openie_spark.kg.analytics import temporal_relations
    from openie_spark.sources.transcripts import read_transcripts

    _, edges = _graph_parts(spark, sf_dir)
    return temporal_relations(edges, read_transcripts(_tune(spark), sf_dir))


def _q_kg_export_nt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Triples export sink: node-label + distinct-relation lines,
    map-only over the materialized graph tables."""
    from openie_spark.kg.analytics import export_ntriples

    nodes, edges = _graph_parts(spark, sf_dir)
    return export_ntriples(nodes, edges)


def _q_kg_segment_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salience re-scoped to topic segments: entity_salience's exact-
    integer score over (conv_id, seg_idx) units."""
    from openie_spark.kg.dialogue import topic_segments
    from openie_spark.kg.enrich import segment_salience
    from openie_spark.sources.transcripts import read_transcripts

    _, edges = _graph_parts(spark, sf_dir)
    return segment_salience(
        edges, topic_segments(read_transcripts(_tune(spark), sf_dir)))


def _q_kg_metapaths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed 2-hop metapath statistics: top patterns by distinct-path
    count over the canon-relation table with hub-capped adjacency."""
    from openie_spark.kg.analytics import metapath_counts

    nodes, edges = _graph_parts(spark, sf_dir)
    return metapath_counts(nodes, edges)


def _q_kg_export_graphml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphML interchange fragments (part, line, xml) — reassemble by
    ORDER BY part, line; map-only plus one relation distinct."""
    from openie_spark.kg.analytics import export_graphml

    nodes, edges = _graph_parts(spark, sf_dir)
    return export_graphml(nodes, edges)


def _q_kg_comention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity co-mention graph (same-conversation association pairs,
    per-conv entity cap bounding the self-join fan-out)."""
    from openie_spark.kg.analytics import comention_pairs

    _, edges = _graph_parts(spark, sf_dir)
    return comention_pairs(edges)


def _q_kg_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural entity similarity: neighbor-set Jaccard over the
    undirected graph (capped pivot adjacency, exact integer ppm)."""
    from openie_spark.kg.analytics import neighbor_jaccard

    _, edges = _graph_parts(spark, sf_dir)
    return neighbor_jaccard(edges)


def _q_kg_linkpred_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction: non-adjacent entity pairs
    ranked by sum(1/deg) over shared neighbors (exact integer ppm)."""
    from openie_spark.kg.analytics import resource_allocation

    _, edges = _graph_parts(spark, sf_dir)
    return resource_allocation(edges)


def _q_kg_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tail-corruption negative samples for KGE
    training (md5 hash-ring pick, broadcast representative table)."""
    from openie_spark.kg.analytics import negative_samples

    nodes, edges = _graph_parts(spark, sf_dir)
    return negative_samples(nodes, edges)


def _q_dp_ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase) — one
    shuffle: running-min windows + a grouped aggregate."""
    from openie_spark.datapipe.events import funnel_progress

    return funnel_progress(_events(spark, sf_dir))


def _q_dp_ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity cohort retention: first-active-day cohorts,
    per-offset distinct-user activity, exact integer-ppm rate."""
    from openie_spark.datapipe.events import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir))


def _q_dp_bloom_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter with exact audit (planted
    exact twins as ground truth): ≤m_bits broadcast bitmap, k-bit
    probe join, one partial agg — the shuffle-free anti-join stand-in."""
    from openie_spark.datapipe.decontam import bloom_flags, planted_exact

    return bloom_flags(planted_exact(_docs(spark, sf_dir)))


def _q_dp_ev_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature rollup (event counts, active days,
    top type by min-by vote, epoch-micros bounds, exact cents sums) —
    two partial-agg shuffles + user-sized joins, no windows."""
    from openie_spark.datapipe.events import user_profiles

    return user_profiles(_events(spark, sf_dir))


def _q_dp_ev_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type Markov transition matrix: per-user chronologically
    adjacent type bigrams with exact row-normalized ppm shares — one
    user_id window shuffle, types²-bounded output."""
    from openie_spark.datapipe.events import event_transitions

    return event_transitions(_events(spark, sf_dir))


def _q_dp_ev_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 sequential pattern mining: per-user chronologically
    adjacent event-type trigrams with occurrence and distinct-user
    support — the same user_id window shuffle as the transition
    matrix, types³-bounded output."""
    from openie_spark.datapipe.events import event_trigrams

    return event_trigrams(_events(spark, sf_dir))


def _q_kg_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-assortativity sufficient statistics over the undirected
    simple graph: one row of exact BIGINT sums (Newman's r follows in
    one offline division — no float quotient to drift)."""
    from openie_spark.kg.analytics import degree_mixing_sums

    _, edges = _graph_parts(spark, sf_dir)
    return degree_mixing_sums(edges)


def _q_dp_ev_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type: integer epoch-hour
    mod 24 cells with distinct-user reach and exact-ppm type shares —
    one 24×types-bounded partial agg."""
    from openie_spark.datapipe.events import hourly_profile

    return hourly_profile(_events(spark, sf_dir))


def _q_dp_ev_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly flags per event type: integer
    nearest-rank median/MAD, modified-z-score cutoff."""
    from openie_spark.datapipe.events import daily_anomalies

    return daily_anomalies(_events(spark, sf_dir))


def _conv_parity(col: str = "conv_id") -> F.Column:
    """Deterministic 2-way conv split (md5 last hex digit parity) —
    engine-portable, used to stage the incremental-equivalence
    queries."""
    return F.conv(F.substring(F.md5(col), 32, 1), 16, 10).cast("int") % 2


_INCR_MEMO: dict = {}


def _incremental_parts(spark: SparkSession, sf_dir: str):
    """Build the KG on the even-parity half of the conversations, then
    MERGE the odd half through the incremental algebra
    (kg/incremental.py). The consuming queries' oracles are the
    FULL-recompute SQL — a hash match IS the proof that
    incremental(old ⊎ delta) ≡ full(old ∪ delta).

    Memoized per (application, sf_dir) like _kg_parts: the nodes and
    edges queries consume the SAME merged canonical map, and without
    the memo each re-ran the whole prior-graph build + merge (the two
    queries cost 18 s + 22 s in the r3 bench; the shared build is paid
    once, by whichever consumer runs first)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _INCR_MEMO:
        return _INCR_MEMO[key]
    _evict_stale(_INCR_MEMO, key)
    from openie_spark.kg.canon import canonical_map, connected_components
    from openie_spark.kg.incremental import (
        incremental_exact_pairs,
        merge_components,
        merge_vocab,
    )
    from openie_spark.kg.linking import exact_pairs
    from openie_spark.kg.mentions import extract_mentions, mention_vocab

    triples = _triples_memo(spark, sf_dir)
    old_t = triples.filter(_conv_parity() == 0)
    delta_t = triples.filter(_conv_parity() == 1)

    vocab_old = mention_vocab(extract_mentions(old_t)).localCheckpoint(eager=False)
    pairs_old = exact_pairs(vocab_old).localCheckpoint(eager=False)
    canon_old = canonical_map(vocab_old, connected_components(pairs_old)) \
        .localCheckpoint(eager=False)

    vocab_m = merge_vocab(vocab_old, mention_vocab(extract_mentions(delta_t)))
    pairs_m = incremental_exact_pairs(pairs_old, vocab_old, vocab_m) \
        .localCheckpoint(eager=False)
    canon_m = canonical_map(vocab_m, merge_components(canon_old, pairs_m)) \
        .localCheckpoint(eager=False)
    _INCR_MEMO[key] = (old_t, delta_t, canon_old, canon_m, pairs_m)
    return _INCR_MEMO[key]


def _q_kg_nodes_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node table built INCREMENTALLY (even-conv graph + odd-conv
    delta merged via touched-block pair recompute + seeded component
    merge) — oracle = the full-recompute kg_nodes SQL, so hash-green
    means the incremental algebra is exact."""
    from openie_spark.kg.graph import build_nodes

    _, _, _, canon_m, _ = _incremental_parts(spark, sf_dir)
    return build_nodes(canon_m).select("entity_id", "canonical", "n_aliases", "freq")


def _q_kg_edges_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge table built incrementally: old-half edges rewritten with a
    broadcast entity-id remap (map-only — old occurrence data is never
    re-normalized or re-joined), delta-half edges built against the
    merged canon, unioned. Oracle = full-recompute kg_edges SQL."""
    from openie_spark.kg.graph import build_edges
    from openie_spark.kg.incremental import entity_remap, remap_edges

    old_t, delta_t, canon_old, canon_m, _ = _incremental_parts(spark, sf_dir)
    old_edges = build_edges(old_t, canon_old, strategy="broadcast")
    remap = entity_remap(canon_old, canon_m)
    delta_edges = build_edges(delta_t, canon_m, strategy="broadcast")
    return remap_edges(old_edges, remap).unionByName(delta_edges)


def _q_kg_pairs_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linking-candidate pairs built INCREMENTALLY (touched-block
    recompute + untouched-block keep-filter over the even/odd conv
    split) — oracle = the full-recompute kg_pairs_exact SQL, so
    hash-green proves pair generation's incremental algebra exact,
    independent of the downstream component/canon merges. Same
    round-6 jaccard projection as kg_pairs_exact (the oracle rounds)."""
    _, _, _, _, pairs_m = _incremental_parts(spark, sf_dir)
    return pairs_m.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _q_kg_statement_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role provenance per statement (user-asserted vs model-generated
    vs tool-retrieved mention counts + exact tool-source ppm) — the
    trust signal weighed before acting on a KG fact; one provenance
    equi-join + one statement rollup."""
    from openie_spark.kg.enrich import statement_role_provenance
    from openie_spark.sources.transcripts import read_transcripts

    _, edges = _graph_parts(spark, sf_dir)
    return statement_role_provenance(
        edges, read_transcripts(_tune(spark), sf_dir))


def _q_kg_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality for the md5 seed slice (sampled-
    sources protocol): per-seed round-half-up sum of 1e6/d over the
    k-hop ball — one groupBy(src) rollup over the memoized labeled-BFS
    table shared with kg_khop."""
    from openie_spark.kg.analytics import harmonic_centrality

    nodes, edges = _graph_parts(spark, sf_dir)
    return harmonic_centrality(nodes, edges,
                               ball=_seedball_memo(spark, sf_dir))


def _q_kg_seed_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-to-seed landmark distance matrix (src, dst, dist 1..K):
    a map-only md5-ticket filter over the memoized labeled-BFS ball
    shared with kg_khop/kg_harmonic — no BFS, no join of its own."""
    from openie_spark.kg.analytics import seed_pair_distances

    nodes, edges = _graph_parts(spark, sf_dir)
    return seed_pair_distances(nodes, edges,
                               ball=_seedball_memo(spark, sf_dir))


def _q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (5 iterations, rank units of 1e9) over
    the canonical entity graph — per round one shuffle join + partial
    agg, iterations chained lazily into one fused job. Integer floor
    arithmetic makes the result partitioning-independent, so the
    DuckDB oracle (unrolled CTEs) matches bit-for-bit."""
    from openie_spark.kg.analytics import pagerank

    nodes, edges = _graph_parts(spark, sf_dir)
    return pagerank(nodes, edges)


def _q_kg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity triangle participation via degree-oriented edge
    listing (each undirected edge points small->(deg,id)->large, so a
    hub's out-list is O(sqrt(m)) and the triangle join fan-out is
    bounded even on power-law graphs)."""
    from openie_spark.kg.analytics import triangle_counts

    nodes, edges = _graph_parts(spark, sf_dir)
    return triangle_counts(nodes, edges)


def _q_kg_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph health metrics (tidy metric/value rows): node/edge counts
    per granularity, isolated entities, max/total degree — the report
    a pipeline run publishes next to its manifests."""
    from openie_spark.kg.analytics import graph_summary

    nodes, edges = _graph_parts(spark, sf_dir)
    return graph_summary(nodes, edges)


def _q_kg_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity activity timeline (epoch-micros first/last, distinct
    conversations and UTC days) — one ts equi-join + endpoint union +
    one entity rollup."""
    from openie_spark.kg.analytics import entity_timeline
    from openie_spark.sources.transcripts import read_transcripts

    _, edges = _graph_parts(spark, sf_dir)
    return entity_timeline(edges, read_transcripts(spark, sf_dir))


def _q_kg_reply_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assistant reply latency per conversation (adjacent user ->
    assistant transitions, integer minutes) — one conv-window lag +
    one partial-agg rollup."""
    from openie_spark.kg.analytics import reply_latency
    from openie_spark.sources.transcripts import read_transcripts

    return reply_latency(read_transcripts(_tune(spark), sf_dir))


def _q_kg_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation extraction yield audit (coverage and
    triples-per-turn exact-ppm rates) — two partial-agg conv rollups
    plus one left join, over the memoized extraction table."""
    from openie_spark.kg.analytics import extraction_yield
    from openie_spark.sources.transcripts import read_transcripts

    return extraction_yield(
        read_transcripts(_tune(spark), sf_dir),
        _triples_memo(spark, sf_dir))


def _q_kg_edge_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8/1/1 md5-ticket train/valid/test split of the
    distinct statements with the filtered-eval flag (both endpoints +
    relation seen in train) — one distinct shuffle + three semi-join
    flags against train-scale sets."""
    from openie_spark.kg.analytics import edge_split

    _, edges = _graph_parts(spark, sf_dir)
    return edge_split(edges)


def _q_kg_community_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community quality rollup (size, intra vs cut edges, degree
    mass, intra-ppm — the exact-integer modularity summands) over the
    LPA labeling."""
    from openie_spark.kg.analytics import community_stats

    nodes, edges = _graph_parts(spark, sf_dir)
    return community_stats(nodes, edges)


def _q_kg_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (4 rounds, pinned
    count-DESC/label-ASC tie-break) over the undirected canonical
    entity graph — one vote-count shuffle + node-sized top-1 window
    per round, labels localCheckpointed between rounds."""
    from openie_spark.kg.analytics import label_prop_communities

    nodes, edges = _graph_parts(spark, sf_dir)
    return label_prop_communities(nodes, edges)


def _q_kg_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-driven walk corpus from the md5-ticket seed
    slice (node2vec-style KGE training input, no RNG state): per step
    one frontier equi-join + one partial-agg min-of-struct."""
    from openie_spark.kg.analytics import hash_walks

    nodes, edges = _graph_parts(spark, sf_dir)
    return hash_walks(nodes, edges)


def _q_kg_walk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context, n_pairs) co-occurrence table from
    the hash-walk corpus (|step distance| <= window) — the word2vec/
    DeepWalk training input; walk-sized self-join + one partial agg."""
    from openie_spark.kg.analytics import walk_skipgram_pairs

    nodes, edges = _graph_parts(spark, sf_dir)
    return walk_skipgram_pairs(nodes, edges)


def _q_kg_conv_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate conversation pairs: turn-flattened conversations
    (+ planted perturbed twins as ground truth) through the standard
    minhash-LSH + exact-Jaccard pair path — catches re-run agent
    transcripts that turn-level dedup never sees."""
    from openie_spark.kg.dialogue import conv_neardup_pairs
    from openie_spark.sources.transcripts import read_transcripts

    return conv_neardup_pairs(read_transcripts(_tune(spark), sf_dir))


def _q_kg_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned degree distribution (bit-length bins, isolated
    nodes at bin 0) — the skew profile that sizes salting/hub caps;
    one degree agg + one ≤64-group collapse."""
    from openie_spark.kg.analytics import degree_histogram

    nodes, edges = _graph_parts(spark, sf_dir)
    return degree_histogram(nodes, edges)


def _q_kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core membership + residual core degree via monotone peeling
    (converges in a handful of node-sized semi-join/agg rounds; fails
    loudly rather than returning an unpeeled core)."""
    from openie_spark.kg.analytics import kcore

    nodes, edges = _graph_parts(spark, sf_dir)
    return kcore(nodes, edges)


def _q_kg_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss edge decomposition over the entity CO-MENTION graph
    (edges embedded in >= 1 triangle within the surviving set,
    monotone peel — the edge-level k-core). The relation KG itself is
    near-bipartite (subject->object edges; triangle-free on this
    corpus at every sf), so the truss runs where triangles live:
    conversations mentioning >= 3 entities contribute cliques.
    Restricted to the REPEATED backbone (n_convs >= 2): a single
    conversation's clique puts every one of its edges in trivial
    triangles — support there measures conversation size, not
    association strength — and those one-off cliques also dominate
    the enumeration cost (the full-graph truss at sf0.1 spends ~106s
    confirming noise the min-conv floor removes for 6s)."""
    from pyspark.sql import functions as F

    from openie_spark.kg.analytics import ASSOC_MIN_CONVS, truss

    nodes, _ = _graph_parts(spark, sf_dir)
    co = (_comention_memo(spark, sf_dir)
          .where(F.col("n_convs") >= ASSOC_MIN_CONVS)
          .select(F.col("a").alias("src_id"), F.col("b").alias("dst_id")))
    return truss(nodes, co)


def _q_kg_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA hub/authority scores: integer-exact degree-normalized
    HITS over the simple directed graph, 5 Gauss-Seidel steps."""
    from openie_spark.kg.analytics import salsa

    nodes, edges = _graph_parts(spark, sf_dir)
    return salsa(nodes, edges)


def _q_kg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients over the REPEATED co-mention
    backbone (n_convs >= 2 — the same base and the same rationale as
    kg_truss: one-off conversation cliques force cc ~ 1 on every
    member, measuring conversation size rather than neighborhood
    cohesion, and their triangles dominated the enumeration — 35s of
    the sf0.1 bench vs ~2s on the backbone)."""
    from pyspark.sql import functions as F

    from openie_spark.kg.analytics import (
        ASSOC_MIN_CONVS,
        clustering_coefficients,
    )

    nodes, _ = _graph_parts(spark, sf_dir)
    co = (_comention_memo(spark, sf_dir)
          .where(F.col("n_convs") >= ASSOC_MIN_CONVS)
          .select(F.col("a").alias("src_id"), F.col("b").alias("dst_id")))
    return clustering_coefficients(nodes, co)


def _q_kg_rel_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-style per-relation cardinality profile (functionality and
    inverse functionality as exact round-half-up ppm)."""
    from openie_spark.kg.analytics import relation_cardinality

    _, edges = _graph_parts(spark, sf_dir)
    return relation_cardinality(edges)


def _q_kg_assoc_dice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity association strength: co-mention pairs scored by exact
    integer-ppm Dice over conversation support (min support 2)."""
    from openie_spark.kg.analytics import assoc_dice

    _, edges = _graph_parts(spark, sf_dir)
    return assoc_dice(edges)


def _q_kg_wpagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the co-mention graph (w = conversation
    support), integer-exact with the overflow-free share split."""
    from pyspark.sql import functions as F

    from openie_spark.kg.analytics import weighted_pagerank

    nodes, _ = _graph_parts(spark, sf_dir)
    pairs = _comention_memo(spark, sf_dir).select(
        "a", "b", F.col("n_convs").alias("w"))
    return weighted_pagerank(nodes, pairs)


def _q_kg_support_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned statement-support distribution (how often each
    distinct statement is re-asserted) — the KG trust profile."""
    from openie_spark.kg.analytics import support_histogram

    _, edges = _graph_parts(spark, sf_dir)
    return support_histogram(edges)


def _q_kg_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-lite relation implication mining: ordered canonical-
    relation pairs with joint support and exact-ppm standard
    confidence — the ontology-merge candidate table."""
    from openie_spark.kg.analytics import rule_implications

    _, edges = _graph_parts(spark, sf_dir)
    return rule_implications(edges)


def _q_kg_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contradiction candidates: multi-object subjects on relations
    the corpus itself measures as near-functional — the KG trust
    triage queue."""
    from openie_spark.kg.analytics import functional_conflicts

    _, edges = _graph_parts(spark, sf_dir)
    return functional_conflicts(edges)


def _q_kg_type_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed quotient graph: the entity graph collapsed to rule-ladder
    entity types (<= |types|^2 rows) with edge/statement/relation/
    endpoint counts per type pair."""
    from openie_spark.kg.analytics import type_pair_graph

    nodes, edges = _graph_parts(spark, sf_dir)
    return type_pair_graph(nodes, edges)


def _q_kg_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG growth curve: per-epoch-day first-seen entity/statement
    counts with running cumulative totals."""
    from openie_spark.kg.analytics import kg_growth
    from openie_spark.sources.transcripts import read_transcripts

    _, edges = _graph_parts(spark, sf_dir)
    return kg_growth(edges, read_transcripts(_tune(spark), sf_dir))


def _q_kg_linking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linking-stage quality audit: one-row recall of the minhash-LSH
    candidate path against the blocked exact-Jaccard ground truth
    (plus the extra pairs LSH finds that prefix blocking missed) —
    the P/R gate a production run asserts before publishing a
    re-linked graph."""
    from openie_spark.kg.linking import minhash_pairs, pair_generation_audit

    _, vocab, pairs, _ = _kg_parts(spark, sf_dir)
    return pair_generation_audit(pairs, minhash_pairs(vocab))


def _q_dp_ev_gap_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram (log2 whole-second bins) — the
    empirical basis for the sessionization gap threshold; one user
    window + <= 64-group collapse."""
    from openie_spark.datapipe.events import gap_histogram

    return gap_histogram(_events(spark, sf_dir))


def _q_kg_alias_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias-count histogram over the node table — the over/under-
    merge audit of canonicalization; map-only + tiny collapse."""
    from openie_spark.kg.analytics import alias_histogram

    nodes, _ = _graph_parts(spark, sf_dir)
    return alias_histogram(nodes)


def _q_kg_role_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-protocol transition matrix: adjacent-turn role
    bigrams with conv support and exact row-normalized ppm — one conv
    window shuffle, roles²-bounded output."""
    from openie_spark.kg.dialogue import role_transitions
    from openie_spark.sources.transcripts import read_transcripts

    return role_transitions(read_transcripts(_tune(spark), sf_dir))


def _q_kg_tool_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool usage profile over the agent corpus: call volume, conv
    support, payload chars, and integer-minute turnaround to the next
    turn — one conv window shuffle, tools-sized output."""
    from openie_spark.kg.dialogue import tool_stats
    from openie_spark.sources.transcripts import read_transcripts

    return tool_stats(read_transcripts(_tune(spark), sf_dir))


def _q_kg_tool_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-invocation transition matrix (workflow mining): adjacent
    tool calls per conversation with conv support and exact row ppm —
    role_transitions' twin on the tool axis."""
    from openie_spark.kg.dialogue import tool_sequences
    from openie_spark.sources.transcripts import read_transcripts

    return tool_sequences(read_transcripts(_tune(spark), sf_dir))


def _q_dp_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned document-length profile (token counts; empty docs
    in bin 0) — the corpus shape report, <= 64 rows; map-only count
    plus one tiny collapse."""
    from openie_spark.datapipe.textstats import length_histogram

    return length_histogram(_docs(spark, sf_dir))


def _q_kg_kge_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-ranking KGE evaluation harness (Bordes 2013 protocol)
    over the graph's own split + negatives, scored with md5-integer
    TransE-L1 stand-in embeddings — certifies the eval machinery
    (ranks, tie order, MRR/Hits rollups) bit-for-bit."""
    from openie_spark.kg.analytics import kge_rank_eval

    nodes, edges = _graph_parts(spark, sf_dir)
    return kge_rank_eval(nodes, edges)


def _q_kg_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-sliced KG: statements known at the corpus-midpoint cutoff
    with at-T mention counts — the temporal materialization's
    headline consumer query."""
    from openie_spark.kg.analytics import kg_snapshot
    from openie_spark.sources.transcripts import read_transcripts

    _, edges = _graph_parts(spark, sf_dir)
    return kg_snapshot(edges, read_transcripts(_tune(spark), sf_dir))


def _q_kg_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-skew observability (the lineage metric the pipeline
    records per vocab stage, as a first-class query): block counts,
    hot blocks over the MAX_BLOCK cap, and the mentions those drops
    cost — the number a production run watches before re-linking.
    Measured over the LINKABLE slice (n_tokens <= MAX_MENTION_TOKENS),
    the exact population exact_pairs/editdist_pairs block — so the
    readout is the pair-stage view, not a vocabulary superset."""
    from openie_spark.kg.linking import linkable, skew_stats

    _, vocab, _, _ = _kg_parts(spark, sf_dir)
    return skew_stats(linkable(vocab))


def _q_kg_pairs_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant linking candidates: capped blocking + Levenshtein
    <= 3 verification with the threshold pushed into Spark's early-
    exit three-arg levenshtein."""
    from openie_spark.kg.linking import editdist_pairs

    _, vocab, _, _ = _kg_parts(spark, sf_dir)
    return editdist_pairs(vocab)


def _q_kg_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the materialized graph (six
    must-be-zero counts: dangling endpoints, duplicate ids, self
    loops, broken display rows) — anti-joins + filters over id-width
    projections, the publish gate a production run asserts on."""
    from openie_spark.kg.analytics import graph_integrity
    from openie_spark.kg.graph import display_labels

    nodes, edges = _graph_parts(spark, sf_dir)
    _, _, _, canon = _kg_parts(spark, sf_dir)
    return graph_integrity(nodes, edges, display_labels(canon))


def _q_kg_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank anchored on the md5-ticket seed slice
    (integer-exact seed-teleport recurrence, partition-once iterate-
    lazily shape shared with kg_pagerank)."""
    from openie_spark.kg.analytics import personalized_pagerank

    nodes, edges = _graph_parts(spark, sf_dir)
    return personalized_pagerank(nodes, edges)


def _q_kg_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop BFS (K=3) from a deterministic md5-ticket seed slice over
    the undirected canonical entity graph: min hop distance per
    reachable entity — derived as min-over-sources from the memoized
    labeled-BFS table shared with kg_harmonic (seed-set distance ==
    min per-source distance; one partial-agg groupBy)."""
    from openie_spark.kg.analytics import khop_distances

    nodes, edges = _graph_parts(spark, sf_dir)
    return khop_distances(nodes, edges,
                          ball=_seedball_memo(spark, sf_dir))


# ------------------------------------------------- datapipe (documents)

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tune(spark).read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tune(spark).read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tune(spark).read.parquet(f"{sf_dir}/events.parquet")


def _q_dp_ev_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream table —
    lag-flag + running-sum over one user_id window; integer-microsecond
    time arithmetic keeps it engine-portable."""
    from openie_spark.datapipe.events import session_stats

    return session_stats(_events(spark, sf_dir))


def _q_dp_ev_sessions_sw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gap sessions via Spark's NATIVE session_window merge —
    the exact aggregation that runs incrementally under Structured
    Streaming (streaming/ingest.streaming_session_stats)."""
    from openie_spark.datapipe.events import session_window_stats

    return session_window_stats(_events(spark, sf_dir))


def _q_dp_ev_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts/value sums per event_type (F.window) —
    same expression runs under Structured Streaming with a watermark."""
    from openie_spark.datapipe.events import windowed_counts

    return windowed_counts(_events(spark, sf_dir))


def _q_dp_ev_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (20 min / 5 min slide) counts, distinct users and
    value sums per event_type — native F.window(ts, L, S) explode."""
    from openie_spark.datapipe.events import sliding_counts

    return sliding_counts(_events(spark, sf_dir))


def _q_dp_ev_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: per active epoch day, DAU, trailing-7-day
    WAU, and the exact-ppm DAU/WAU stickiness ratio."""
    from openie_spark.datapipe.events import active_users

    return active_users(_events(spark, sf_dir))


def _q_dp_ev_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type affinity: same-session co-membership scored by
    exact-integer Dice (the market-basket view of the stream)."""
    from openie_spark.datapipe.events import type_affinity

    return type_affinity(_events(spark, sf_dir))


def _q_dp_ev_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value-cents quantile sketch (bottom-k-by-hash uniform
    sample, nearest-rank integer quantiles, exact n/min/max)."""
    from openie_spark.datapipe.events import value_quantiles

    return value_quantiles(_events(spark, sf_dir))


def _q_dp_ev_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction from the semi-structured props column."""
    from openie_spark.datapipe.events import props_k

    return props_k(_events(spark, sf_dir))


def _q_dp_ev_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest same-user 'error' event at-or-before each
    event — union-marker + one window (one shuffle), not a theta
    join."""
    from openie_spark.datapipe.events import asof_last_ref

    return asof_last_ref(_events(spark, sf_dir))


def _q_dp_ev_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval range join: events inside any same-user
    [error.ts, error.ts + 15 min) window — interval-to-bucket
    expansion turns the range predicate into an equi-join (the oracle
    is the naive theta join)."""
    from openie_spark.datapipe.events import interval_events

    return interval_events(_events(spark, sf_dir))


def _q_dp_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs(spark, sf_dir))


def _q_dp_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned exact-duplicate group-size profile — the dedup
    audit readout (unique mass vs removable redundancy), <= 64 rows."""
    from openie_spark.datapipe.dedup import dup_group_histogram

    return dup_group_histogram(_docs(spark, sf_dir))


def _q_dp_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs ground truth — quadratic by design, so the query
    caps the corpus at a deterministic doc_id slice (the LSH paths
    below run uncapped; this one exists to verify them)."""
    from openie_spark.datapipe.dedup import NGRAM_CAP, ngram_jaccard_pairs, planted_docs

    return ngram_jaccard_pairs(
        planted_docs(_docs(spark, sf_dir).filter(F.col("doc_id") < NGRAM_CAP)))


def _q_dp_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.dedup import minhash_pairs_docs, planted_docs

    return minhash_pairs_docs(planted_docs(_docs(spark, sf_dir)))


def _q_dp_ev_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: active users decomposed into new /
    retained / resurrected — one (user, day) dedup + one user window +
    a day-bounded rollup."""
    from openie_spark.datapipe.events import growth_accounting

    return growth_accounting(_events(spark, sf_dir))


def _q_dp_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-stage quality audit (the kg_linking_eval twin on the
    document axis): one-row recall of the minhash-LSH candidate path
    against the exact all-pairs n-gram ground truth, both on the SAME
    capped planted slice."""
    from openie_spark.datapipe.dedup import (
        NGRAM_CAP,
        minhash_pairs_docs,
        ngram_jaccard_pairs,
        planted_docs,
    )
    from openie_spark.kg.linking import pair_generation_audit

    capped = planted_docs(_docs(spark, sf_dir).filter(F.col("doc_id") < NGRAM_CAP))
    capped = capped.localCheckpoint(eager=False)   # both generators share it
    return pair_generation_audit(
        ngram_jaccard_pairs(capped), minhash_pairs_docs(capped))


def _q_dp_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated substrings (Lee et al. 2022 ExactSubstr as
    distributed gram-hash counting): maximal token spans whose every
    10-token gram occurs >= 2 times in the planted corpus — one shuffle
    on the gram hash, one on doc_id for the island merge."""
    from openie_spark.datapipe.dedup import planted_docs, substr_dup_spans

    return substr_dup_spans(planted_docs(_docs(spark, sf_dir)))


def _q_dp_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.dedup import planted_docs, simhash_docs

    return simhash_docs(planted_docs(_docs(spark, sf_dir)))


def _q_dp_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.dedup import planted_docs, simhash_pairs

    return simhash_pairs(planted_docs(_docs(spark, sf_dir)))


def _q_dp_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.textstats import doc_stats

    return doc_stats(_docs(spark, sf_dir))


def _q_dp_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def _q_dp_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.textstats import token_count_bpe

    return token_count_bpe(_docs(spark, sf_dir))


def _q_dp_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def _q_dp_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (SIGMOD'03): per-window minimum
    k-gram hash, rightmost on ties — map-only, zero shuffles."""
    from openie_spark.datapipe.textstats import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir))


def _q_dp_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level near-dup pairs from shared winnow fingerprints
    (boilerplate buckets dropped whole; exact-ppm set Jaccard)."""
    from openie_spark.datapipe.dedup import winnow_pairs

    return winnow_pairs(_docs(spark, sf_dir),
                        fp=_winnow_fp_memo(spark, sf_dir))


def _q_dp_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs over winnow fingerprint sets —
    the quote/excerpt signal Jaccard misses (both directional ppm
    ratios, either-side threshold)."""
    from openie_spark.datapipe.dedup import containment_pairs

    return containment_pairs(_docs(spark, sf_dir),
                             fp=_winnow_fp_memo(spark, sf_dir))


def _q_dp_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram likelihood quality score per document (count-based
    LM-perplexity stand-in; exact BIGINT mean bigram frequency)."""
    from openie_spark.datapipe.textstats import bigram_likelihood

    return bigram_likelihood(_docs(spark, sf_dir))


def _q_dp_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training pair counts: word-frequency collapse
    then vocab-sized pair explode — top pairs by corpus weight."""
    from openie_spark.datapipe.textstats import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir))


def _q_dp_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE merge-loop training (Sennrich et al. 2016): 12 merges
    over the corpus-weighted vocabulary, each round one vocab-scale
    pair count + a one-row argmax collect + a JVM-side fold merge.
    Oracle-backed: the fixed round count unrolls to 12 argmax+replace
    CTE rounds in DuckDB (plans.datapipe_oracles.bpe_merges_sql — the
    double-space string representation makes leftmost non-overlap
    merging exactly SQL replace()); also value-pinned by pytest parity
    vs an independent transcription of the public algorithm
    (tests/test_datapipe.py)."""
    from openie_spark.datapipe.textstats import bpe_learn_merges

    return bpe_learn_merges(_docs(spark, sf_dir))


def _q_dp_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang token-count quantile sketch: bottom-k-by-hash uniform
    sample + nearest-rank integer quantiles, exact n_docs/min/max."""
    from openie_spark.datapipe.textstats import sampled_quantiles

    return sampled_quantiles(_docs(spark, sf_dir))


def _q_dp_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register sketch: per-lang distinct word-3-gram
    estimate with exact-integer harmonic sums (no transcendental in
    the emitted numbers — engine-portable)."""
    from openie_spark.datapipe.textstats import hll_distinct

    return hll_distinct(_docs(spark, sf_dir))


def _q_dp_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-word collocations ranked by exact-integer Dice ppm
    (2*n_xy/(n_x+n_y)); min-count floor, deterministic top-k."""
    from openie_spark.datapipe.textstats import collocations

    return collocations(_docs(spark, sf_dir))


def _q_dp_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-sketch heavy hitters: top-k words by min-of-rows
    sketch estimate with the exact count + one-sided over_ppm audit;
    ONE corpus shuffle (the word collapse), counter table bounded at
    depth*width rows. Oracle recomputes the full sketch in SQL."""
    from openie_spark.datapipe.textstats import cms_heavy_hitters

    return cms_heavy_hitters(_docs(spark, sf_dir))


def _q_dp_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV cardinality sketch: estimated distinct word-3-gram count
    per language from the k smallest md5 hashes (salted two-level
    top-k; exact below k). Oracle recomputes the full sketch in SQL."""
    from openie_spark.datapipe.textstats import kmv_distinct

    return kmv_distinct(_docs(spark, sf_dir))


def _q_dp_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation funnel composed in one plan (exact-dedup
    keeper ∧ quality threshold ∧ mixing sample) with auditable
    per-stage flags. Oracle composes the three stage oracles."""
    from openie_spark.datapipe.quality import curated_corpus

    return curated_corpus(_docs(spark, sf_dir))


def _q_dp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential sequence packing (concatenate-then-chunk) in
    a deterministic md5-shuffled order; pack assignment = where the doc
    STARTS in the token stream. Oracle: one SQL window cumsum."""
    from openie_spark.datapipe.quality import pack_sequences

    return pack_sequences(_docs(spark, sf_dir))


def _q_dp_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified data-mixing sample: per-language
    md5-ticket bernoulli keep (downweight 'en', keep the rest) — no
    RNG state, same selection at any parallelism. Oracle recomputes
    the identical tickets in SQL."""
    from openie_spark.datapipe.quality import stratified_sample

    return stratified_sample(_docs(spark, sf_dir))


def _q_dp_neardup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS over the planted corpus: connected
    components (kg.canon machinery) over minhash-LSH verified pairs,
    keeper = min member. Oracle: recursive reachability CTE over the
    recomputed pair graph."""
    from openie_spark.datapipe.dedup import neardup_groups, planted_docs

    return neardup_groups(planted_docs(_docs(spark, sf_dir)))


def _q_dp_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-paper quality/repetition signals per document (word-shape
    rules + top-2-gram char fraction + duplicate-5-gram instance
    fraction) with the pass/fail flag. Oracle recomputes the exact-ppm
    formulas and the n-gram aggregations in SQL."""
    from openie_spark.datapipe.quality import gopher_signals

    return gopher_signals(_docs(spark, sf_dir))


def _q_dp_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 corpus TF-IDF terms per document (exact-integer rational
    idf — see quality.py for why not ln). Oracle runs the identical
    two-step integer division in DuckDB."""
    from openie_spark.datapipe.quality import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir))


def _q_dp_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/URL/phone counting + redaction over documents with
    deterministically planted PII (doc_id-derived twins, same pattern
    as the dedup family's planted_docs)."""
    from openie_spark.datapipe.quality import pii_scrub, planted_pii

    return pii_scrub(planted_pii(_docs(spark, sf_dir)))


def _q_dp_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking with overlap (size 32 / stride 24): the
    map-only, shuffle-free sharding step before embedding a corpus.
    Zero-token docs emit nothing; the last chunk may be short."""
    from openie_spark.datapipe.quality import chunk_documents

    return chunk_documents(_docs(spark, sf_dir))


def _q_dp_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report (per lang x source doc/token counts
    and exact-ppm shares): one partial-agg groupBy to stratum
    granularity, share window over the tiny aggregate only."""
    from openie_spark.datapipe.quality import corpus_mixture

    return corpus_mixture(_docs(spark, sf_dir))


def _q_dp_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-train-doc distinct word-8-gram
    overlap against a deterministic md5-ticket eval slice; the planted
    duplicate docs crossing the split are the contamination ground
    truth. Gram hashes (8-byte keys) are what shuffles, never gram
    strings; the eval side is benchmark-sized -> AQE broadcast."""
    from openie_spark.datapipe.decontam import decontaminate

    return decontaminate(_docs(spark, sf_dir))


def _q_dp_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document boilerplate scrub (RefinedWeb/CCNet-style): word
    8-grams in >= BOILER_MIN_DOCS distinct docs are boilerplate; a
    fixed banner planted on every 5th doc is the ground truth. Shares
    decontam's gram plan — one doc_id shuffle for the gram build, one
    partial-aggregated count over 8-byte gram hashes (map-side combine
    absorbs exactly the hot-gram skew the operator exists to find)."""
    from openie_spark.datapipe.decontam import boilerplate_stats, planted_boilerplate

    return boilerplate_stats(planted_boilerplate(_docs(spark, sf_dir)))


def _q_dp_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.similarity import brute_topk_sql

    return brute_topk_sql(_emb(spark, sf_dir))


def _q_dp_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document vectors (hashing trick): sparse
    (doc_id, dim_idx, val) signed-count rows — deterministic text
    featurization feeding the vector ops with no trained model; one
    (doc_id, bucket) partial-agg shuffle."""
    from openie_spark.datapipe.cluster import hash_doc_vectors

    return hash_doc_vectors(_docs(spark, sf_dir))


def _q_dp_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling from the k-means buckets (SemDeDup-style
    selection): up to DIVERSE_PER_CLUSTER md5-ticket picks from EVERY
    semantic bucket — an even, reproducible slice of the embedding
    space instead of a front-to-back truncation. Reads the memoized
    assignment table; one cluster-partitioned window."""
    from openie_spark.datapipe.cluster import cluster_diverse_sample

    return cluster_diverse_sample(
        _emb(spark, sf_dir), assignment=_kmeans_memo(spark, sf_dir))


def _q_dp_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact Lloyd k-means over the embedding table (SemDeDup-
    style semantic bucketing for curation): fixed-point quantization,
    md5-bucket seeds, 4 fixed rounds; map-only assignment with literal
    centroids + one K x dim partial-agg shuffle per round."""
    from openie_spark.datapipe.cluster import kmeans_assign

    return kmeans_assign(_emb(spark, sf_dir))


_KMEANS_MEMO: dict = {}


def _kmeans_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means assignment table, computed ONCE per (application,
    sf_dir) and localCheckpointed — the warehouse pattern: a curation
    run clusters once and every readout reads the TABLE. (dp_kmeans
    itself stays un-memoized so its bench time reflects the real
    Lloyd-loop cost.)"""
    from openie_spark.datapipe.cluster import kmeans_assign

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _KMEANS_MEMO:
        _evict_stale(_KMEANS_MEMO, key)
        _KMEANS_MEMO[key] = kmeans_assign(
            _emb(spark, sf_dir)).localCheckpoint(eager=True)
    return _KMEANS_MEMO[key]


def _q_dp_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup within-bucket near-dedup (Abbas et al. 2023): close
    pairs inside each k-means bucket with the farther-from-centroid
    member marked for dropping — reads the memoized assignment
    table."""
    from openie_spark.datapipe.cluster import semdedup_pairs

    return semdedup_pairs(
        _emb(spark, sf_dir), assignment=_kmeans_memo(spark, sf_dir))


def _q_dp_kmeans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster curation readout for the k-means buckets: size,
    integer inertia, and the majority ``label`` with support — the
    purity signal deciding whether semantic buckets track the
    taxonomy. Reads the memoized assignment table (cluster once, roll
    up many — the warehouse pattern)."""
    from openie_spark.datapipe.cluster import kmeans_stats

    return kmeans_stats(_emb(spark, sf_dir),
                        assignment=_kmeans_memo(spark, sf_dir))


def _q_dp_embedding_topk_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numpy top-k (mapInPandas over broadcast corpus, gated on a
    corpus-size check) — row-identical to dp_embedding_topk, so it
    shares the brute-force SQL oracle.

    The former round-boundary risk is closed: the kernel now folds
    dims sequentially in _dot_fixed's exact float64 operation order
    and rounds HALF_UP (copysign/floor(+0.5)), so its cosines are
    bit-identical to the SQL path and the oracle at ANY sf — no
    tolerance needed. Zero-norm embeddings (NULL units from
    with_unit's guard; all-NaN units in the oracle's native math) are
    excluded on both paths and in the oracle; under ANSI mode the
    unguarded divide would otherwise abort the job on one bad vector."""
    from openie_spark.datapipe.similarity import brute_topk_np

    return brute_topk_np(_emb(spark, sf_dir))


def _q_dp_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN top-k (md5-sampled deterministic
    centroids, argmax cell assignment, nprobe probing, exact
    rescoring) — the whole structure is DuckDB-recomputable
    (ivf_topk_sql), so unlike the sign-LSH variant this approximate
    path gets the full hash check."""
    from openie_spark.datapipe.similarity import ivf_topk

    return ivf_topk(_emb(spark, sf_dir))


def _q_dp_embedding_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ ANN top-k: IVF cells bound candidates, product-
    quantization codes rank them with an ids+codes-only shuffle; full
    vectors re-attach only for the bounded exact-rescore shortlist.
    md5-deterministic codebooks make it fully DuckDB-recomputable."""
    from openie_spark.datapipe.similarity import ivfpq_topk

    return ivfpq_topk(_emb(spark, sf_dir))


def _q_dp_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN over planted twins — full DuckDB oracle
    (lsh_topk_sql recomputes planes → sketches → buckets → rescore),
    hash-checked; recall vs brute force additionally pinned in tests."""
    from openie_spark.datapipe.similarity import lsh_topk, planted_embeddings

    return lsh_topk(planted_embeddings(_emb(spark, sf_dir)), k=1, query_mod=10)


def _q_dp_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-dup pairs via sign-LSH candidate buckets + exact
    rescoring (the 100 TB shape — no all-pairs cross join); the oracle
    recomputes the identical md5-deterministic sketches."""
    from openie_spark.datapipe.similarity import embedding_pairs, planted_embeddings

    return embedding_pairs(planted_embeddings(_emb(spark, sf_dir)))


def _q_dp_embedding_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup CLUSTERS over the sign-LSH pair graph with
    keeper selection (min vec_id) — the embedding-space twin of
    dp_neardup_groups; every planted twin collapses into a 2-group."""
    from openie_spark.datapipe.similarity import embedding_groups, planted_embeddings

    return embedding_groups(planted_embeddings(_emb(spark, sf_dir)))


def _q_dp_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram featurizer over opaque media blobs (mapInPandas),
    exploded to scalar (media_id, kind, n_bytes, bin_idx, n) rows so
    the result is canonicalizable and DuckDB-checkable (the payloads
    are printable-ASCII utf-8, so the oracle recomputes the byte
    histogram from code points)."""
    from openie_spark.datapipe.multimodal import derive_media, media_features_flat

    return media_features_flat(derive_media(_docs(spark, sf_dir)))


def _q_dp_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openie_spark.datapipe.multimodal import derive_media, frame_sample

    return frame_sample(derive_media(_docs(spark, sf_dir)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_derive": _q_transcripts,
        "sentence_segment": _q_sentences,
        "predicate_spans": _q_spans,
        "triples_extract": _q_triples,
        "triples_extract_arrow": _q_triples_arrow,
        "triples_extract_neural": _q_triples_neural,
        "carb_score_self": _q_carb_self,
        "carb_score_degraded": _q_carb_degraded,
        "carb_o2o_sweep": _q_carb_o2o_sweep,
        "carb_oie16": _q_carb_oie16,
        "carb_pr_sweep": _q_carb_pr_sweep,
        "kg_mentions": _q_kg_mentions,
        "kg_pairs_exact": _q_kg_pairs,
        "kg_pairs_minhash": _q_kg_pairs_minhash,
        "kg_pairs_editdist": _q_kg_pairs_editdist,
        "kg_components": _q_kg_components,
        "kg_nodes": _q_kg_nodes,
        "kg_edges": _q_kg_edges,
        "kg_degree": _q_kg_degree,
        "kg_relations": _q_kg_relations,
        "kg_display": _q_kg_display,
        "kg_entity_types": _q_kg_entity_types,
        "kg_relation_canon": _q_kg_relation_canon,
        "kg_salience": _q_kg_salience,
        "kg_coref": _q_kg_coref,
        "kg_coref_edges": _q_kg_coref_edges,
        "kg_topic_segments": _q_kg_topic_segments,
        "kg_dialogue_stats": _q_kg_dialogue_stats,
        "kg_segment_salience": _q_kg_segment_salience,
        "kg_schema": _q_kg_schema,
        "kg_temporal": _q_kg_temporal,
        "kg_export_nt": _q_kg_export_nt,
        "kg_export_graphml": _q_kg_export_graphml,
        "kg_metapaths": _q_kg_metapaths,
        "kg_comention": _q_kg_comention,
        "kg_neighbor_jaccard": _q_kg_neighbor_jaccard,
        "kg_linkpred_ra": _q_kg_linkpred_ra,
        "kg_negatives": _q_kg_negatives,
        "kg_nodes_incremental": _q_kg_nodes_incremental,
        "kg_edges_incremental": _q_kg_edges_incremental,
        "kg_pairs_incremental": _q_kg_pairs_incremental,
        "kg_pagerank": _q_kg_pagerank,
        "kg_triangles": _q_kg_triangles,
        "kg_khop": _q_kg_khop,
        "kg_harmonic": _q_kg_harmonic,
        "kg_seed_distances": _q_kg_seed_distances,
        "kg_statement_roles": _q_kg_statement_roles,
        "kg_ppr": _q_kg_ppr,
        "kg_integrity": _q_kg_integrity,
        "kg_communities": _q_kg_communities,
        "kg_community_stats": _q_kg_community_stats,
        "kg_kcore": _q_kg_kcore,
        "kg_truss": _q_kg_truss,
        "kg_clustering": _q_kg_clustering,
        "kg_rel_cardinality": _q_kg_rel_cardinality,
        "kg_assoc_dice": _q_kg_assoc_dice,
        "kg_wpagerank": _q_kg_wpagerank,
        "kg_support_hist": _q_kg_support_hist,
        "kg_rules": _q_kg_rules,
        "kg_conflicts": _q_kg_conflicts,
        "kg_type_graph": _q_kg_type_graph,
        "kg_growth": _q_kg_growth,
        "kg_linking_eval": _q_kg_linking_eval,
        "kg_mixing": _q_kg_mixing,
        "kg_blocking_stats": _q_kg_blocking_stats,
        "kg_snapshot": _q_kg_snapshot,
        "kg_kge_eval": _q_kg_kge_eval,
        "kg_role_transitions": _q_kg_role_transitions,
        "kg_tool_stats": _q_kg_tool_stats,
        "kg_tool_sequences": _q_kg_tool_sequences,
        "kg_alias_hist": _q_kg_alias_hist,
        "dp_length_hist": _q_dp_length_hist,
        "dp_ev_gap_hist": _q_dp_ev_gap_hist,
        "dp_dedup_eval": _q_dp_dedup_eval,
        "dp_ev_growth": _q_dp_ev_growth,
        "kg_salsa": _q_kg_salsa,
        "kg_degree_hist": _q_kg_degree_hist,
        "kg_conv_neardup": _q_kg_conv_neardup,
        "kg_walks": _q_kg_walks,
        "kg_walk_pairs": _q_kg_walk_pairs,
        "kg_edge_split": _q_kg_edge_split,
        "kg_yield": _q_kg_yield,
        "kg_timeline": _q_kg_timeline,
        "kg_reply_latency": _q_kg_reply_latency,
        "kg_summary": _q_kg_summary,
        "turn_text_invariant": _q_turn_invariant,
        "dp_exact_dedup": _q_dp_exact_dedup,
        "dp_dup_stats": _q_dp_dup_stats,
        "dp_ngram_pairs": _q_dp_ngram_pairs,
        "dp_minhash_pairs": _q_dp_minhash_pairs,
        "dp_substr_spans": _q_dp_substr_spans,
        "dp_simhash": _q_dp_simhash,
        "dp_simhash_pairs": _q_dp_simhash_pairs,
        "dp_doc_stats": _q_dp_doc_stats,
        "dp_lang_id": _q_dp_lang_id,
        "dp_token_count": _q_dp_token_count,
        "dp_fingerprint": _q_dp_fingerprint,
        "dp_winnow": _q_dp_winnow,
        "dp_winnow_pairs": _q_dp_winnow_pairs,
        "dp_containment": _q_dp_containment,
        "dp_bigram_score": _q_dp_bigram_score,
        "dp_bpe_pairs": _q_dp_bpe_pairs,
        "dp_bpe_merges": _q_dp_bpe_merges,
        "dp_kmv_distinct": _q_dp_kmv_distinct,
        "dp_hll_distinct": _q_dp_hll_distinct,
        "dp_cms_topk": _q_dp_cms_topk,
        "dp_quantiles": _q_dp_quantiles,
        "dp_collocations": _q_dp_collocations,
        "dp_sample": _q_dp_sample,
        "dp_pack": _q_dp_pack,
        "dp_curated": _q_dp_curated,
        "dp_neardup_groups": _q_dp_neardup_groups,
        "dp_quality_gopher": _q_dp_quality_gopher,
        "dp_tfidf_terms": _q_dp_tfidf_terms,
        "dp_pii_scrub": _q_dp_pii_scrub,
        "dp_decontam": _q_dp_decontam,
        "dp_boilerplate": _q_dp_boilerplate,
        "dp_chunks": _q_dp_chunks,
        "dp_mixture": _q_dp_mixture,
        "dp_embedding_topk": _q_dp_embedding_topk,
        "dp_embedding_topk_np": _q_dp_embedding_topk_np,
        "dp_hash_embed": _q_dp_hash_embed,
        "dp_kmeans": _q_dp_kmeans,
        "dp_diverse_sample": _q_dp_diverse_sample,
        "dp_kmeans_stats": _q_dp_kmeans_stats,
        "dp_semdedup": _q_dp_semdedup,
        "dp_embedding_ivf": _q_dp_embedding_ivf,
        "dp_embedding_ivfpq": _q_dp_embedding_ivfpq,
        "dp_embedding_lsh": _q_dp_embedding_lsh,
        "dp_embedding_pairs": _q_dp_embedding_pairs,
        "dp_embedding_groups": _q_dp_embedding_groups,
        "dp_media_features": _q_dp_media_features,
        "dp_media_frames": _q_dp_media_frames,
        "dp_ev_sessions": _q_dp_ev_sessions,
        "dp_ev_sessions_sw": _q_dp_ev_sessions_sw,
        "dp_ev_windowed": _q_dp_ev_windowed,
        "dp_ev_sliding": _q_dp_ev_sliding,
        "dp_ev_active": _q_dp_ev_active,
        "dp_ev_affinity": _q_dp_ev_affinity,
        "dp_ev_quantiles": _q_dp_ev_quantiles,
        "dp_ev_props": _q_dp_ev_props,
        "dp_ev_asof": _q_dp_ev_asof,
        "dp_ev_intervals": _q_dp_ev_intervals,
        "dp_ev_funnel": _q_dp_ev_funnel,
        "dp_ev_retention": _q_dp_ev_retention,
        "dp_ev_anomaly": _q_dp_ev_anomaly,
        "dp_ev_transitions": _q_dp_ev_transitions,
        "dp_ev_trigrams": _q_dp_ev_trigrams,
        "dp_ev_hourly": _q_dp_ev_hourly,
        "dp_ev_profiles": _q_dp_ev_profiles,
        "dp_bloom_flags": _q_dp_bloom_flags,
    }


def oracle_sql() -> dict[str, str]:
    from openie_spark.plans import datapipe_oracles as dp
    from openie_spark.plans import oracles as o

    return {
        "transcripts_derive": o.transcripts_sql(),
        "sentence_segment": o.sentences_sql(),
        "predicate_spans": o.spans_sql(),
        "triples_extract": o.triples_sql(),
        "triples_extract_arrow": o.triples_sql(),
        "carb_score_self": o.carb_self_sql(),
        "kg_mentions": o.kg_mentions_sql(),
        "kg_pairs_exact": o.kg_pairs_sql(),
        "kg_pairs_minhash": o.kg_pairs_minhash_sql(),
        "kg_pairs_editdist": o.kg_pairs_editdist_sql(),
        "kg_components": o.kg_components_sql(),
        "kg_nodes": o.kg_nodes_sql(),
        "kg_edges": o.kg_edges_sql(),
        "kg_degree": o.kg_degree_sql(),
        "kg_relations": o.kg_relations_sql(),
        "kg_display": o.kg_display_sql(),
        "kg_entity_types": o.kg_entity_types_sql(),
        "kg_relation_canon": o.kg_relation_canon_sql(),
        "kg_salience": o.kg_salience_sql(),
        "kg_coref": o.kg_coref_sql(),
        "kg_coref_edges": o.kg_coref_edges_sql(),
        "kg_topic_segments": o.kg_topic_segments_sql(),
        "kg_dialogue_stats": o.dialogue_stats_sql(),
        "kg_segment_salience": o.kg_segment_salience_sql(),
        "kg_schema": o.kg_schema_sql(),
        "kg_temporal": o.kg_temporal_sql(),
        "kg_export_nt": o.kg_export_nt_sql(),
        "kg_export_graphml": o.kg_export_graphml_sql(),
        "kg_metapaths": o.kg_metapaths_sql(),
        "kg_comention": o.kg_comention_sql(),
        "kg_neighbor_jaccard": o.kg_neighbor_jaccard_sql(),
        "kg_linkpred_ra": o.kg_linkpred_ra_sql(),
        "kg_negatives": o.kg_negatives_sql(),
        "kg_nodes_incremental": o.kg_nodes_sql(),
        "kg_edges_incremental": o.kg_edges_sql(),
        "kg_pairs_incremental": o.kg_pairs_sql(),
        "kg_pagerank": o.kg_pagerank_sql(),
        "kg_triangles": o.kg_triangles_sql(),
        "kg_khop": o.kg_khop_sql(),
        "kg_harmonic": o.kg_harmonic_sql(),
        "kg_seed_distances": o.kg_seed_distances_sql(),
        "kg_statement_roles": o.kg_statement_roles_sql(),
        "kg_ppr": o.kg_ppr_sql(),
        "kg_integrity": o.kg_integrity_sql(),
        "kg_communities": o.kg_lpa_sql(),
        "kg_community_stats": o.kg_community_stats_sql(),
        "kg_kcore": o.kg_kcore_sql(),
        "kg_truss": o.kg_truss_sql(),
        "kg_clustering": o.kg_clustering_sql(),
        "kg_rel_cardinality": o.kg_rel_cardinality_sql(),
        "kg_assoc_dice": o.kg_assoc_dice_sql(),
        "kg_wpagerank": o.kg_wpagerank_sql(),
        "kg_support_hist": o.kg_support_hist_sql(),
        "kg_rules": o.kg_rules_sql(),
        "kg_conflicts": o.kg_conflicts_sql(),
        "kg_type_graph": o.kg_type_graph_sql(),
        "kg_growth": o.kg_growth_sql(),
        "kg_linking_eval": o.kg_linking_eval_sql(),
        "kg_mixing": o.kg_mixing_sql(),
        "kg_blocking_stats": o.kg_blocking_stats_sql(),
        "kg_snapshot": o.kg_snapshot_sql(),
        "kg_kge_eval": o.kg_kge_eval_sql(),
        "kg_role_transitions": o.kg_role_transitions_sql(),
        "kg_tool_stats": o.kg_tool_stats_sql(),
        "kg_tool_sequences": o.kg_tool_sequences_sql(),
        "kg_alias_hist": o.kg_alias_hist_sql(),
        "dp_length_hist": dp.length_histogram_sql(),
        "dp_ev_gap_hist": dp.gap_histogram_sql(),
        "dp_dedup_eval": dp.dedup_eval_sql(),
        "dp_ev_growth": dp.growth_accounting_sql(),
        "kg_salsa": o.kg_salsa_sql(),
        "kg_degree_hist": o.kg_degree_hist_sql(),
        "kg_conv_neardup": dp.conv_minhash_pairs_sql(),
        "kg_walks": o.kg_walks_sql(),
        "kg_walk_pairs": o.kg_walk_pairs_sql(),
        "kg_edge_split": o.kg_edge_split_sql(),
        "kg_yield": o.kg_yield_sql(),
        "kg_timeline": o.kg_timeline_sql(),
        "kg_reply_latency": o.kg_reply_latency_sql(),
        "kg_summary": o.kg_summary_sql(),
        "turn_text_invariant": o.turn_invariant_sql(),
        "dp_exact_dedup": dp.exact_dedup_sql(),
        "dp_dup_stats": dp.dup_group_histogram_sql(),
        "dp_ngram_pairs": dp.ngram_pairs_sql(),
        "dp_minhash_pairs": dp.minhash_pairs_sql(),
        "dp_substr_spans": dp.substr_spans_sql(),
        "dp_simhash": dp.simhash_sql(),
        "dp_simhash_pairs": dp.simhash_pairs_sql(),
        "dp_doc_stats": dp.doc_stats_sql(),
        "dp_lang_id": dp.lang_id_sql(),
        "dp_token_count": dp.token_count_sql(),
        "dp_fingerprint": dp.fingerprint_sql(),
        "dp_winnow": dp.winnow_sql(),
        "dp_winnow_pairs": dp.winnow_pairs_sql(),
        "dp_containment": dp.containment_pairs_sql(),
        "dp_bigram_score": dp.bigram_likelihood_sql(),
        "dp_bpe_pairs": dp.bpe_pairs_sql(),
        "dp_bpe_merges": dp.bpe_merges_sql(),
        "dp_kmv_distinct": dp.kmv_distinct_sql(),
        "dp_hll_distinct": dp.hll_distinct_sql(),
        "dp_cms_topk": dp.cms_heavy_hitters_sql(),
        "dp_quantiles": dp.sampled_quantiles_sql(),
        "dp_collocations": dp.collocations_sql(),
        "dp_sample": dp.stratified_sample_sql(),
        "dp_pack": dp.pack_sequences_sql(),
        "dp_curated": dp.curated_corpus_sql(),
        "dp_neardup_groups": dp.neardup_groups_sql(),
        "dp_quality_gopher": dp.gopher_signals_sql(),
        "dp_tfidf_terms": dp.tfidf_top_terms_sql(),
        "dp_pii_scrub": dp.pii_scrub_sql(),
        "dp_decontam": dp.decontaminate_sql(),
        "dp_boilerplate": dp.boilerplate_sql(),
        "dp_chunks": dp.chunk_documents_sql(),
        "dp_mixture": dp.corpus_mixture_sql(),
        "dp_embedding_topk": dp.brute_topk_sql_oracle(),
        "dp_embedding_topk_np": dp.brute_topk_sql_oracle(),
        "dp_hash_embed": dp.hash_embed_sql(),
        "dp_kmeans": dp.kmeans_sql(),
        "dp_diverse_sample": dp.cluster_diverse_sample_sql(),
        "dp_kmeans_stats": dp.kmeans_stats_sql(),
        "dp_semdedup": dp.semdedup_sql(),
        "dp_embedding_ivf": dp.ivf_topk_sql(),
        "dp_embedding_ivfpq": dp.ivfpq_topk_sql(),
        "dp_embedding_lsh": dp.lsh_topk_sql(),
        "dp_embedding_pairs": dp.embedding_pairs_sql(),
        "dp_embedding_groups": dp.embedding_groups_sql(),
        "dp_media_features": dp.media_features_sql(),
        "dp_media_frames": dp.media_frames_sql(),
        "dp_ev_sessions": dp.session_stats_sql(),
        "dp_ev_sessions_sw": dp.session_window_stats_sql(),
        "dp_ev_windowed": dp.windowed_counts_sql(),
        "dp_ev_sliding": dp.sliding_counts_sql(),
        "dp_ev_active": dp.active_users_sql(),
        "dp_ev_affinity": dp.type_affinity_sql(),
        "dp_ev_quantiles": dp.value_quantiles_sql(),
        "dp_ev_props": dp.props_k_sql(),
        "dp_ev_asof": dp.asof_last_ref_sql(),
        "dp_ev_intervals": dp.interval_events_sql(),
        "dp_ev_funnel": dp.funnel_sql(),
        "dp_ev_retention": dp.retention_sql(),
        "dp_ev_anomaly": dp.anomalies_sql(),
        "dp_ev_transitions": dp.event_transitions_sql(),
        "dp_ev_trigrams": dp.event_trigrams_sql(),
        "dp_ev_hourly": dp.hourly_profile_sql(),
        "dp_ev_profiles": dp.user_profiles_sql(),
        "dp_bloom_flags": dp.bloom_flags_sql(),
    }
