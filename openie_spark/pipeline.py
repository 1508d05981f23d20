"""Checkpoint-resumable KG-construction pipeline (stages A→H) with
per-stage lineage manifests (north_rule: 'checkpoint-resumable with
per-partition lineage + metrics').

Each stage materializes one table under <output>/<stage>/ plus a
``_manifest.json`` recording:

    stage, status, rows, per-bucket row counts (bucket = conv_id /
    entity hash bucket — the 'per-partition lineage'), conv_id range,
    model version (tagger weights content-hash or 'rule-v1'), engine
    config fingerprint, upstream stage fingerprints, wall seconds.

Resume semantics: a stage re-runs iff its manifest is missing,
incomplete, or its recorded upstream fingerprint differs (so resuming
after a config/model change invalidates exactly the dirty suffix of
the DAG). Writes are atomic-per-stage: data lands under the stage dir
first, the manifest is written LAST — a job killed mid-stage leaves no
manifest and the stage re-runs cleanly (idempotent overwrite).

Storage: Parquet with a persisted ``bucket`` column (hash of conv_id /
entity id). On a real deployment swap TableIO for Iceberg
``writeTo(...).createOrReplace()`` — the manifest/resume contract is
unchanged (SURVEY.md §7: no Iceberg jar in this sandbox).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openie_spark import config as C

ENGINE_VERSION = "openie-spark-0.1"
N_BUCKETS = 32


# ------------------------------------------------------------ TableIO
# The storage seam promised in SURVEY.md §7: stage tables go through
# one of these; lineage manifests stay Hadoop-FS sidecars under
# output_dir either way (they ARE the resume contract, not the table
# format). No Iceberg runtime jar ships in this sandbox, so the
# Iceberg branch is selected only when the user configures a catalog
# (spark.openie.catalog=<name>, with spark.sql.catalog.<name>.* set)
# and is exercised here only at the routing level.


class ParquetTableIO:
    """Parquet directory per stage under output_dir (the sandbox
    default; layout identical to rounds 1-2)."""

    kind = "parquet"

    def __init__(self, output_dir: str):
        self.output_dir = output_dir

    def location(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def write(self, spark: SparkSession, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(self.location(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.location(name))


class IcebergTableIO:
    """Iceberg v2 tables <catalog>.<namespace>.<stage> via the
    DataFrameWriterV2 (writeTo(...).createOrReplace()) — snapshot
    isolation makes the stage write atomic on the table side too; the
    manifest sidecar still gates resume so the contract is unchanged."""

    kind = "iceberg"

    def __init__(self, output_dir: str, catalog: str,
                 namespace: str = "openie"):
        self.output_dir = output_dir  # manifests still live here
        self.catalog = catalog
        self.namespace = namespace

    def qualified(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def location(self, name: str) -> str:
        return self.qualified(name)

    def write(self, spark: SparkSession, df: DataFrame, name: str) -> None:
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}")
        df.writeTo(self.qualified(name)).using("iceberg").createOrReplace()

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(self.qualified(name))


def make_table_io(spark: SparkSession, output_dir: str):
    """Iceberg when a catalog is configured, Parquet+manifest
    otherwise (catalog-absent behavior unchanged — unit-pinned)."""
    catalog = spark.conf.get("spark.openie.catalog", None)
    if catalog:
        return IcebergTableIO(output_dir, catalog)
    return ParquetTableIO(output_dir)


def _fingerprint() -> dict:
    return {
        "engine": ENGINE_VERSION,
        "link_jaccard": C.LINK_JACCARD,
        "max_block": C.MAX_BLOCK,
        "max_mention_tokens": C.MAX_MENTION_TOKENS,
        "pred_lexicon_n": len(C.PRED_LEXICON),
    }


def model_version(backend: str) -> str:
    if backend == "neural":
        from openie_spark.model.weights import ARG_SEED, PRED_SEED, get_tagger

        return f"{get_tagger(PRED_SEED).version}+{get_tagger(ARG_SEED).version}"
    # rule and rule_arrow are the same model (row-identical outputs)
    return "rule-v1"


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    seconds: float
    resumed: bool
    manifest: dict = field(default_factory=dict)


class KGPipeline:
    """Orchestrates: triples → mentions → vocab → pairs → components →
    nodes + edges, each stage a Parquet table + manifest."""

    def __init__(self, spark: SparkSession, input_dir: str, output_dir: str,
                 backend: str = "rule", pair_mode: str = "exact",
                 table_io=None, analytics: bool = False,
                 export: bool = False, enrich: bool = False):
        self.spark = spark
        self.input_dir = input_dir
        self.output_dir = output_dir
        self.backend = backend
        self.pair_mode = pair_mode
        self.analytics = analytics
        self.export = export
        self.enrich = enrich
        self.io = table_io if table_io is not None else make_table_io(spark, output_dir)
        self.results: list[StageResult] = []

    # ------------------------------------------------------------ io

    def _manifest_path(self, name: str) -> str:
        # manifests are sidecars under output_dir regardless of the
        # table format (they carry the resume contract)
        return os.path.join(self.output_dir, name, "_manifest.json")

    # Manifests go through the Hadoop FileSystem API, not driver-local
    # open(): tools/kg_job.py advertises spark-submit with a warehouse
    # output path, and an hdfs:///s3a:// output_dir must carry the
    # checkpoint-resume contract too (stage data already does via the
    # Spark writers).

    def _jpath(self, path: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self):
        return self._jpath(self.output_dir).getFileSystem(
            self.spark._jsc.hadoopConfiguration())

    def _write_text(self, path: str, content: str) -> None:
        out = self._fs().create(self._jpath(path), True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    def _read_text(self, path: str) -> str | None:
        fs = self._fs()
        p = self._jpath(path)
        if not fs.exists(p):
            return None
        jvm = self.spark._jvm
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(fs.open(p), "UTF-8"))
        try:
            lines = []
            while True:
                line = reader.readLine()
                if line is None:
                    break
                lines.append(line)
        finally:
            reader.close()
        return "\n".join(lines)

    def _read_manifest(self, name: str) -> dict | None:
        raw = self._read_text(self._manifest_path(name))
        return None if raw is None else json.loads(raw)

    def _storage_stats(self, location: str) -> dict:
        """Physical-layout lineage for a stage's written table: file
        count and total bytes (data files only). The capacity metric
        an operator watches alongside row counts — a stage whose bytes
        per row drift is compressing differently (schema or data-
        distribution change) even when rows match. One FS listing, no
        data read; best-effort for table-catalog (Iceberg) locations
        where the directory layout is the catalog's business."""
        try:
            fs = self._fs()
            it = fs.listFiles(self._jpath(location), True)
            n_files, total = 0, 0
            while it.hasNext():
                st = it.next()
                fname = st.getPath().getName()
                if fname.startswith(("_", ".")):
                    continue            # manifests/_SUCCESS/CRC sidecars
                n_files += 1
                total += st.getLen()
            return {"data_files": n_files, "data_bytes": total}
        except Exception:               # pragma: no cover - remote FS quirks
            return {}

    def _stage_fingerprint(self, name: str, upstream: list[str]) -> dict:
        # Upstream identity = rows + per-write nonce: an upstream
        # rebuilt from changed input with a coincidentally-equal row
        # count still gets a fresh write_id, so downstream stages
        # re-run. A nonce beats a content hash here — zero extra IO
        # (measured: hashing every column of every row cost ~25% of
        # pipeline wall at 1.25M turns) and no false-resume risk; the
        # only loss is re-running downstream after a byte-identical
        # rebuild, which is the safe direction.
        return {
            "config": _fingerprint(),
            "backend": self.backend,
            "pair_mode": self.pair_mode,
            "model_version": model_version(self.backend),
            "input_dir": self.input_dir,
            "upstream": {
                u: {k: (self._read_manifest(u) or {}).get(k)
                    for k in ("rows", "write_id")}
                for u in upstream
            },
        }

    def _run_stage(self, name: str, build, bucket_col: str | None,
                   upstream: list[str], resume: bool,
                   extra_metrics=None, extra_fp: dict | None = None) -> DataFrame:
        fp = self._stage_fingerprint(name, upstream)
        if extra_fp:
            fp = {**fp, **extra_fp}
        man = self._read_manifest(name)
        sd = self.io.location(name)
        if resume and man and man.get("status") == "complete" and man.get("fingerprint") == fp:
            self.results.append(StageResult(name, sd, man["rows"], 0.0, True, man))
            return self.io.read(self.spark, name)

        t0 = time.time()
        df = build()
        if bucket_col is not None:
            df = df.withColumn(
                "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(N_BUCKETS)).cast("int")
            ).repartition("bucket")
        self.io.write(self.spark, df, name)
        out = self.io.read(self.spark, name)

        # ONE column-pruned scan for all lineage stats: per-bucket
        # counts + conv range come from a single grouped aggregate
        # (rows = their sum); the parquet reader only decodes the
        # bucket/conv_id columns.
        import uuid

        aggs = [F.count(F.lit(1)).alias("n")]
        has_conv = "conv_id" in out.columns
        if has_conv:
            aggs += [F.min("conv_id").alias("lo"), F.max("conv_id").alias("hi")]
        group = ["bucket"] if bucket_col is not None else []
        stats = out.groupBy(*group).agg(*aggs).collect()
        rows = sum(r.n for r in stats)
        per_bucket = {int(r.bucket): r.n for r in stats} if bucket_col is not None else {}
        conv_range = None
        if has_conv and stats:
            conv_range = [min(r.lo for r in stats), max(r.hi for r in stats)]
        manifest = {
            "stage": name,
            "status": "complete",
            "rows": rows,
            "write_id": uuid.uuid4().hex,
            "per_bucket_rows": per_bucket,
            "conv_id_range": conv_range,
            "fingerprint": fp,
            "seconds": round(time.time() - t0, 3),
            **self._storage_stats(sd),
        }
        if extra_metrics:
            manifest["metrics"] = extra_metrics(out)
        self._write_text(self._manifest_path(name),
                         json.dumps(manifest, indent=1, sort_keys=True))
        self.results.append(StageResult(name, sd, rows, manifest["seconds"], False, manifest))
        return out

    # -------------------------------------------------------- stages

    def run(self, resume: bool = True) -> dict:
        from openie_spark.kg.canon import canonical_map, connected_components
        from openie_spark.kg.analytics import relation_weights
        from openie_spark.kg.graph import build_edges_from_norm, build_nodes, norm_triples
        from openie_spark.kg.linking import exact_pairs, minhash_pairs, skew_stats
        from openie_spark.kg.mentions import mention_vocab, mentions_from_norm
        from openie_spark.operators.extract import extract_triples
        from openie_spark.sources.transcripts import read_transcripts

        t_total = time.time()
        spark = self.spark

        triples = self._run_stage(
            "triples",
            lambda: extract_triples(read_transcripts(spark, self.input_dir), backend=self.backend),
            "conv_id", [], resume,
        )
        # normalization materialized ONCE; vocab and edges reuse it
        tnorm = self._run_stage(
            "triples_norm",
            lambda: norm_triples(triples.drop("bucket")),
            "conv_id", ["triples"], resume,
        )
        vocab = self._run_stage(
            "vocab",
            lambda: mention_vocab(mentions_from_norm(tnorm.drop("bucket"))),
            "norm", ["triples_norm"], resume,
            extra_metrics=lambda out: {
                "skew": skew_stats(out.drop("bucket")).collect()[0].asDict()
            },
        )
        pair_fn = exact_pairs if self.pair_mode == "exact" else minhash_pairs
        pairs = self._run_stage(
            "pairs",
            lambda: pair_fn(vocab.drop("bucket")),
            "a", ["vocab"], resume,
        )
        components = self._run_stage(
            "components",
            lambda: canonical_map(vocab.drop("bucket"), connected_components(pairs.drop("bucket"))),
            "component", ["vocab", "pairs"], resume,
        )
        nodes = self._run_stage(
            "nodes",
            lambda: build_nodes(components.drop("bucket")),
            "entity_id", ["components"], resume,
        )
        edges = self._run_stage(
            "edges",
            lambda: build_edges_from_norm(
                tnorm.drop("bucket"), components.drop("bucket"),
                strategy="salted" if self.pair_mode == "minhash" else "broadcast",
            ),
            "src_id", ["triples_norm", "components"], resume,
        )

        # compact weighted sink: what a KG consumer reads instead of
        # the occurrence-scale provenance edges (north rule: "finally
        # materializing node/edge tables")
        relations = self._run_stage(
            "relations",
            lambda: relation_weights(edges.drop("bucket")),
            "src_id", ["edges"], resume,
        )

        if self.analytics:
            # optional stage-I analytics over the materialized graph —
            # resumable like every other stage, reading the
            # already-written nodes/edges tables (not re-deriving)
            from openie_spark.kg.analytics import (
                ASSOC_MIN_CONVS,
                comention_pairs,
                degree_histogram,
                harmonic_centrality,
                kcore,
                khop_distances,
                label_prop_communities,
                pagerank,
                relation_cardinality,
                salsa,
                seed_ball_distances,
                seed_pair_distances,
                triangle_counts,
                truss,
            )

            n_df, e_df = nodes.drop("bucket"), edges.drop("bucket")
            self._run_stage(
                "pagerank", lambda: pagerank(n_df, e_df),
                "entity_id", ["nodes", "edges"], resume)
            self._run_stage(
                "triangles", lambda: triangle_counts(n_df, e_df),
                "entity_id", ["nodes", "edges"], resume)
            # one labeled BFS serves khop (min over sources), harmonic
            # (per-source rollup), and the landmark distance matrix —
            # lazy checkpoint, so a fully-resumed run never pays for it
            ball = seed_ball_distances(n_df, e_df).localCheckpoint(
                eager=False)
            self._run_stage(
                "khop", lambda: khop_distances(n_df, e_df, ball=ball),
                "entity_id", ["nodes", "edges"], resume)
            self._run_stage(
                "harmonic",
                lambda: harmonic_centrality(n_df, e_df, ball=ball),
                "entity_id", ["nodes", "edges"], resume)
            self._run_stage(
                "seed_distances",
                lambda: seed_pair_distances(n_df, e_df, ball=ball),
                "src", ["nodes", "edges"], resume)
            self._run_stage(
                "communities", lambda: label_prop_communities(n_df, e_df),
                "entity_id", ["nodes", "edges"], resume)
            self._run_stage(
                "kcore", lambda: kcore(n_df, e_df),
                "entity_id", ["nodes", "edges"], resume)
            self._run_stage(
                "degree_hist", lambda: degree_histogram(n_df, e_df),
                "bin", ["nodes", "edges"], resume)
            self._run_stage(
                "salsa", lambda: salsa(n_df, e_df),
                "entity_id", ["nodes", "edges"], resume)
            self._run_stage(
                "rel_cardinality", lambda: relation_cardinality(e_df),
                "pred", ["edges"], resume)

            def _truss_backbone():
                co = (comention_pairs(e_df)
                      .where(F.col("n_convs") >= ASSOC_MIN_CONVS)
                      .select(F.col("a").alias("src_id"),
                              F.col("b").alias("dst_id")))
                return truss(n_df, co)

            self._run_stage(
                "truss", _truss_backbone,
                "a", ["nodes", "edges"], resume)
            from openie_spark.kg.analytics import (
                functional_conflicts,
                rule_implications,
                type_pair_graph,
            )

            self._run_stage(
                "rules", lambda: rule_implications(e_df),
                "body", ["edges"], resume)
            self._run_stage(
                "conflicts", lambda: functional_conflicts(e_df),
                "pred", ["edges"], resume)
            self._run_stage(
                "type_graph", lambda: type_pair_graph(n_df, e_df),
                "src_type", ["nodes", "edges"], resume)

        if self.export:
            # optional consumer-facing sinks: temporal relation
            # intervals (time-sliced KG queries) and the N-Triples
            # interchange table — resumable stages like everything else
            from openie_spark.kg.analytics import export_ntriples, temporal_relations

            n_df, e_df = nodes.drop("bucket"), edges.drop("bucket")
            self._run_stage(
                "temporal",
                lambda: temporal_relations(e_df, read_transcripts(spark, self.input_dir)),
                "src_id", ["edges"], resume)
            self._run_stage(
                "export_nt", lambda: export_ntriples(n_df, e_df),
                "nt", ["nodes", "edges"], resume)
            from openie_spark.kg.analytics import kg_growth

            self._run_stage(
                "growth",
                lambda: kg_growth(e_df, read_transcripts(spark, self.input_dir)),
                "day", ["edges"], resume)

        if self.enrich:
            # optional stage-I+ enrichment sinks: typing, schema
            # induction, per-conversation salience, coref-recovered
            # edges, topic segments — resumable stages reading the
            # already-materialized tables like analytics/export do
            from openie_spark.kg.coref import coref_edges
            from openie_spark.kg.dialogue import topic_segments
            from openie_spark.kg.enrich import (
                entity_salience,
                entity_types,
                relation_schema,
            )

            n_df, e_df = nodes.drop("bucket"), edges.drop("bucket")
            self._run_stage(
                "entity_types", lambda: entity_types(n_df),
                "entity_id", ["nodes"], resume)
            self._run_stage(
                "schema", lambda: relation_schema(e_df, n_df),
                "rel_canon", ["nodes", "edges"], resume)
            self._run_stage(
                "salience", lambda: entity_salience(e_df),
                "conv_id", ["edges"], resume)
            self._run_stage(
                "coref_edges",
                lambda: coref_edges(triples.drop("bucket"),
                                    components.drop("bucket")),
                "src_id", ["triples", "components"], resume)
            self._run_stage(
                "segments",
                lambda: topic_segments(read_transcripts(spark, self.input_dir)),
                "conv_id", [], resume)
            from openie_spark.kg.analytics import (
                edge_split,
                entity_timeline,
                extraction_yield,
            )

            self._run_stage(
                "timeline",
                lambda: entity_timeline(
                    e_df, read_transcripts(spark, self.input_dir)),
                "entity_id", ["edges"], resume)
            self._run_stage(
                "edge_split", lambda: edge_split(e_df),
                "src_id", ["edges"], resume)
            self._run_stage(
                "yield",
                lambda: extraction_yield(
                    read_transcripts(spark, self.input_dir),
                    triples.drop("bucket")),
                "conv_id", ["triples"], resume)

        total = round(time.time() - t_total, 3)
        n_triples = next(r.rows for r in self.results if r.name == "triples")
        summary = {
            "stages": {r.name: {"rows": r.rows, "seconds": r.seconds, "resumed": r.resumed}
                       for r in self.results},
            "total_seconds": total,
            "triples": n_triples,
            "nodes": nodes.count(),
            "edges": edges.count(),
            "relations": relations.count(),
            "triples_per_sec": round(n_triples / max(total, 1e-9), 1),
            "model_version": model_version(self.backend),
        }
        self._write_text(os.path.join(self.output_dir, "_pipeline_summary.json"),
                         json.dumps(summary, indent=1, sort_keys=True))
        return summary

    # --------------------------------------------------- incremental

    def run_incremental(self, prior_dir: str, resume: bool = True,
                        check_disjoint: bool = True,
                        prior_io=None) -> dict:
        """Merge a DELTA of new conversations (``self.input_dir``) into
        a completed prior pipeline output (``prior_dir``) — see
        kg/incremental.py for the per-stage merge algebra and its
        equivalence proof. The output dir is self-contained (merged
        vocab/pairs/components/nodes/edges/relations; delta-only
        triples/triples_norm) so increments CHAIN: the next increment
        points its prior_dir here.

        Contract: delta conv_ids are disjoint from every prior
        increment (new conversations only). ``check_disjoint`` guards
        it with one column-pruned semi-join against the prior edge
        table's conv_id column; disable on deployments where the
        upstream ingestion already guarantees it.

        Stage resume fingerprints additionally pin the prior tables'
        write_ids, so pointing the same output at a rebuilt prior
        re-runs the merge rather than false-resuming."""
        from openie_spark.kg.graph import build_edges_from_norm, build_nodes, norm_triples
        from openie_spark.kg.incremental import (
            entity_remap,
            incremental_exact_pairs,
            merge_components,
            merge_relations,
            merge_vocab,
            remap_edges,
        )
        from openie_spark.kg.canon import canonical_map
        from openie_spark.kg.linking import skew_stats
        from openie_spark.kg.mentions import mention_vocab, mentions_from_norm
        from openie_spark.operators.extract import extract_triples
        from openie_spark.sources.transcripts import read_transcripts

        if self.pair_mode != "exact":
            raise ValueError(
                "run_incremental supports pair_mode='exact' (the "
                "touched-block recompute is defined on blocking keys; "
                "the same pattern applies to minhash band buckets but "
                "is not wired here)")

        t_total = time.time()
        spark = self.spark
        pio = prior_io if prior_io is not None else ParquetTableIO(prior_dir)

        def prior(name: str) -> DataFrame:
            df = pio.read(spark, name)
            return df.drop("bucket") if "bucket" in df.columns else df

        def prior_write_id(name: str) -> str | None:
            raw = self._read_text(os.path.join(prior_dir, name, "_manifest.json"))
            return None if raw is None else json.loads(raw).get("write_id")

        def fp_of(*names: str) -> dict:
            return {"prior_dir": prior_dir, "delta": True,
                    "prior": {n: prior_write_id(n) for n in names}}

        triples = self._run_stage(
            "triples",
            lambda: extract_triples(read_transcripts(spark, self.input_dir), backend=self.backend),
            "conv_id", [], resume, extra_fp=fp_of(),
        )
        if check_disjoint:
            overlap = (
                triples.select("conv_id").distinct()
                .join(prior("edges").select("conv_id").distinct(), "conv_id", "semi")
                .limit(1).count()
            )
            if overlap:
                raise ValueError(
                    "run_incremental: delta shares conv_ids with the prior "
                    "graph — increments must carry NEW conversations only "
                    "(n_convs support merges additively under that contract)")
        tnorm = self._run_stage(
            "triples_norm",
            lambda: norm_triples(triples.drop("bucket")),
            "conv_id", ["triples"], resume, extra_fp=fp_of(),
        )
        vocab = self._run_stage(
            "vocab",
            lambda: merge_vocab(
                prior("vocab"),
                mention_vocab(mentions_from_norm(tnorm.drop("bucket")))),
            "norm", ["triples_norm"], resume, extra_fp=fp_of("vocab"),
            extra_metrics=lambda out: {
                "skew": skew_stats(out.drop("bucket")).collect()[0].asDict()
            },
        )
        pairs = self._run_stage(
            "pairs",
            lambda: incremental_exact_pairs(
                prior("pairs"), prior("vocab"), vocab.drop("bucket")),
            "a", ["vocab"], resume, extra_fp=fp_of("vocab", "pairs"),
        )
        components = self._run_stage(
            "components",
            lambda: canonical_map(
                vocab.drop("bucket"),
                merge_components(prior("components"), pairs.drop("bucket"))),
            "component", ["vocab", "pairs"], resume,
            extra_fp=fp_of("components"),
        )
        nodes = self._run_stage(
            "nodes",
            lambda: build_nodes(components.drop("bucket")),
            "entity_id", ["components"], resume, extra_fp=fp_of(),
        )
        remap = entity_remap(prior("components"), components.drop("bucket")) \
            .localCheckpoint(eager=True)
        delta_edges = build_edges_from_norm(
            tnorm.drop("bucket"), components.drop("bucket"),
            strategy="broadcast",
        )
        edges = self._run_stage(
            "edges",
            lambda: remap_edges(prior("edges"), remap).unionByName(delta_edges),
            "src_id", ["triples_norm", "components"], resume,
            extra_fp=fp_of("edges", "components"),
        )
        relations = self._run_stage(
            "relations",
            lambda: merge_relations(
                prior("relations"), remap,
                delta_edges, edges.drop("bucket")),
            "src_id", ["edges"], resume,
            extra_fp=fp_of("relations", "edges", "components"),
        )

        total = round(time.time() - t_total, 3)
        n_triples = next(r.rows for r in self.results if r.name == "triples")
        summary = {
            "mode": "incremental",
            "prior_dir": prior_dir,
            "stages": {r.name: {"rows": r.rows, "seconds": r.seconds, "resumed": r.resumed}
                       for r in self.results},
            "total_seconds": total,
            "delta_triples": n_triples,
            "nodes": nodes.count(),
            "edges": edges.count(),
            "relations": relations.count(),
            "triples_per_sec": round(n_triples / max(total, 1e-9), 1),
            "model_version": model_version(self.backend),
        }
        self._write_text(os.path.join(self.output_dir, "_pipeline_summary.json"),
                         json.dumps(summary, indent=1, sort_keys=True))
        return summary
