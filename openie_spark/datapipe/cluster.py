"""Embedding clustering for corpus curation (SemDeDup-style semantic
bucketing, diversity sampling, topic sharding).

Lloyd's k-means, made ENGINE-EXACT the same way every other operator
family here is: embeddings quantize to fixed-point integers
(round-half-away x1000), centroids update by integer FLOOR division,
seeds come from md5 buckets — so Spark, the DuckDB oracle, and a pure
python twin compute bit-identical assignments with no RNG state and no
float-sum order dependence. Swap trained float centroids in and only
the quantization step changes.

Scale shape (the classic production Spark k-means shape):
  * assignment is MAP-ONLY — the K centroids are a driver-side literal
    array folded per row (K x dim integers, bounded like the IVF
    codebooks; no join, no shuffle);
  * the centroid update is ONE posexplode + partial-agg shuffle per
    iteration producing K x dim rows, collected to the driver
    (bounded);
  * iterations are a fixed compile-time constant (KMEANS_ITERS), so
    the DuckDB twin unrolls them exactly like the LPA/k-core oracles.

No counterpart in the reference (it has no vector ops); this is part
of the training-data-pipeline surface the task brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMEANS_K = 8          # clusters (md5-bucket seeded)
KMEANS_ITERS = 4      # fixed Lloyd rounds — compile-time, oracle-unrollable
KMEANS_SCALE = 1000   # fixed-point quantization: q = round(e * SCALE)
KMEANS_SALT = "km-v1"


def quantized_vecs(emb: DataFrame, scale: int = KMEANS_SCALE) -> DataFrame:
    """(vec_id, qvec array<long>): fixed-point integer embeddings.
    round-half-away-from-zero matches both JVM F.round and DuckDB
    round(); NULL/empty vectors AND vectors containing a NULL element
    are excluded (no direction, no cluster — a single NULL element
    would poison every distance and desynchronize the Spark argmin
    from the oracle's NULLS LAST ordering)."""
    q = F.transform(
        "embedding",
        lambda e: F.round(e.cast("double") * scale).cast("long"))
    return (
        emb.select("vec_id", q.alias("qvec"))
        .where(F.col("qvec").isNotNull() & (F.size("qvec") > 0)
               & ~F.exists("qvec", lambda x: x.isNull()))
    )


def _dist_sq(qvec: Column, cent: Column) -> Column:
    """Integer squared L2 distance between two long arrays."""
    return F.aggregate(
        F.zip_with(qvec, cent, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _cent_literal(cents: dict[int, list[int]]) -> Column:
    """The centroid table as ONE literal array<struct<c,v>> column,
    ascending cluster id (the argmin fold keeps the FIRST strict
    minimum, so ascending order pins ties to the lowest cluster)."""
    return F.array(*[
        F.struct(
            F.lit(int(c)).alias("c"),
            F.array(*[F.lit(int(v)) for v in vec]).alias("v"))
        for c, vec in sorted(cents.items())
    ])


def _assign(qdf: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """+ (cluster, dist_sq): nearest centroid, ties to lowest cluster
    id. Map-only — the centroids ride along as a literal. Distances
    are materialized ONCE per centroid (transform), then argmin'd over
    the precomputed structs — halving the O(K*dim) per-row cost that
    dominates each Lloyd round."""
    dists = F.transform(
        _cent_literal(cents),
        lambda e: F.struct(_dist_sq(F.col("qvec"), e["v"]).alias("d"),
                           e["c"].alias("c")))
    best = F.aggregate(
        dists,
        F.struct(F.lit(None).cast("long").alias("d"),
                 F.lit(-1).alias("c")),
        lambda acc, e: F.when(
            acc["d"].isNull() | (e["d"] < acc["d"]), e).otherwise(acc),
    )
    return qdf.withColumn("b", best).select(
        "vec_id", "qvec",
        F.col("b.c").alias("cluster"), F.col("b.d").alias("dist_sq"))


def _seed_centroids(qdf: DataFrame, k: int) -> dict[int, list[int]]:
    """Deterministic seeds: md5-bucket each vec_id into k buckets, the
    bucket's min-vec_id vector is its seed (consistent-hashing pick,
    same machinery as negative_samples). Empty buckets simply yield
    fewer initial clusters."""
    from openie_spark.datapipe.hashing import md5h60

    reps = (
        qdf.withColumn(
            "bucket",
            md5h60(F.concat(F.lit(f"{KMEANS_SALT}#"),
                            F.col("vec_id").cast("string"))) % k)
        .groupBy("bucket").agg(F.min("vec_id").alias("rep"))
    )
    rep_rows = (
        reps.join(qdf.withColumnRenamed("vec_id", "rep"), "rep")
        .select("bucket", "qvec").collect()
    )
    return {int(r.bucket): [int(v) for v in r.qvec] for r in rep_rows}


def kmeans_assign(emb: DataFrame, k: int = KMEANS_K,
                  iters: int = KMEANS_ITERS,
                  scale: int = KMEANS_SCALE) -> DataFrame:
    """Integer-exact Lloyd k-means -> (vec_id, cluster, dist_sq): the
    final assignment after ``iters`` fixed rounds from md5-bucket
    seeds. Centroid update is the integer FLOOR mean
    (s - ((s % n) + n) % n) DIV n per dimension — identical to DuckDB
    ``//`` for negative sums too; a cluster that loses all members
    keeps its previous centroid (standard, deterministic)."""
    qdf = quantized_vecs(emb, scale).localCheckpoint(eager=False)
    cents = _seed_centroids(qdf, k)
    if not cents:   # empty corpus: no seeds, no literal to fold over
        return emb.sparkSession.createDataFrame(
            [], "vec_id long, cluster int, dist_sq long")
    for _ in range(iters):
        assigned = _assign(qdf, cents)
        new_rows = (
            assigned.select("cluster", F.posexplode("qvec").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("m", F.expr("(s - ((s % n) + n) % n) DIV n"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.col("dm.m").alias("cv"))
            .collect()
        )
        cents = {
            **cents,
            **{int(r.cluster): [int(v) for v in r.cv] for r in new_rows},
        }
    return _assign(qdf, cents).select("vec_id", "cluster", "dist_sq")


def kmeans_stats(emb: DataFrame, k: int = KMEANS_K,
                 iters: int = KMEANS_ITERS,
                 scale: int = KMEANS_SCALE,
                 assignment: DataFrame | None = None) -> DataFrame:
    """Per-cluster curation readout -> (cluster, n_vecs, inertia,
    majority_label, n_majority): sizes, integer inertia (sum of
    squared quantized distances), and the dominant ``label`` with its
    support (ties to the LOWEST label) — the purity signal a curation
    run uses to decide whether semantic buckets track the taxonomy.

    Scale shape: one (cluster, label) partial-agg shuffle over the
    assignment (itself map-only), then a K-sized top-1 window. Pass a
    precomputed ``assignment`` (the warehouse pattern: cluster once,
    read the table) to skip re-running the Lloyd loop."""
    from pyspark.sql import Window

    a = (assignment if assignment is not None
         else kmeans_assign(emb, k, iters, scale))
    al = a.join(emb.select("vec_id", "label"), "vec_id")
    per_label = (
        al.groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n_l"), F.sum("dist_sq").alias("in_l"))
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n_l"), F.asc("label"))
    return (
        per_label
        .withColumn("rk", F.row_number().over(w))
        .groupBy("cluster")
        .agg(
            F.sum("n_l").alias("n_vecs"),
            F.sum("in_l").alias("inertia"),
            F.max(F.when(F.col("rk") == 1, F.col("label"))).alias("majority_label"),
            F.max(F.when(F.col("rk") == 1, F.col("n_l"))).alias("n_majority"),
        )
    )


HASH_EMBED_DIM = 64
HASH_EMBED_SALT = "he-v1"


def hash_doc_vectors(docs: DataFrame, dim: int = HASH_EMBED_DIM) -> DataFrame:
    """Feature-hashing document vectors (Weinberger et al. 2009, the
    'hashing trick') -> SPARSE rows (doc_id, dim_idx, val): each
    [a-z0-9]+ token adds ±count to the md5-chosen bucket, the sign
    from an independent salted hash — a deterministic, model-free
    text featurization that feeds the vector operators (ANN, k-means)
    straight from the documents table with NO trained embedding, and
    is exactly integer-reproducible in any engine. Zero buckets are
    omitted (sparse contract; consumers densify with a sequence
    transform when needed).

    Scale shape: tokenize/explode is map-only; ONE (doc_id, bucket)
    partial-agg shuffle bounded by dim buckets per doc — the same
    profile as word counting. No driver state, no vocabulary.
    """
    from openie_spark.datapipe.hashing import md5h60

    toks = docs.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .alias("tok"),
    )
    signed = toks.select(
        "doc_id",
        (md5h60(F.concat(F.lit(f"{HASH_EMBED_SALT}#"), F.col("tok"))) % dim)
        .cast("int").alias("dim_idx"),
        F.when(
            md5h60(F.concat(F.lit(f"{HASH_EMBED_SALT}s#"), F.col("tok"))) % 2
            == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("sgn"),
    )
    return (
        signed.groupBy("doc_id", "dim_idx")
        .agg(F.sum("sgn").alias("val"))
        .where(F.col("val") != 0)
    )


SEMDEDUP_EPS_SQ = 1_300_000   # quantized L2^2; ~6% of within-cluster pairs


def semdedup_pairs(emb: DataFrame, eps_sq: int = SEMDEDUP_EPS_SQ,
                   k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                   scale: int = KMEANS_SCALE,
                   assignment: DataFrame | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic near-dedup ->
    (cluster, keep_id, drop_id, pair_dist_sq): within every k-means
    bucket, the vector pairs closer than ``eps_sq`` (integer quantized
    squared L2 — the fixed-point stand-in for the paper's cosine
    threshold), with the member FARTHER from its centroid marked
    ``drop_id`` (ties to the higher vec_id) — exactly the paper's
    prune rule: keep the most central representative of each
    semantic duplicate pair. Pairs split across buckets are missed by
    design; that approximation IS SemDeDup (vs the exact quadratic
    sweep the ANN ground truths pin).

    Scale shape: ONE shuffle on the cluster key into Arrow batches;
    the within-cluster pair comparison is quadratic in bucket size BY
    DESIGN (the paper's published complexity — clustering exists to
    make the quadratic factor |corpus|/k, not |corpus|), and runs as
    a vectorized integer-exact GEMM per bucket (D = n_i + n_j -
    2·A·Aᵀ in float64, exact while per-element |q| ≤ 2²¹ and dim ≤
    2¹⁰ so every dot product stays under 2⁵³ — scale=1000 embeddings
    are orders of magnitude inside the bound) instead of a
    per-pair interpreted array fold, which measured ~35x slower at
    the 10x scale replica. Raise k to shrink buckets — each bucket
    must fit one python worker, the same knob the paper scales by."""
    import pandas as pd

    a = (assignment if assignment is not None
         else kmeans_assign(emb, k, iters, scale))
    withq = a.join(quantized_vecs(emb, scale), "vec_id")

    def _bucket_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame(
                {"cluster": [], "keep_id": [], "drop_id": [],
                 "pair_dist_sq": []})
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        A = np.asarray(pdf["qvec"].tolist(), dtype=np.float64)
        n2 = (A * A).sum(axis=1)
        D = n2[:, None] + n2[None, :] - 2.0 * (A @ A.T)
        iu, ju = np.triu_indices(len(pdf), 1)
        d = D[iu, ju]
        m = d <= eps_sq
        iu, ju, d = iu[m], ju[m], d[m].astype(np.int64)
        vid = pdf["vec_id"].to_numpy()
        cd = pdf["dist_sq"].to_numpy()
        # keep = nearer its centroid, ties to the lower vec_id; rows
        # are vec_id-sorted so iu < ju implies vid[iu] < vid[ju]
        i_keeps = (cd[iu] < cd[ju]) | (cd[iu] == cd[ju])
        return pd.DataFrame({
            "cluster": np.full(len(d), int(pdf["cluster"].iloc[0]),
                               dtype=np.int32),
            "keep_id": np.where(i_keeps, vid[iu], vid[ju]),
            "drop_id": np.where(i_keeps, vid[ju], vid[iu]),
            "pair_dist_sq": d,
        })

    return withq.groupBy("cluster").applyInPandas(
        _bucket_pairs,
        "cluster int, keep_id long, drop_id long, pair_dist_sq long")


DIVERSE_PER_CLUSTER = 32
DIVERSE_SALT = "ds-v1"


def cluster_diverse_sample(emb: DataFrame,
                           per_cluster: int = DIVERSE_PER_CLUSTER,
                           k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                           scale: int = KMEANS_SCALE,
                           assignment: DataFrame | None = None) -> DataFrame:
    """Diversity sampling -> (vec_id, cluster, rank): up to
    ``per_cluster`` vectors from EVERY k-means bucket, picked by md5
    ticket (deterministic, RNG-free) — the selection step of
    semantic curation: instead of truncating the corpus front-to-back
    (which keeps near-duplicates and drops whole regions of the
    embedding space), take an even, reproducible slice of each
    semantic bucket. Pass the memoized ``assignment`` to reuse a
    clustered table.

    Scale shape: one window over the assignment partitioned by
    cluster — partition width is cluster size; for skew-heavy corpora
    raise k (more, smaller buckets), the same knob the clustering
    itself scales by. Output is K x per_cluster bounded."""
    from pyspark.sql import Window

    from openie_spark.datapipe.hashing import md5h60

    a = (assignment if assignment is not None
         else kmeans_assign(emb, k, iters, scale))
    ticket = md5h60(F.concat(F.lit(f"{DIVERSE_SALT}#"),
                             F.col("vec_id").cast("string")))
    w = Window.partitionBy("cluster").orderBy(ticket.asc(), F.col("vec_id"))
    return (
        a.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= per_cluster)
        .select("vec_id", "cluster", "rank")
    )
