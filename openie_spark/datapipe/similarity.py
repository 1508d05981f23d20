"""Similarity search over the ``embeddings`` table
(vec_id BIGINT, embedding FLOAT[], label INT).

* ``brute_topk_sql`` — exact cosine top-k for a deterministic query
  sample, pure column expressions (zip_with dot product + window
  rank). Quadratic in corpus size — the correctness oracle / small-
  scale baseline, DuckDB-checked.
* ``brute_topk_np`` — same computation as one numpy matmul per Arrow
  batch (mapInPandas, corpus broadcast) — the throughput path for a
  broadcastable corpus; identical results pinned by tests.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit sketch over
  deterministic md5-derived hyperplanes, candidates restricted to the
  query's bucket (multi-probe over bands) — the 100 TB path: shuffle
  is bucket-sized, not corpus-sized. Recall vs brute force pinned by
  tests; the driver gate hash-checks it against a full DuckDB oracle
  (``lsh_topk_sql`` recomputes planes → sketches → buckets → rescore).
* ``embedding_pairs`` — cosine near-duplicate pairs (dedup family).

* ``ivf_topk`` — IVF-style coarse quantization: a deterministic
  training-free quantizer (the ``n_centroids`` corpus vectors with the
  smallest md5(vec_id) keys act as cell centroids), map-side argmax
  assignment against the broadcast centroid table, inverted-list
  candidate join keyed by cell id, exact rescoring. Fully
  md5-deterministic → DuckDB-checkable end to end
  (plans/datapipe_oracles.ivf_topk_sql), unlike real kmeans IVF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openie_spark.datapipe.hashing import md5h60

TOPK = 5
QUERY_MOD = 50          # query sample: vec_id % QUERY_MOD == 0
NEAR_DUP_COSINE = 0.95
# 4 bands x 15 bits = 32,768 buckets per band. Band width is the
# scale knob: with the old 4-bit bands every band had only 16 distinct
# values, so at corpus scale each bucket held ~n/16 of ALL vectors and
# the candidate join degraded to ~n^2 — the cross join this design
# exists to avoid. 15-bit bands keep expected bucket size ~n/32768
# per band; bit 59 is the highest used, so the packed sketch stays a
# non-negative long (bit 63 would sign-poison the arithmetic shifts).
LSH_PLANES = 60
LSH_PLANE_BANDS = 4
PLANT_VEC_OFFSET = 100_000


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product UNROLLED to static expressions for a known dim.

    Numerically identical to ``_dot`` (same left-fold order, same
    0.0 seed — float addition is order-sensitive and the DuckDB
    oracles replay the sequential fold), but whole-stage-codegen'd:
    higher-order functions evaluate their lambdas interpreted per
    element, which at 60 planes x dim elements per row dominated the
    LSH sketch cost. F.get (0-based, null out-of-bounds) keeps
    ragged/short vectors on the HOF path's null semantics — and unlike
    try_element_at it stays inside codegen (TryEval wrappers forced
    the unrolled chain interpreted, slower than the HOF it replaced)."""
    s = F.lit(0.0)
    for d in range(dim):
        s = s + F.get(a, d) * F.get(b, d)
    return s


def _plane_dot(unit: Column, weights: list[float]) -> Column:
    """Unrolled dot of a vector column against LITERAL plane weights
    (the weight element lookups fold away entirely)."""
    s = F.lit(0.0)
    for d, w in enumerate(weights):
        s = s + F.get(unit, d) * F.lit(w)
    return s


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_unit(df: DataFrame, vec: str = "embedding",
              dim: int | None = None) -> DataFrame:
    """Pre-normalize to unit length (double precision) — cosine becomes
    a plain dot product; normalization happens once per vector, not
    once per pair.

    With ``dim`` (every internal caller): ONE vectorized numpy pass per
    Arrow batch via mapInPandas. The norm folds dims sequentially
    (acc += x[:,d]·x[:,d]) — the same left-to-right IEEE float64 order
    as the expression fold and the DuckDB oracles' list reduce — and
    np.sqrt / elementwise divide are correctly-rounded IEEE like their
    JVM twins, so the units (and every downstream round-6 cosine) are
    bit-identical to the old expression path.

    Why not column expressions: the staged-norm form was quadratically
    re-evaluated by consumers — CollapseProject/filter-pushdown inline
    the norm AND the cast-array subtree into each of the dim lambda
    elements of the unit transform (lambda-body references are not
    counted when Catalyst decides an alias is cheap to inline), so a
    mere ``isnan(unit[0])`` filter on top cost ~15 ms/row at dim 64
    (measured: 30 s for a 2,000-row corpus). The mapInPandas node is
    both linear and an optimizer barrier, so no consumer can re-inline
    the normalization.

    Degenerate-vector guard: under ANSI mode (Spark 4 default) x/0.0
    in an expression is a job-killing DIVIDE_BY_ZERO — ONE zero
    embedding in a 100 TB corpus would abort every similarity query.
    A vector with no direction (zero norm, NaN elements, NULL, or
    shorter than ``dim``) gets a NULL ``unit`` instead: NaN markers
    cannot ride an Arrow list column (the pandas→Arrow conversion
    masks NaN list elements to null), so NULL is the one marker that
    round-trips, and every consumer drops these rows with a plain
    ``unit IS NOT NULL`` before scoring. The oracles recompute units
    natively from the raw embeddings and exclude the same rows, so
    result sets stay bit-for-bit.

    ``dim=None`` keeps the legacy HOF expression path (NaN-unit
    marker) for callers that cannot know the width up front."""
    if dim is None:
        v = F.transform(F.col(vec), lambda x: x.cast("double"))
        nc, vc = "_wu_nrm", "_wu_v"
        unit = F.when(
            F.col(nc) != 0.0,
            F.transform(F.col(vc), lambda x: x / F.col(nc)),
        ).otherwise(F.transform(F.col(vc), lambda x: F.lit(float("nan"))))
        return (df.withColumn(vc, v)
                .withColumn(nc, _norm(F.col(vc)))
                .withColumn("unit", unit)
                .drop(vc, nc))

    import numpy as np
    import pandas as pd

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["unit array<double>"])

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            vals = [None if v is None else np.asarray(v, dtype=np.float64)
                    for v in pdf[vec]]
            units: list = [None] * len(vals)
            fast = [i for i, v in enumerate(vals)
                    if v is not None and v.shape[0] == dim]
            if fast:
                x = np.stack([vals[i] for i in fast])  # (n, dim)
                s = np.zeros(len(fast), dtype=np.float64)
                for d in range(dim):
                    s = s + x[:, d] * x[:, d]
                nrm = np.sqrt(s)
                ok = np.isfinite(nrm) & (nrm != 0.0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    u = x / nrm[:, None]
                for j, i in enumerate(fast):
                    if ok[j]:
                        units[i] = u[j]
            for i, v in enumerate(vals):
                if v is None or units[i] is not None or v.shape[0] <= dim:
                    continue  # degenerate rows stay None
                # overlong row: norm over the first dim elements (the
                # expression fold's semantics), divide every element
                s = 0.0
                for d in range(dim):
                    s = s + v[d] * v[d]
                n = np.sqrt(s)
                if np.isfinite(n) and n != 0.0:
                    units[i] = v / n
            pdf["unit"] = pd.Series(units, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(run, out_schema)


def _dim_of(emb: DataFrame) -> int:
    return len(emb.select("embedding").first()[0])


def _queries(emb: DataFrame, query_mod: int) -> DataFrame:
    return emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("unit").alias("q_vec")
    )


def brute_topk_sql(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD) -> DataFrame:
    """(q_id, rank, vec_id, cos): exact top-k by cosine, self-match
    excluded; ties broken by vec_id for determinism.

    Zero-norm/NULL/empty embeddings are EXCLUDED (query and corpus
    side): a vector with no direction has no defined cosine — with_unit
    marks such rows with a NULL unit and the `unit IS NOT NULL` filter
    drops them. The oracle recomputes units natively (a zero vector's
    unit is all-NaN in DuckDB) and excludes the SAME rows via
    `NOT isnan(unit[1])`."""
    dim = _dim_of(emb)
    # two consumers (query sample + corpus side of the cross join) —
    # materialize the normalized units once instead of re-running the
    # Arrow normalization per side; NULL units are the degenerate rows.
    e = (
        with_unit(emb.select("vec_id", "embedding"), dim=dim)
        .select("vec_id", "unit")
        .where(F.col("unit").isNotNull())
        .localCheckpoint(eager=False)
    )
    q = _queries(e, query_mod)
    corpus = e.select("vec_id", "unit")
    scored = (
        q.crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", F.round(_dot_fixed(F.col("q_vec"), F.col("unit"), dim), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )


BROADCAST_MAX_VECS = 2_000_000


def brute_topk_np(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD,
                  max_broadcast_vecs: int = BROADCAST_MAX_VECS) -> DataFrame:
    """Same result as brute_topk_sql via one numpy GEMM per Arrow batch
    of queries against the broadcast corpus matrix.

    Broadcastable-corpus path ONLY: the corpus matrix lives on the
    driver and every executor. Above ``max_broadcast_vecs`` vectors it
    falls back to the distributed SQL plan (row-identical by tests)
    rather than OOM-ing the driver; at 10^9-vector scale use
    ``lsh_topk``."""
    import numpy as np
    import pandas as pd

    # same zero-norm/NULL exclusion as brute_topk_sql (see its doc)
    e = (with_unit(emb.select("vec_id", "embedding"), dim=_dim_of(emb))
         .select("vec_id", "unit")
         .where(F.col("unit").isNotNull()))
    # size gate folded into the ONE corpus collect (limit max+1 bounds
    # driver memory exactly like the old count-first gate, without a
    # second full scan of the embedding table)
    corpus_rows = e.limit(max_broadcast_vecs + 1).collect()
    if len(corpus_rows) > max_broadcast_vecs:
        return brute_topk_sql(emb, k, query_mod)
    ids = np.array([r.vec_id for r in corpus_rows], dtype=np.int64)
    mat = np.array([r.unit for r in corpus_rows], dtype=np.float64)
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    q = _queries(e, query_mod)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.array(list(pdf["q_vec"]), dtype=np.float64)
            corpus = b_mat.value
            # Sequential ascending-d fold with a 0.0 seed — the SAME
            # float64 operation order as _dot_fixed's codegen'd fold,
            # so the sums are bit-identical to brute_topk_sql's. (A
            # GEMM sums in an implementation-defined order; a last-ulp
            # difference can straddle a round-6 boundary and flip a
            # rank near a tie.) Same FLOPs as the GEMM it replaces.
            scores = np.zeros((len(qm), corpus.shape[0]), dtype=np.float64)
            for d in range(corpus.shape[1]):
                scores = scores + np.multiply.outer(qm[:, d], corpus[:, d])
            # HALF_UP round-6 (JVM F.round / DuckDB round semantics),
            # NOT np.round's IEEE half-to-even — same kernel as
            # ivf_topk._sims below.
            scores = np.copysign(np.floor(np.abs(scores) * 1e6 + 0.5),
                                 scores) / 1e6
            out = []
            for qi, q_id in enumerate(pdf["q_id"]):
                s = scores[qi]
                mask = b_ids.value != q_id
                # sort by (-cos, vec_id): lexsort keys in reverse
                # priority. Degenerate vectors are NULL-unit-filtered
                # above (with_unit NULLs NaN-bearing rows too);
                # defense-in-depth should a NaN score ever appear:
                # Spark orders NaN GREATER than any double under
                # desc('cos') while lexsort sorts NaN last — map NaN
                # to -inf in the negated key so both paths agree.
                neg = np.where(np.isnan(s[mask]), -np.inf, -s[mask])
                order = np.lexsort((b_ids.value[mask], neg))[:k]
                cand_ids = b_ids.value[mask][order]
                cand_s = s[mask][order]
                for rank, (vid, cs) in enumerate(zip(cand_ids, cand_s), 1):
                    out.append((q_id, rank, int(vid), float(cs)))
            yield pd.DataFrame(out, columns=["q_id", "rank", "vec_id", "cos"])

    return q.mapInPandas(run, "q_id long, rank int, vec_id long, cos double")


def _plane(dim: int, p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component weights from
    md5 — stable across engines/processes, no RNG state."""
    import hashlib

    return [
        (int(hashlib.md5(f"plane{p}dim{d}".encode()).hexdigest()[:8], 16) / 0x7FFFFFFF) - 1.0
        for d in range(dim)
    ]


def lsh_sketch(df: DataFrame, dim: int, planes: int = LSH_PLANES) -> DataFrame:
    """+ sketch: bit p = sign(unit · plane_p). Arrow-batched numpy.

    Why not column expressions: 60 planes x dim-term dots exceed
    janino's 64 KB method limit when unrolled (whole-stage codegen
    fails and falls back to interpreted eval of a 4000-node tree), and
    the HOF ``aggregate(zip_with(...))`` form pays an interpreted
    per-element lambda 60x per row — both measured slower than one
    vectorized pass per Arrow batch. The kernel folds dims
    SEQUENTIALLY (acc += X[:,d] · w[p,d]) — the same left-to-right
    IEEE order as the old JVM fold and the DuckDB oracle's list
    reduce, so the sign bits are bit-identical; a GEMM would
    reassociate the sum and could flip a sign where a dot ≈ 0.
    Requires fixed-width vectors (the embeddings contract)."""
    import numpy as np

    w_mat = np.array([_plane(dim, p) for p in range(planes)],
                     dtype=np.float64)  # (planes, dim)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["sketch long"])

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["sketch"] = np.array([], dtype=np.int64)
                yield pdf
                continue
            x = np.array(list(pdf["unit"]), dtype=np.float64)  # (n, dim)
            sketch = np.zeros(len(pdf), dtype=np.int64)
            for p in range(w_mat.shape[0]):
                acc = np.zeros(len(pdf), dtype=np.float64)
                for d in range(dim):
                    acc = acc + x[:, d] * w_mat[p, d]
                sketch |= (acc >= 0).astype(np.int64) << p
            pdf["sketch"] = sketch
            yield pdf

    return df.mapInPandas(run, out_schema)


def _banded(df: DataFrame, id_col: str, vec_col: str,
            planes: int, bands: int) -> DataFrame:
    """sketched df → one row per band: (band_idx, band_val, id, vec)."""
    band_bits = planes // bands
    mask = (1 << band_bits) - 1
    return df.select(
        F.col("vec_id").alias(id_col), F.col("unit").alias(vec_col),
        F.posexplode(F.array(*[
            F.shiftright(F.col("sketch"), b * band_bits).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ])).alias("band_idx", "band_val"),
    )


def lsh_topk(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD,
             planes: int = LSH_PLANES, bands: int = LSH_PLANE_BANDS) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing ≥1 sketch band
    with the query; exact rescoring within candidates."""
    from openie_spark.functions.partitioning import spread

    dim = _dim_of(emb)
    # materialized once: query and corpus sides both derive from the
    # sketch table, which would otherwise be computed twice; id+unit
    # only — no raw embedding through Arrow or the checkpoint
    e = lsh_sketch(
        with_unit(spread(emb.select("vec_id", "embedding"), "vec_id"),
                  dim=dim).select("vec_id", "unit")
        .where(F.col("unit").isNotNull()),
        dim, planes).localCheckpoint(eager=False)

    # ids-only through the band join and the dedup shuffle (the unit
    # vectors re-attach by id afterwards — same discipline as
    # embedding_pairs; dim-wide arrays never ride a distinct())
    q = _banded(e.filter(F.col("vec_id") % query_mod == 0),
                "q_id", "q_vec", planes, bands).select("band_idx", "band_val", "q_id")
    c = _banded(e, "vec_id", "unit", planes, bands).select("band_idx", "band_val", "vec_id")
    ids = (
        q.join(c, ["band_idx", "band_val"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id").distinct()
    )
    qv = e.select(F.col("vec_id").alias("q_id"), F.col("unit").alias("q_vec"))
    cand = (
        ids.join(qv, "q_id").join(e.select("vec_id", "unit"), "vec_id")
        .withColumn("cos", F.round(_dot_fixed(F.col("q_vec"), F.col("unit"), dim), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )


def lsh_bucket_stats(emb: DataFrame, planes: int = LSH_PLANES,
                     bands: int = LSH_PLANE_BANDS) -> DataFrame:
    """Observability for the sign-LSH skew axis (mirrors
    kg/linking.py's block-size stats): one row per band with bucket
    count, max/avg bucket size, and the candidate-pair mass
    Σ size·(size-1)/2 the self-join would generate. Run this before an
    `embedding_pairs` job at a new scale — a max bucket ≈ corpus size
    means the band width no longer separates this corpus."""
    dim = _dim_of(emb)
    e = lsh_sketch(with_unit(emb.select("vec_id", "embedding"), dim=dim)
                   .select("vec_id", "unit")
                   .where(F.col("unit").isNotNull()), dim, planes)
    b = _banded(e, "vec_id", "unit", planes, bands)
    per_bucket = b.groupBy("band_idx", "band_val").agg(F.count("*").alias("sz"))
    return per_bucket.groupBy("band_idx").agg(
        F.count("*").alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.round(F.avg("sz"), 2).alias("avg_bucket"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("long").alias("cand_pairs"),
    )


IVF_CENTROIDS = 16
IVF_NPROBE = 4


def ivf_topk(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD,
             n_centroids: int = IVF_CENTROIDS, nprobe: int = IVF_NPROBE) -> DataFrame:
    """Approximate top-k via IVF coarse quantization.

    Quantizer: instead of trained kmeans centroids, the ``n_centroids``
    corpus vectors with the smallest (md5(vec_id), vec_id) keys — a
    deterministic uniform sample, so the whole structure (cells,
    probes, results) is engine-portable and DuckDB-recomputable.

    Scale shape (the 10^9-vector path next to ``lsh_topk``):
    * centroid selection is TakeOrderedAndProject (per-partition top-n,
      no global sort shuffle); the n_centroids winners are a BOUNDED
      driver collect inlined as literal weights — assignment and probe
      selection become pure per-row projections (argmax / top-nprobe
      over array_max / array_sort of literal-dot structs), so the
      corpus is NEVER shuffled for assignment (the previous
      broadcast-crossJoin + groupBy(vec_id) form moved every unit
      vector through one exchange);
    * the candidate join is keyed by cell id — an inverted list whose
      shuffle is cell-sized, never corpus²; cell-count imbalance is
      IVF's skew axis — raise n_centroids (or cap hot cells like
      kg/linking.py's hot-block cap) at scale.
    """
    from openie_spark.functions.partitioning import spread

    dim = _dim_of(emb)
    # two consumers (centroid scan, corpus/queries) — materialize the
    # normalized corpus once
    e = (with_unit(spread(emb.select("vec_id", "embedding"), "vec_id"), dim=dim)
         .select("vec_id", "unit")
         .where(F.col("unit").isNotNull()).localCheckpoint(eager=False))
    cent = (
        e.select(F.col("vec_id").alias("c_id"), F.col("unit").alias("c_vec"))
        .withColumn("h", md5h60(F.col("c_id").cast("string")))
        .orderBy("h", "c_id")
        .limit(n_centroids)
        .drop("h")
    )
    import numpy as np

    cent_rows = sorted(cent.collect(), key=lambda r: r.c_id)
    cent_ids = np.array([r.c_id for r in cent_rows], dtype=np.int64)
    cent_mat = np.array([r.c_vec for r in cent_rows], dtype=np.float64)
    npb = min(nprobe, len(cent_rows))

    # Arrow-batched numpy for the centroid sims (an n_centroids x dim
    # literal expression tree exceeds janino's 64 KB codegen limit —
    # same failure mode lsh_sketch documents). Sequential dim fold +
    # HALF_UP round-6 reproduce the JVM/DuckDB ordering; cent_rows
    # ascend by c_id so numpy's first-max argmax / stable argsort give
    # the same lowest-c_id tiebreak the old max_by/window forms used.
    def _sims(x: "np.ndarray") -> "np.ndarray":
        sims = np.empty((x.shape[0], len(cent_ids)), dtype=np.float64)
        for c in range(len(cent_ids)):
            acc = np.zeros(x.shape[0], dtype=np.float64)
            for d in range(dim):
                acc = acc + x[:, d] * cent_mat[c, d]
            sims[:, c] = acc
        return np.copysign(np.floor(np.abs(sims) * 1e6 + 0.5), sims) / 1e6

    def _assign(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["cell"] = np.array([], dtype=np.int64)
                yield pdf
                continue
            sims = _sims(np.array(list(pdf["unit"]), dtype=np.float64))
            pdf["cell"] = cent_ids[np.argmax(sims, axis=1)]
            yield pdf

    def _probe(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            sims = _sims(np.array(list(pdf["q_vec"]), dtype=np.float64))
            out = []
            for i in range(len(pdf)):
                order = np.argsort(-sims[i], kind="stable")[:npb]
                for c in order:
                    out.append((pdf["q_id"].iloc[i], pdf["q_vec"].iloc[i],
                                int(cent_ids[c])))
            yield pd.DataFrame(out, columns=["q_id", "q_vec", "cell"])

    assign = e.select("vec_id", "unit").mapInPandas(
        _assign, "vec_id long, unit array<double>, cell long")
    probes = _queries(e, query_mod).mapInPandas(
        _probe, "q_id long, q_vec array<double>, cell long")
    cand = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", F.round(_dot_fixed(F.col("q_vec"), F.col("unit"), dim), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )


PQ_SUBSPACES = 4        # m: subvector count (dim must divide evenly)
PQ_CODES = 16           # ks: codebook entries per subspace (1 byte >= this)
PQ_CAND = 20            # exact-rescore set per query (4x TOPK)
PQ_SALT = "pq-v1"       # decorrelates the PQ sample from the IVF centroids


def ivfpq_topk(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD,
               n_centroids: int = IVF_CENTROIDS, nprobe: int = IVF_NPROBE,
               m: int = PQ_SUBSPACES, ks: int = PQ_CODES,
               n_cand: int = PQ_CAND) -> DataFrame:
    """IVFPQ: IVF coarse cells bound the candidate set, PRODUCT-
    QUANTIZATION codes rank candidates without touching full vectors
    (Jégou et al. 2011, public algorithm).

    Each vector is encoded once as ``m`` sub-codebook indices: split
    the unit vector into m subvectors, assign each to its nearest of
    ``ks`` sampled sub-centroids (argmin L2 == argmax x·c − ½‖c‖², so
    the already engine-pinned inner-product kernel is the only
    primitive). Asymmetric-distance (ADC) score of query q vs code =
    Σ_m (q_m · centroid[m][code_m]), each term in exact round-6
    INTEGER micro-units so the m-way sum is order-free and
    engine-portable.

    Why this is the 10^9-vector path: the inverted-list candidate join
    shuffles (cell, vec_id, codes) — m bytes of code per vector, not
    the dim×8-byte unit (64x smaller at dim 64) — and full vectors are
    re-attached by id-join ONLY for the top-``n_cand`` ADC winners per
    query before the exact rescore. Codebooks are md5-deterministic
    samples (like ivf_topk's centroids) so the whole structure is
    DuckDB-recomputable.
    """
    import numpy as np

    from openie_spark.functions.partitioning import spread

    dim = _dim_of(emb)
    if dim % m:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by m={m}")
    sub = dim // m
    e = (with_unit(spread(emb.select("vec_id", "embedding"), "vec_id"), dim=dim)
         .select("vec_id", "unit")
         .where(F.col("unit").isNotNull()).localCheckpoint(eager=False))

    # coarse centroids: identical sampling rule to ivf_topk
    cent_rows = sorted(
        e.select(F.col("vec_id").alias("c_id"), F.col("unit").alias("c_vec"))
        .withColumn("h", md5h60(F.col("c_id").cast("string")))
        .orderBy("h", "c_id").limit(n_centroids).drop("h").collect(),
        key=lambda r: r.c_id)
    cent_ids = np.array([r.c_id for r in cent_rows], dtype=np.int64)
    cent_mat = np.array([r.c_vec for r in cent_rows], dtype=np.float64)
    npb = min(nprobe, len(cent_rows))

    # PQ codebook: ks md5-sampled vectors (salted — independent of the
    # IVF sample), code j = rank j in (md5, vec_id) order; sub-centroid
    # [m][j] = subvector m of sample j. Bounded collect (ks rows).
    pq_rows = (
        e.select("vec_id", "unit")
        .withColumn("h", md5h60(F.concat(F.lit(f"{PQ_SALT}#"),
                                         F.col("vec_id").cast("string"))))
        .orderBy("h", "vec_id").limit(ks).drop("h").collect())
    cb = np.array([r.unit for r in pq_rows], dtype=np.float64)  # (ks, dim)
    # per-subspace score offset: -0.5*||c||^2 (sequential fold, like
    # the oracle's list_inner_product)
    cb_half = np.empty((m, ks), dtype=np.float64)
    for mm in range(m):
        for j in range(ks):
            acc = 0.0
            for d in range(sub):
                acc = acc + cb[j, mm * sub + d] * cb[j, mm * sub + d]
            cb_half[mm, j] = 0.5 * acc

    def _seq_dots(x: "np.ndarray", mat: "np.ndarray") -> "np.ndarray":
        """Sequential-order dot of rows of x against rows of mat —
        replays DuckDB's list_inner_product fold exactly."""
        out = np.empty((x.shape[0], mat.shape[0]), dtype=np.float64)
        for c in range(mat.shape[0]):
            acc = np.zeros(x.shape[0], dtype=np.float64)
            for d in range(x.shape[1]):
                acc = acc + x[:, d] * mat[c, d]
            out[:, c] = acc
        return out

    def _round6(a: "np.ndarray") -> "np.ndarray":
        return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6

    def _micro(a: "np.ndarray") -> "np.ndarray":
        """round-half-away(a*1e6) as exact int64 micro-units."""
        return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a).astype(np.int64)

    def _encode(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["cell"] = np.array([], dtype=np.int64)
                pdf["codes"] = [[] for _ in range(0)]
                yield pdf[["vec_id", "cell", "codes"]]
                continue
            x = np.array(list(pdf["unit"]), dtype=np.float64)
            sims = _round6(_seq_dots(x, cent_mat))
            pdf["cell"] = cent_ids[np.argmax(sims, axis=1)]
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for mm in range(m):
                xs = x[:, mm * sub:(mm + 1) * sub]
                score = _round6(_seq_dots(xs, cb[:, mm * sub:(mm + 1) * sub])
                                - cb_half[mm])
                codes[:, mm] = np.argmax(score, axis=1)   # first-max = lowest code
            pdf["codes"] = list(codes)
            yield pdf[["vec_id", "cell", "codes"]]

    def _probe(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            sims = _round6(_seq_dots(
                np.array(list(pdf["q_vec"]), dtype=np.float64), cent_mat))
            out = []
            for i in range(len(pdf)):
                for c in np.argsort(-sims[i], kind="stable")[:npb]:
                    out.append((pdf["q_id"].iloc[i], pdf["q_vec"].iloc[i],
                                int(cent_ids[c])))
            yield pd.DataFrame(out, columns=["q_id", "q_vec", "cell"])

    def _adc(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["adc"] = np.array([], dtype=np.int64)
                yield pdf[["q_id", "vec_id", "adc"]]
                continue
            q = np.array(list(pdf["q_vec"]), dtype=np.float64)
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            adc = np.zeros(len(pdf), dtype=np.int64)
            for mm in range(m):    # Σ_m in fixed order; integer => order-free
                t = _micro(_seq_dots(q[:, mm * sub:(mm + 1) * sub],
                                     cb[:, mm * sub:(mm + 1) * sub]))
                adc = adc + t[np.arange(len(pdf)), codes[:, mm]]
            pdf["adc"] = adc
            yield pdf[["q_id", "vec_id", "adc"]]

    codes_t = e.select("vec_id", "unit").mapInPandas(
        _encode, "vec_id long, cell long, codes array<int>")
    probes = _queries(e, query_mod).mapInPandas(
        _probe, "q_id long, q_vec array<double>, cell long").localCheckpoint(eager=False)
    ranked = (
        probes.join(codes_t, "cell")                 # ids+codes only
        .filter(F.col("vec_id") != F.col("q_id"))
        .mapInPandas(_adc, "q_id long, vec_id long, adc long")
    )
    wa = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    shortlist = (ranked.withColumn("arank", F.row_number().over(wa))
                 .filter(F.col("arank") <= n_cand).select("q_id", "vec_id"))
    # full vectors re-attach by id-join for the bounded rescore set
    rescored = (
        shortlist
        .join(probes.select("q_id", "q_vec").distinct(), "q_id")
        .join(e.select("vec_id", "unit"), "vec_id")
        .withColumn("cos", F.round(_dot_fixed(F.col("q_vec"), F.col("unit"), dim), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )


def planted_embeddings(emb: DataFrame) -> DataFrame:
    """emb ∪ near-identical twins (dim 0 scaled by 1.05; vec_id +=
    PLANT_VEC_OFFSET) — deterministic cos≈0.999 ground truth for the
    near-dup / ANN paths, mirrored in DuckDB by the oracle."""
    base = emb.select("vec_id", "embedding")
    noised = base.select(
        (F.col("vec_id") + PLANT_VEC_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x, i: F.when(i == 0, x * 1.05).otherwise(x)).alias("embedding"),
    )
    return base.unionByName(noised, allowMissingColumns=False)


def embedding_pairs(emb: DataFrame, threshold: float = NEAR_DUP_COSINE,
                    planes: int = LSH_PLANES, bands: int = LSH_PLANE_BANDS) -> DataFrame:
    """Cosine near-duplicate pairs (a < b): sign-LSH band buckets
    generate candidates (shuffle is bucket-sized, never the n² cross
    join), exact cosine rescoring keeps only pairs ≥ threshold.

    Scale shape mirrors minhash_pairs_docs: candidate (a, b) ids dedup
    WITHOUT the unit vectors in the shuffle; vectors re-attach by id
    join for rescoring. The md5-deterministic hyperplanes make the
    candidate set engine-portable — the DuckDB oracle recomputes the
    identical sketches (plans/datapipe_oracles.embedding_pairs_sql).
    ``embedding_pairs_exact`` is the quadratic small-scale ground truth
    used by tests to pin recall."""
    from openie_spark.functions.partitioning import spread

    dim = _dim_of(emb)
    e = lsh_sketch(
        with_unit(spread(emb.select("vec_id", "embedding"), "vec_id"),
                  dim=dim).select("vec_id", "unit")
        .where(F.col("unit").isNotNull()),
        dim, planes).localCheckpoint(eager=False)
    left = _banded(e, "a", "ua", planes, bands).select("band_idx", "band_val", "a")
    right = _banded(e, "b", "ub", planes, bands).select("band_idx", "band_val", "b")
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )
    ua = e.select(F.col("vec_id").alias("a"), F.col("unit").alias("ua"))
    ub = e.select(F.col("vec_id").alias("b"), F.col("unit").alias("ub"))
    return (
        cand.join(ua, "a").join(ub, "b")
        .withColumn("cos", F.round(_dot_fixed(F.col("ua"), F.col("ub"), dim), 6))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def embedding_pairs_exact(emb: DataFrame, threshold: float = NEAR_DUP_COSINE) -> DataFrame:
    """Exact all-pairs variant — quadratic by construction; the
    small-scale ground truth that pins embedding_pairs' recall in
    tests (the planted cos≈0.999 twins must all survive the LSH gate)."""
    from openie_spark.functions.partitioning import spread

    dim = _dim_of(emb)
    e = (with_unit(spread(emb.select("vec_id", "embedding"), "vec_id"), dim=dim)
         .select("vec_id", "unit").where(F.col("unit").isNotNull()))
    left = e.select(F.col("vec_id").alias("a"), F.col("unit").alias("ua"))
    right = e.select(F.col("vec_id").alias("b"), F.col("unit").alias("ub"))
    return (
        left.join(right, F.col("a") < F.col("b"))
        .withColumn("cos", F.round(_dot_fixed(F.col("ua"), F.col("ub"), dim), 6))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def embedding_groups(emb: DataFrame) -> DataFrame:
    """(vec_id, group_id, group_size, is_keeper): SEMANTIC near-dup
    clusters — connected components over the embedding_pairs graph
    (sign-LSH candidates + exact cosine rescore), group label = min
    member vec_id, keeper = that member. Vectors in no pair are
    singleton keepers.

    The embedding-space twin of dedup.neardup_groups (same component
    machinery, same keeper policy): pairs alone don't dedup a corpus —
    a~b, b~c must collapse to ONE representative before training.
    Scale shape: the pair graph is near-dup-sparse by construction and
    components run on ids only; the vector table never enters the
    iteration.
    """
    from openie_spark.kg.canon import connected_components

    pairs = embedding_pairs(emb).select("a", "b")
    comp = connected_components(pairs).select(
        F.col("norm").alias("vec_id"), F.col("component").alias("group_id"))
    labeled = (
        emb.select("vec_id")
        .join(comp, "vec_id", "left")
        .withColumn("group_id", F.coalesce("group_id", F.col("vec_id")))
        .localCheckpoint(eager=False)   # consumed twice (sizes + join)
    )
    sizes = labeled.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("group_size"))
    return (
        labeled.join(sizes, "group_id")
        .withColumn("is_keeper", F.col("vec_id") == F.col("group_id"))
        .select(
            F.col("vec_id").cast("long"),
            F.col("group_id").cast("long"),
            "group_size", "is_keeper",
        )
    )
