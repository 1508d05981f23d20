"""Integer-exact Lloyd k-means (datapipe.cluster): python-twin parity,
hand goldens, hostile inputs."""

from __future__ import annotations

import hashlib
import random

import pytest


def _md5h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _kmeans_py(vecs: dict[int, list[float]], k: int, iters: int,
               scale: int, salt: str = "km-v1"):
    """Independent pure-python recompute of the full pinned protocol:
    half-away quantization, md5-bucket min-id seeds, first-strict-min
    ascending-cluster argmin, divisibility-exact floor means, empty
    clusters carrying their previous centroid."""

    def q(x: float) -> int:
        import math

        v = float(x) * scale
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    qv = {i: [q(x) for x in v] for i, v in vecs.items() if v}
    buckets: dict[int, int] = {}
    for i in qv:
        b = _md5h60_py(f"{salt}#{i}") % k
        buckets[b] = min(buckets.get(b, i), i)
    cents = {b: list(qv[rep]) for b, rep in buckets.items()}

    def assign():
        out = {}
        for i, v in qv.items():
            best = None
            for c in sorted(cents):
                d = sum((a - b) * (a - b) for a, b in zip(v, cents[c]))
                if best is None or d < best[0]:
                    best = (d, c)
            out[i] = best
        return out

    for _ in range(iters):
        a = assign()
        sums: dict[int, list[int]] = {}
        ns: dict[int, int] = {}
        for i, (_, c) in a.items():
            ns[c] = ns.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(qv[i]))
            for d, x in enumerate(qv[i]):
                s[d] += x
        for c, s in sums.items():
            n = ns[c]
            cents[c] = [(x - ((x % n) + n) % n) // n for x in s]
    return assign()


def test_kmeans_python_twin(spark):
    """Randomized full-protocol parity vs the independent python
    recompute — assignments AND distances, including negative
    components (floor-mean sign handling) and ties."""
    rng = random.Random(7)
    vecs = {i: [round(rng.uniform(-1, 1), 3) for _ in range(6)]
            for i in range(60)}
    from openie_spark.datapipe.cluster import kmeans_assign

    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.dist_sq, r.cluster)
           for r in kmeans_assign(emb, k=4, iters=3, scale=1000).collect()}
    want = _kmeans_py(vecs, k=4, iters=3, scale=1000)
    assert got == want


def test_kmeans_separated_blobs(spark):
    """Hand golden: two well-separated blobs never SHARE a cluster
    after convergence (k=4 may legitimately split a blob internally;
    it must not bridge the gap)."""
    from openie_spark.datapipe.cluster import kmeans_assign

    pts = [(i, [0.01 * i, 0.0]) for i in range(10)] + \
          [(100 + i, [10.0 + 0.01 * i, 0.0]) for i in range(10)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = kmeans_assign(emb, k=4, iters=4).collect()
    assert len(rows) == 20
    lo = {r.cluster for r in rows if r.vec_id < 100}
    hi = {r.cluster for r in rows if r.vec_id >= 100}
    assert lo and hi and not (lo & hi)


def test_kmeans_stats_majority_label(spark):
    """kmeans_stats: sizes sum to the corpus, inertia is the summed
    assignment distance, and majority_label reports the dominant
    label with ties to the lowest."""
    from openie_spark.datapipe.cluster import kmeans_assign, kmeans_stats

    rng = random.Random(3)
    pts = [(i, [rng.uniform(-1, 1) for _ in range(4)], i % 3)
           for i in range(40)]
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<float>, label int")
    a = {r.vec_id: r for r in kmeans_assign(emb, k=3, iters=2).collect()}
    stats = kmeans_stats(emb, k=3, iters=2).collect()
    assert sum(s.n_vecs for s in stats) == len(pts)
    assert sum(s.inertia for s in stats) == sum(r.dist_sq for r in a.values())
    for s in stats:
        members = [i for i, r in a.items() if r.cluster == s.cluster]
        counts: dict[int, int] = {}
        for i in members:
            counts[i % 3] = counts.get(i % 3, 0) + 1
        top = max(counts.values())
        want_label = min(l for l, c in counts.items() if c == top)
        assert (s.majority_label, s.n_majority) == (want_label, top)


def test_kmeans_hostile_inputs(spark):
    """NULL and empty embeddings are excluded, not crashed on; a
    single-vector corpus still assigns."""
    from openie_spark.datapipe.cluster import kmeans_assign

    emb = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, None), (3, []), (4, [0.1, None])],
        "vec_id long, embedding array<float>")
    rows = kmeans_assign(emb, k=2, iters=2).collect()
    # vec 4 has a NULL ELEMENT: excluded too — it would poison every
    # distance (all-NULL argmin) and diverge from the oracle's
    # NULLS LAST ordering
    assert [r.vec_id for r in rows] == [1]
    assert rows[0].dist_sq == 0

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_assign(empty, k=2, iters=2).count() == 0


def test_semdedup_python_twin(spark):
    """SemDeDup within-bucket close pairs vs a direct python recompute
    over the twin's assignment: pair membership, the
    nearer-to-centroid keep rule (with the (dist, id) tie order), and
    planted near-identical twins that MUST be caught when co-bucketed."""
    import math

    rng = random.Random(11)
    vecs = {i: [round(rng.uniform(-1, 1), 3) for _ in range(4)]
            for i in range(50)}
    # planted near-dups: same id-hash bucket membership not guaranteed,
    # but the python twin computes the exact expectation either way
    vecs[100] = [v + 0.001 for v in vecs[0]]
    vecs[101] = list(vecs[7])
    eps, k, iters, scale = 250_000, 4, 2, 1000
    from openie_spark.datapipe.cluster import semdedup_pairs

    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>")
    got = {(r.cluster, r.keep_id, r.drop_id): r.pair_dist_sq
           for r in semdedup_pairs(emb, eps_sq=eps, k=k, iters=iters,
                                   scale=scale).collect()}

    def q(x: float) -> int:
        v = float(x) * scale
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    a = _kmeans_py(vecs, k=k, iters=iters, scale=scale)
    qv = {i: [q(x) for x in v] for i, v in vecs.items() if v}
    want = {}
    for i in sorted(a):
        for j in sorted(a):
            if i < j and a[i][1] == a[j][1]:
                d = sum((x - y) * (x - y) for x, y in zip(qv[i], qv[j]))
                if d <= eps:
                    keep, drop = ((i, j) if (a[i][0], i) < (a[j][0], j)
                                  else (j, i))
                    want[(a[i][1], keep, drop)] = d
    assert got == want
    assert any(set(p[1:]) == {7, 101} for p in want), \
        "planted identical twin must land in one bucket and be caught"


def test_hash_doc_vectors_python_twin(spark):
    """Signed feature hashing vs a direct python recompute: buckets,
    independent sign hash, count weighting, zero-bucket omission."""
    from openie_spark.datapipe.cluster import (
        HASH_EMBED_DIM,
        HASH_EMBED_SALT,
        hash_doc_vectors,
    )

    docs = [(1, "Spark spark SHUFFLE join 42"), (2, "a b a b a"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.dim_idx): r.val
           for r in hash_doc_vectors(df).collect()}

    import re
    want: dict = {}
    for doc_id, text in docs:
        for tok in re.findall(r"[a-z0-9]+", text.lower()):
            b = _md5h60_py(f"{HASH_EMBED_SALT}#{tok}") % HASH_EMBED_DIM
            s = 1 if _md5h60_py(f"{HASH_EMBED_SALT}s#{tok}") % 2 == 0 else -1
            want[(doc_id, b)] = want.get((doc_id, b), 0) + s
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want
    assert got  # non-vacuous on the fixture


def test_cluster_diverse_sample_caps_and_tickets(spark):
    """Every cluster contributes at most per_cluster rows, ranks are
    1..n within a cluster, and the picks follow the md5 ticket order
    (lowest tickets win) — reproducible diversity sampling."""
    from openie_spark.datapipe.cluster import (
        DIVERSE_SALT,
        cluster_diverse_sample,
        kmeans_assign,
    )

    rng = random.Random(5)
    pts = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(50)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    a = kmeans_assign(emb, k=3, iters=2)
    got = cluster_diverse_sample(emb, per_cluster=5, assignment=a).collect()
    by_c: dict = {}
    for r in got:
        by_c.setdefault(r.cluster, []).append(r)
    full = {r.vec_id: r.cluster for r in a.collect()}
    for c, rows in by_c.items():
        assert len(rows) <= 5
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
        members = sorted(
            (v for v, cc in full.items() if cc == c),
            key=lambda v: (_md5h60_py(f"{DIVERSE_SALT}#{v}"), v))
        want = members[:5]
        assert sorted(r.vec_id for r in rows) == sorted(want)
