"""Stage G — canonicalization: connected components over alias pairs.

Iterative min-label propagation (GraphFrames-style joins, no external
dependency): every vertex starts labeled with itself; each round every
vertex takes the min label among itself and its neighbors; fixpoint
when no label changes. Deterministic: the component id IS the
lexicographically-smallest member mention.

Scale notes:
  * each round = one shuffle (edge⋈label hash join + min-agg on the
    vertex key); rounds needed = graph diameter, and alias graphs are
    shallow (typical diameter ≤ 5).
  * ``localCheckpoint`` after every round truncates the lineage chain —
    without it the plan doubles per iteration and the 10th round
    recompiles a 2^10-node DAG.
  * convergence test is a single count aggregate per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DRIVER_CC_MAX_EDGES = 5_000_000


def _cc_driver(spark, pair_rows) -> DataFrame:
    """Union-find on the driver — for pair sets small enough to collect
    (the alias graph is vocabulary-sized, and after blocking/LSH it is
    orders of magnitude smaller than the vocabulary). Component id =
    lexicographically smallest member, identical to the iterative
    min-label fixpoint."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pair_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict[str, str] = {}
    for v in parent:
        r = find(v)
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    rows = [(v, comp_min[find(v)]) for v in parent]
    return spark.createDataFrame(rows, "norm string, component string")


def connected_components(pairs: DataFrame, max_iter: int = 25,
                         driver_threshold: int = DRIVER_CC_MAX_EDGES) -> DataFrame:
    """pairs(a, b, …) → components(norm string, component string).

    Only vertices that appear in some pair are returned; singletons are
    their own component by definition (callers coalesce).

    Scale-adaptive (same spirit as Spark's broadcast threshold): below
    ``driver_threshold`` edges the component structure is solved with a
    driver-side union-find in one pass (the distributed fixpoint costs
    diameter-many shuffle rounds — a fixed multi-second floor that
    dwarfs sub-million-edge inputs); above it, the iterative min-label
    joins run as before. Both produce the identical min-member
    labeling."""
    edge_pairs = pairs.select("a", "b")
    if driver_threshold and edge_pairs.limit(driver_threshold + 1).count() <= driver_threshold:
        return _cc_driver(pairs.sparkSession,
                          [(r.a, r.b) for r in edge_pairs.collect()])
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("norm")).distinct()
        .withColumn("component", F.col("norm"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.norm)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.norm == neighbor_min.src, "left")
            .select(
                "norm",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels


def canonical_map(vocab: DataFrame, components: DataFrame) -> DataFrame:
    """vocab ⟕ components → (norm, component) with singleton mentions
    mapped to themselves."""
    return vocab.join(components, "norm", "left").select(
        "norm", "freq", "tokens",
        F.coalesce(F.col("component"), F.col("norm")).alias("component"),
    )
