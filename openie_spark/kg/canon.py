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


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """pairs(a, b, …) → components(norm string, component string).

    Only vertices that appear in some pair are returned; singletons are
    their own component by definition (callers coalesce)."""
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
