"""Skew-aware join helpers (north_rule: 'salted hash joins for skewed
head entities').

``salted_equi_join``: the classic salt pattern — the BIG (skewed,
probe) side tags each row with a deterministic salt in [0, SALT_BUCKETS)
derived from its full row key; the SMALL (build) side is replicated
once per salt. The join key becomes (key, salt), splitting any hot key
across SALT_BUCKETS shuffle partitions. Complements AQE skew-join
(which splits oversized partitions at runtime); explicit salting also
covers the case AQE can't — one key so hot it exceeds a single task's
memory even after partition splitting.

Determinism: the salt is xxhash64 of the probe row's provenance
columns, not rand() — identical input ⇒ identical partitioning ⇒
checkpoint-resume reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def salted_equi_join(big: DataFrame, small: DataFrame, key: str,
                     buckets: int = SALT_BUCKETS, how: str = "inner") -> DataFrame:
    """Equi-join big⋈small on ``key`` with the small side replicated
    over ``buckets`` salts. Output columns = big ∪ (small − key)."""
    salt_src = [F.col(c) for c in big.columns]
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(*salt_src), F.lit(buckets)).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
