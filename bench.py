"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Also usable for the two-parallelism scaling evidence
(BASELINE.md): SPARK_GRAFT_CPUS=8 python bench.py  vs  =32.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from openie_spark.session import get_spark

    spark = get_spark(app_name="openie-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    # warm the JVM/catalog once so per-query timings measure the plan,
    # not session startup.
    qs["transcripts_derive"](spark, sf_dir).count()

    # Warm the python worker pool the same way: per-process imports
    # (pandas/pyarrow/numpy) and the seeded model-weight build are
    # one-time per-executor-process costs that long-lived cluster
    # executors amortize over hours — without this, whichever pandas
    # query happens to run first is billed ~10s of pool spawn.
    def _warm(it):
        from openie_spark.model.weights import ARG_SEED, PRED_SEED, get_tagger

        get_tagger(PRED_SEED)
        get_tagger(ARG_SEED)
        for pdf in it:
            yield pdf

    (spark.range(cpus * 8).repartition(cpus * 8)
     .mapInPandas(_warm, "id long").write.mode("overwrite")
     .format("noop").save())

    timings: dict[str, float] = {}
    n_rows: dict[str, int] = {}
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        # noop sink forces FULL materialization of every column —
        # count() would let column pruning skip the projections.
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        n_rows[name] = df.count()

    total = round(sum(timings.values()), 4)
    triples_sec = round(n_rows.get("triples_extract", 0) / max(timings.get("triples_extract", 1e-9), 1e-9), 1)
    print(json.dumps({
        "metric": "pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": n_rows,
        "triples_per_sec": triples_sec,
        "cpus": cpus,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
