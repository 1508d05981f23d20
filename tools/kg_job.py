#!/usr/bin/env python
"""spark-submit entrypoint for the KG-construction pipeline.

Cluster usage (north_rule contract):

    zip -r kgpipe.zip openie_spark
    spark-submit --py-files kgpipe.zip tools/kg_job.py \
        --input  <transcripts dir / Iceberg table path> \
        --output <warehouse dir> [--backend rule|neural] \
        [--pair-mode exact|minhash] [--no-resume]

Local usage (also how the scaling bench invokes it):

    python tools/kg_job.py --input /root/testdata/sf0.01 --output /tmp/kg \
        --master "local[8]"

Prints the pipeline summary (stage rows/seconds, triples/sec) as one
JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    # 'rule' default: measured end-to-end it beats the Arrow-fused
    # backend at every parallelism level tried (local[2]/[8]/[32]) —
    # the fused kernel's per-turn core-time win is eaten by Arrow
    # serialization + python-worker contention (see BENCH/BASELINE.md).
    ap.add_argument("--backend", default="rule",
                    choices=["rule", "rule_arrow", "neural", "neural_staged", "neural_fused"])
    ap.add_argument("--pair-mode", default="exact", choices=["exact", "minhash"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--analytics", action="store_true",
                    help="Also materialize stage-I graph analytics tables "
                         "(pagerank, triangles, khop, harmonic, "
                         "seed_distances, communities, kcore, "
                         "degree_hist) with manifests.")
    ap.add_argument("--export", action="store_true",
                    help="Also materialize consumer-facing sinks: temporal "
                         "relation intervals and the N-Triples table.")
    ap.add_argument("--enrich", action="store_true",
                    help="Also materialize stage-I+ enrichment tables: "
                         "entity types, relation schema signatures, "
                         "per-conversation salience, coref-recovered "
                         "edges, topic segments, entity timelines, "
                         "link-prediction splits, extraction yield.")
    ap.add_argument("--prior", default=None,
                    help="Incremental mode: merge --input (NEW conv_ids "
                         "only) into the completed pipeline output at this "
                         "dir (kg/incremental.py); the output dir is "
                         "self-contained and chains as the next --prior.")
    ap.add_argument("--master", default=None,
                    help="Override master (local runs). Under spark-submit leave unset.")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--driver-memory",
                    default=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
                    help="Heap for local-mode runs (local = all tasks share "
                         "the driver JVM). Ignored under spark-submit --deploy-mode cluster.")
    ap.add_argument("--max-cores", type=int, default=None,
                    help="spark.cores.max — with a standalone master and "
                         "--executor-cores C this fixes the executor count at "
                         "max_cores/C (the N vs 4N lever).")
    ap.add_argument("--executor-cores", type=int, default=8)
    ap.add_argument("--executor-memory", default="16g")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("openie-kg-job")
               .config("spark.driver.memory", args.driver_memory))
    if args.max_cores:
        builder = (builder
                   .config("spark.cores.max", str(args.max_cores))
                   .config("spark.executor.cores", str(args.executor_cores))
                   .config("spark.executor.memory", args.executor_memory))
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }.items():
        spark.conf.set(k, v)
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark.sparkContext.setLogLevel("ERROR")

    from openie_spark.pipeline import KGPipeline

    if "://" not in args.output:        # remote warehouse paths are
        os.makedirs(args.output, exist_ok=True)  # created by the FS writers
    pipe = KGPipeline(spark, args.input, args.output,
                      backend=args.backend, pair_mode=args.pair_mode,
                      analytics=args.analytics, export=args.export,
                      enrich=args.enrich)
    if args.prior:
        summary = pipe.run_incremental(prior_dir=args.prior,
                                       resume=not args.no_resume)
    else:
        summary = pipe.run(resume=not args.no_resume)
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
