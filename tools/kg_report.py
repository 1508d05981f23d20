"""One-page KG health report — the operational readout a production
run prints (or ships to a dashboard) after each construction cycle,
bundling the audit operators that already back the driver gate:

  * referential integrity (six must-be-zero publish-gate counts)
  * linking recall (minhash-LSH vs exact ground truth) + blocking skew
  * canonicalization alias profile
  * extraction yield + graph summary + growth tail
  * statement-support and degree shape
  * per-tool usage/turnaround (the agent-platform operational slice)

Usage: python tools/kg_report.py [sf_dir]   (default sf0.001)

Every number comes from the same oracle-checked operators the driver
gate runs — this tool adds presentation, not new semantics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import importlib.util

    from openie_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = get_spark(app_name="kg-report", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()

    def rows(name):
        return qs[name](spark, sf_dir).collect()

    print(f"# KG health report — {sf_dir}\n")

    print("## Graph summary")
    for r in sorted(rows("kg_summary"), key=lambda r: r.metric):
        print(f"  {r.metric:<28} {r.value}")

    print("\n## Referential integrity (publish gate: all zero)")
    bad = 0
    for r in sorted(rows("kg_integrity"), key=lambda r: r.metric):
        flag = "" if r.value == 0 else "  <-- GATE FAIL"
        bad += r.value
        print(f"  {r.metric:<28} {r.value}{flag}")

    print("\n## Linking quality")
    le = rows("kg_linking_eval")[0]
    print(f"  exact pairs                 {le.n_exact}")
    print(f"  lsh candidate pairs         {le.n_candidate}")
    print(f"  lsh recall (ppm)            {le.recall_ppm}")
    print(f"  lsh-only extras             {le.n_extra}")
    bs = rows("kg_blocking_stats")[0]
    print(f"  blocks / hot / dropped      "
          f"{bs.n_blocks} / {bs.n_hot_blocks} / {bs.n_dropped_mentions}")

    print("\n## Canonicalization (alias bins: [2^(b-1), 2^b))")
    for r in sorted(rows("kg_alias_hist"), key=lambda r: r.bin):
        print(f"  bin {r.bin:<2} entities={r.n_entities:<8} "
              f"aliases {r.min_aliases}..{r.max_aliases}")

    print("\n## Statement support")
    for r in sorted(rows("kg_support_hist"), key=lambda r: r.bin):
        print(f"  bin {r.bin:<2} statements={r.n_statements:<8} "
              f"support {r.min_support}..{r.max_support}")

    print("\n## Tool usage (agent-platform readout)")
    for r in sorted(rows("kg_tool_stats"), key=lambda r: (-r.n_calls, r.tool)):
        lat = "never followed" if r.avg_follow_min < 0 else f"{r.avg_follow_min} min avg turnaround"
        print(f"  {r.tool:<12} calls={r.n_calls:<7} convs={r.n_convs:<7} "
              f"avg {r.avg_chars} chars, {lat}")

    print("\n## Growth (last 3 observed days)")
    g = sorted(rows("kg_growth"), key=lambda r: r.day)[-3:]
    for r in g:
        print(f"  day {r.day}: +{r.new_entities} entities "
              f"+{r.new_statements} statements "
              f"(cum {r.cum_entities}/{r.cum_statements})")

    print("\n## Extraction yield (worst 3 conversations by yield)")
    y = sorted(rows("kg_yield"),
               key=lambda r: (r.triples_per_turn_ppm, r.conv_id))[:3]
    for r in y:
        print(f"  {r.conv_id}: {r.n_triples} triples / {r.n_turns} turns "
              f"({r.triples_per_turn_ppm} ppm/turn)")

    verdict = "PUBLISH OK" if bad == 0 else "PUBLISH BLOCKED"
    print(f"\n=> {verdict}")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
