#!/usr/bin/env python
"""Standalone evaluation CLI — the engine's twin of the reference's
eval entrypoint (`eval/evaluation.py:17-45` + `eval/oie_eval/eval.py`):
a gold tuple file and a system-output tuple file in, PR metrics out.

Reference defaults reproduced exactly: gold AND predictions parsed by
the GoldReader rules (style='gold' — yes, the reference reads its own
system output with GoldReader, evaluation.py:35-36), matcher =
binary_linient_tuple_match, metrics = CaRB sweep AUC + nanargmax-F1
optimal point, printed in the reference's own format plus one JSON
line.

    python tools/oie_eval.py --gold gold.tsv --pred out.tsv
    python tools/oie_eval.py --gold gold.tsv --pred out.tsv \
        --pred-style tab --flow oie16 --matcher lexical

Flows: carb (default, multi-threshold sweep; conf≡1 degenerates to the
reference's single point), oie16 (Oie16_compare semantics incl.
prediction consumption + recallMultiplier), carb_o2o (one-to-one
recall strategy).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MATCHERS = (
    "binary_lenient", "bow", "pred", "lexical", "arg",
    "tuple", "simple_tuple", "binary_tuple", "bleu",
)


def _matcher(name: str):
    from openie_spark.eval import matcher as m

    return {
        "binary_lenient": m.binary_lenient_match,
        "bow": m.bow_match,
        "pred": m.pred_match,
        "lexical": m.lexical_match,
        "arg": m.arg_match,
        "tuple": m.tuple_match,
        "simple_tuple": m.simple_tuple_match,
        "binary_tuple": m.binary_tuple_match,
        "bleu": m.bleu_match,
    }[name]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gold", required=True)
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gold-style", default="gold",
                    choices=["gold", "carb", "tab", "benchmark"])
    ap.add_argument("--pred-style", default="gold",
                    choices=["gold", "carb", "tab", "benchmark"],
                    help="reference default: GoldReader parses the "
                         "system output too (evaluation.py:35-36); "
                         "use 'tab' for confidence-carrying output")
    ap.add_argument("--flow", default="carb",
                    choices=["carb", "carb_o2o", "oie16"])
    ap.add_argument("--matcher", default="binary_lenient", choices=MATCHERS)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from openie_spark.session import get_spark
    from openie_spark.sources.conll import read_tuple_file

    spark = get_spark(app_name="oie-eval",
                      master=args.master or "local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    gold = read_tuple_file(spark, args.gold, style=args.gold_style) \
        .select("sent", "pred", "args")
    pred = read_tuple_file(spark, args.pred, style=args.pred_style) \
        .select("sent", "pred", "args", "confidence")

    if args.flow == "oie16":
        from openie_spark.eval.benchmark import oie16_compare

        out = oie16_compare(gold, pred, match_fn=_matcher(args.matcher))
        auc = out["auc"]
        p, r, f1 = out["optimal"]
    else:
        from openie_spark.eval.carb import carb_pr_curve, carb_sweep_summary

        if args.matcher != "binary_lenient":
            raise SystemExit(
                "carb flows pin binary_lenient (evaluation.py:36); "
                "use --flow oie16 for alternative matchers")
        strategy = "o2o" if args.flow == "carb_o2o" else "m2o"
        summ = carb_sweep_summary(
            carb_pr_curve(gold, pred, recall_strategy=strategy))
        auc = summ["auc"]
        p, r, f1 = (summ["optimal_precision"], summ["optimal_recall"],
                    summ["optimal_f1"])

    # the reference's own print format (evaluation.py:44) + one JSON line
    print(f"AUC:{auc:.5f}, P:{p:.5f}, R:{r:.5f}, F1:{f1:.5f}")
    print(json.dumps({"auc": auc, "precision": p, "recall": r, "f1": f1,
                      "flow": args.flow, "matcher": args.matcher},
                     sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
