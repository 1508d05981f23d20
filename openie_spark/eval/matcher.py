"""Tuple matching functions (E3/E4) — pure Python, executed inside the
cogrouped pandas kernel (openie_spark.eval.carb).

Behavioral port of the reference's default matcher path, preserving its
quirks bit-for-bit:

* ``lenient_match`` ≙ Matcher.linient_tuple_match
  (/root/reference/eval/oie_eval/matcher.py:160-224): token-MULTISET
  overlap per part (each matched predicted token is consumed); the
  "be"-form equivalence consumes a literal predicted "be"
  (matcher.py:177-184); zero predicate matches gate the whole pair to
  [0,0] (matcher.py:187-188); a missing predicted arg at index < 2
  gates to [0,0], at index ≥ 2 it is skipped but its gold tokens still
  inflate the recall denominator (matcher.py:195-200); the
  ignoreStopwords/ignoreCase parameters are accepted and IGNORED, as in
  the reference.
* ``binary_lenient_match`` ≙ Matcher.binary_linient_tuple_match
  (matcher.py:293-323): both tuples binarized to
  [args[0], ' '.join(args[1:])] when ≥2 args; "said-type" test is
  SUBSTRING containment in the gold predicate (matcher.py:306-311);
  the reversed variant rebuilds from the ORIGINAL predicted args as
  [' '.join(args[1:]), args[0]] (matcher.py:315-319); winner =
  Python list ``max`` i.e. lexicographic (precision first, then
  recall) (matcher.py:321).
"""

from __future__ import annotations

from openie_spark.config import BE_FORMS, SAID_PREDS

Score = list[float]  # [precision_fraction, recall_fraction]


def _consume_overlap(gold_tokens: list[str], pred_tokens: list[str]) -> int:
    """Multiset overlap: for each gold token present in the (mutating)
    predicted list, count it and remove one occurrence."""
    n = 0
    for g in gold_tokens:
        if g in pred_tokens:
            n += 1
            pred_tokens.remove(g)
    return n


def lenient_match(gold_pred: str, gold_args: list[str],
                  ex_pred: str, ex_args: list[str]) -> Score:
    p_num = p_den = r_num = r_den = 0

    pred_toks = ex_pred.split()
    gold_toks = gold_pred.split()
    p_den += len(pred_toks)
    r_den += len(gold_toks)

    matched = _consume_overlap(gold_toks, pred_toks)
    if "be" in pred_toks:
        for form in BE_FORMS:
            if form in gold_toks:
                matched += 1
                pred_toks.remove("be")
                break
    if matched == 0:
        return [0.0, 0.0]
    p_num += matched
    r_num += matched

    for i, garg in enumerate(gold_args):
        g = garg.split()
        r_den += len(g)
        if len(ex_args) <= i:
            if i < 2:
                return [0.0, 0.0]
            continue
        e = ex_args[i].split()
        p_den += len(e)
        m = _consume_overlap(g, e)
        p_num += m
        r_num += m

    prec = p_num / p_den if p_den else 0.0
    rec = r_num / r_den if r_den else 0.0
    return [prec, rec]


def _binarize(args: list[str]) -> list[str]:
    return [args[0], " ".join(args[1:])] if len(args) >= 2 else list(args)


def binary_lenient_match(gold_pred: str, gold_args: list[str],
                         ex_pred: str, ex_args: list[str]) -> Score:
    straight = lenient_match(gold_pred, _binarize(gold_args), ex_pred, _binarize(ex_args))
    if not any(v in gold_pred for v in SAID_PREDS):
        return straight
    reversed_args = (
        [" ".join(ex_args[1:]), ex_args[0]] if len(ex_args) >= 2 else list(ex_args)
    )
    reverse = lenient_match(gold_pred, _binarize(gold_args), ex_pred, reversed_args)
    return max(straight, reverse)
