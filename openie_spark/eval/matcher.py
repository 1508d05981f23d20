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


# ------------------------------------------------- pre-tokenized twins
# The cogrouped scorer calls binary_lenient_match O(n_gold x n_pred)
# times per sentence; the string contract re-splits every part on
# every call (~60% of the kernel's python time). These twins take
# tokens pre-split ONCE per extraction; parity with the string
# functions is randomized-pinned in tests/test_carb.py.


def pre_gold(pred: str, args: list[str]) -> tuple:
    """(pred_tokens, binarized-arg token lists, said?) for a gold
    extraction — split once, reused across all predicted pairs."""
    return (
        pred.split(),
        [a.split() for a in _binarize(args)],
        any(v in pred for v in SAID_PREDS),
    )


def pre_pred(pred: str, args: list[str]) -> tuple:
    """(pred_tokens, straight binarized parts, reversed parts) for a
    predicted extraction. The reversed parts mirror
    binary_lenient_match's [' '.join(args[1:]), args[0]] rebuild —
    join-then-split equals token concatenation."""
    p_toks = pred.split()
    straight = [a.split() for a in _binarize(args)]
    if len(args) >= 2:
        rest = [t for a in args[1:] for t in a.split()]
        rev = [rest, args[0].split()]
    else:
        rev = [a.split() for a in args]
    return (p_toks, straight, rev)


def lenient_match_tokens(gold_pred_toks: list[str],
                         gold_arg_toks: list[list[str]],
                         ex_pred_toks: list[str],
                         ex_arg_toks: list[list[str]]) -> Score:
    """lenient_match over pre-split tokens (gold lists are only read;
    predicted lists are copied before the consuming overlap)."""
    pred_toks = list(ex_pred_toks)
    p_num = r_num = 0
    p_den = len(pred_toks)
    r_den = len(gold_pred_toks)

    matched = _consume_overlap(gold_pred_toks, pred_toks)
    if "be" in pred_toks:
        for form in BE_FORMS:
            if form in gold_pred_toks:
                matched += 1
                pred_toks.remove("be")
                break
    if matched == 0:
        return [0.0, 0.0]
    p_num += matched
    r_num += matched

    for i, g in enumerate(gold_arg_toks):
        r_den += len(g)
        if len(ex_arg_toks) <= i:
            if i < 2:
                return [0.0, 0.0]
            continue
        e = list(ex_arg_toks[i])
        p_den += len(e)
        m = _consume_overlap(g, e)
        p_num += m
        r_num += m

    prec = p_num / p_den if p_den else 0.0
    rec = r_num / r_den if r_den else 0.0
    return [prec, rec]


def binary_lenient_match_tokens(gold_pre: tuple, pred_pre: tuple) -> Score:
    """binary_lenient_match over pre_gold/pre_pred tuples."""
    g_pred, g_parts, g_said = gold_pre
    e_pred, e_straight, e_rev = pred_pre
    straight = lenient_match_tokens(g_pred, g_parts, e_pred, e_straight)
    if not g_said:
        return straight
    reverse = lenient_match_tokens(g_pred, g_parts, e_pred, e_rev)
    return max(straight, reverse)


# -------------------------------------------------------------- E7
# Alternative scorers (CLI-flag matchers, matcher.py:10-100,103-157,
# 228-339). The boolean family (bow/pred/lexical/arg) is usable
# standalone; only [p, r]-returning matchers plug into the cogrouped
# scorer (the reference's compare subscripts score[0]/score[1] and
# would itself crash on the boolean ones). All quirks preserved —
# including lexicalMatch's product double-count and argMatch's
# CHARACTER-pair counting. bleuMatch ships as a from-scratch
# transcription of the public BLEU algorithm (nltk absent here — see
# bleu_match's docstring for the exact semantics pinned).

MATCH_STOPWORDS = ("of", "is")          # matcher.py:349
LEXICAL_THRESHOLD = 0.5                 # matcher.py:347


def _bow(pred: str, args: list[str]) -> str:
    # extraction.bow() ≙ ' '.join([pred] + args) (extraction.py:113-114)
    return " ".join([pred] + list(args))


def _words(s: str, ignore_stopwords: bool, ignore_case: bool) -> list[str]:
    if ignore_case:
        s = s.lower()
    ws = s.split(" ")
    if ignore_stopwords:
        ws = [w for w in ws if w.lower() not in MATCH_STOPWORDS]
    return ws


def bow_match(gold_pred: str, gold_args: list[str],
              ex_pred: str, ex_args: list[str],
              ignore_stopwords: bool = True, ignore_case: bool = True) -> bool:
    """Exact lexical bag-of-words match, order-ignored (matcher.py:10-28)."""
    s1 = _words(_bow(gold_pred, gold_args), ignore_stopwords, ignore_case)
    s2 = _words(_bow(ex_pred, ex_args), ignore_stopwords, ignore_case)
    return sorted(s1) == sorted(s2)


def pred_match(gold_pred: str, gold_args: list[str],
               ex_pred: str, ex_args: list[str],
               ignore_stopwords: bool = True, ignore_case: bool = True) -> bool:
    """Predicate token-sequence equality (matcher.py:31-48)."""
    return (_words(gold_pred, ignore_stopwords, ignore_case)
            == _words(ex_pred, ignore_stopwords, ignore_case))


BLEU_THRESHOLD = 0.4                    # matcher.py:346
_BLEU_WEIGHTS = (0.25, 0.25, 0.25, 0.25)


def _sentence_bleu(ref_toks: list[str], hyp_toks: list[str]) -> float:
    """Single-reference sentence BLEU, transcribed from the public
    algorithm (Papineni et al. 2002) with nltk's DEFAULT semantics —
    the exact call the reference makes (matcher.py:76-78), re-derived
    because nltk is absent in this sandbox:

    * modified n-gram precision for n=1..4: hypothesis n-gram counts
      clipped to the reference's, denominator max(1, n_hyp_ngrams)
      (so a 3-token hypothesis gets p4 = 0/1, not a crash);
    * no smoothing (method0): a zero UNIGRAM numerator returns 0.0;
      a zero higher-order numerator contributes sys.float_info.min,
      crushing the geometric mean to ~1e-77 — i.e. any hypothesis
      without a 4-gram overlap effectively never clears a threshold;
    * brevity penalty 1 if hyp longer, else exp(1 - ref_len/hyp_len).
    """
    import math
    import sys
    from collections import Counter

    nums, dens = [], []
    for n in range(1, 5):
        hyp = Counter(tuple(hyp_toks[i:i + n])
                      for i in range(len(hyp_toks) - n + 1))
        ref = Counter(tuple(ref_toks[i:i + n])
                      for i in range(len(ref_toks) - n + 1))
        nums.append(sum(min(c, ref.get(g, 0)) for g, c in hyp.items()))
        dens.append(max(1, sum(hyp.values())))
    if nums[0] == 0:
        return 0.0
    bp = 1.0 if len(hyp_toks) > len(ref_toks) else math.exp(
        1 - len(ref_toks) / len(hyp_toks))
    s = math.fsum(
        w * math.log(num / den if num else sys.float_info.min)
        for w, num, den in zip(_BLEU_WEIGHTS, nums, dens))
    return bp * math.exp(s)


def bleu_match(gold_pred: str, gold_args: list[str],
               ex_pred: str, ex_args: list[str],
               ignore_stopwords: bool = True, ignore_case: bool = True) -> bool:
    """BLEU(gold bow, ex bow) > 0.4 (matcher.py:73-77, threshold :346).
    Quirk preserved: the reference ACCEPTS ignoreStopwords/ignoreCase
    but never applies them — raw bow strings are compared."""
    return _sentence_bleu(
        _bow(gold_pred, gold_args).split(" "),
        _bow(ex_pred, ex_args).split(" "),
    ) > BLEU_THRESHOLD


def lexical_match(gold_pred: str, gold_args: list[str],
                  ex_pred: str, ex_args: list[str],
                  ignore_stopwords: bool = True, ignore_case: bool = True) -> bool:
    """Lexical coverage > 0.5 (matcher.py:82-100). Quirk preserved: the
    nested loop counts every (ref word, ex word) EQUAL PAIR, so a word
    appearing m times in ref and n times in ex contributes m*n."""
    s_ref = _bow(gold_pred, gold_args).split(" ")
    s_ex = _bow(ex_pred, ex_args).split(" ")
    count = sum(1 for w1 in s_ref for w2 in s_ex if w1 == w2)
    return count / len(s_ref) > LEXICAL_THRESHOLD


def arg_match(gold_pred: str, gold_args: list[str],
              ex_pred: str, ex_args: list[str],
              ignore_stopwords: bool = True, ignore_case: bool = True) -> bool:
    """Argument coverage > 0.5 (matcher.py:51-72). Quirk preserved: the
    reference iterates the joined arg STRINGS character by character —
    coverage is a character-pair product count, not word overlap."""
    s_ref = " ".join(gold_args)
    s_ex = " ".join(ex_args)
    count = sum(1 for c1 in s_ref for c2 in s_ex if c1 == c2)
    return count / len(s_ref) > LEXICAL_THRESHOLD


def tuple_match(gold_pred: str, gold_args: list[str],
                ex_pred: str, ex_args: list[str]) -> Score:
    """linient_tuple_match minus the be-form rule, with gates returning
    [0,0] where the reference returns False (matcher.py:103-157; the
    reference's compare would crash subscripting False — normalized
    here so this matcher is usable in the cogrouped scorer)."""
    p_num = p_den = r_num = r_den = 0
    pred_toks = ex_pred.split()
    gold_toks = gold_pred.split()
    p_den += len(pred_toks)
    r_den += len(gold_toks)
    matched = _consume_overlap(gold_toks, pred_toks)
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
        if m == 0 and i < 2:
            return [0.0, 0.0]
        p_num += m
        r_num += m
    return [p_num / p_den if p_den else 0.0, r_num / r_den if r_den else 0.0]


def simple_tuple_match(gold_pred: str, gold_args: list[str],
                       ex_pred: str, ex_args: list[str]) -> Score:
    """Span-wise overlap with args pre-binarized and NO zero-match
    gates; missing predicted args stop the arg loop (matcher.py:228-271).
    The reference mutates its inputs' arg lists in place — side-effect
    dropped, computation identical."""
    ga = [gold_args[0], " ".join(gold_args[1:])] if gold_args else []
    ea = [ex_args[0], " ".join(ex_args[1:])] if ex_args else []
    p_num = p_den = r_num = r_den = 0
    pred_toks = ex_pred.split()
    gold_toks = gold_pred.split()
    p_den += len(pred_toks)
    r_den += len(gold_toks)
    m = _consume_overlap(gold_toks, pred_toks)
    p_num += m
    r_num += m
    for i, garg in enumerate(ga):
        g = garg.split()
        r_den += len(g)
        if len(ea) <= i:
            break
        e = ea[i].split()
        p_den += len(e)
        m = _consume_overlap(g, e)
        p_num += m
        r_num += m
    return [p_num / p_den if p_den else 0.0, r_num / r_den if r_den else 0.0]


def binary_tuple_match(gold_pred: str, gold_args: list[str],
                       ex_pred: str, ex_args: list[str]) -> Score:
    """tuple_match over binarized args (matcher.py:326-339) — no
    said-reversal, unlike binary_lenient_match."""
    return tuple_match(gold_pred, _binarize(gold_args), ex_pred, _binarize(ex_args))
