"""CaRB scorer tests (E1/E3/E4/E5/E6) — unit cases pinning the
reference quirks, plus a randomized parity sweep against the actual
reference matcher (imported with stubbed heavy deps; skipped when
/root/reference is absent)."""

from __future__ import annotations

import os
import random
import sys
import types

import pytest

from openie_spark.eval.carb import normalize_key
from openie_spark.eval.matcher import binary_lenient_match, lenient_match

REF = "/root/reference"


# ------------------------------------------------------------------ E3

def test_multiset_consumption():
    # two gold "the" but only one predicted "the": only one match
    s = lenient_match("ran", [], "ran", [])
    assert s == [1.0, 1.0]
    s = lenient_match("the the ran", [], "the ran", [])
    assert s == [2 / 2, 2 / 3]


def test_be_form_equivalence():
    # predicted literal "be" matches any gold be-form (matcher.py:177-184)
    s = lenient_match("was", [], "be", [])
    assert s == [1.0, 1.0]
    # but not the other way round: predicted "was" vs gold "be"
    s = lenient_match("be", [], "was", [])
    assert s == [0.0, 0.0]


def test_zero_predicate_gate():
    assert lenient_match("ran", ["x"], "jumped", ["x"]) == [0.0, 0.0]


def test_missing_arg_gates():
    # missing predicted arg at i<2 → [0,0]
    assert lenient_match("is", ["a", "b"], "is", ["a"]) == [0.0, 0.0]
    # missing predicted arg at i≥2 → skipped, gold tokens still in recall denom
    p, r = lenient_match("is", ["a", "b", "c"], "is", ["a", "b"])
    assert p == 1.0 and r == pytest.approx(3 / 4)


def test_said_reversal():
    # gold pred contains "said" → reversed predicted args may win
    straight = binary_lenient_match("said", ["John", "hello"], "said", ["hello", "John"])
    assert straight[0] == 1.0
    # without a said-verb the reversal must NOT be tried
    crossed = binary_lenient_match("is", ["John", "tall"], "is", ["tall", "John"])
    assert crossed[0] < 1.0


def test_said_substring_containment():
    # "said" matches as a SUBSTRING of the gold predicate (matcher.py:306-311)
    s = binary_lenient_match("once said loudly", ["a", "b"], "once said loudly", ["b", "a"])
    assert s == [1.0, 1.0]


# ------------------------------------------------------------------ E1

def test_normalize_key():
    assert normalize_key("John -LRB- the baker -RRB- ran .") == "JohnthebakerranX".replace("X", "")
    assert normalize_key("a , b") == "ab"
    assert normalize_key("don 't stop") == "dontstop"


# -------------------------------------------------------- binarize

def test_binarize_quirks(spark):
    """K-ary binarize (carb.py:192-217) including the aliasing quirk:
    one mutated object re-appended means every row of a >2-ary
    extraction reflects the LAST extra arg."""
    from openie_spark.eval.carb import binarize_tuples

    rows = [
        ("s1", "rel", ["a0", "a1"]),                      # ≤2-ary: unchanged
        ("s2", "rel", ["a0"]),
        ("s3", "rel", ["a0", "a1", "in paris"]),          # prep hoisted
        ("s4", "rel", ["a0", "a1", "x y", "of z"]),       # 3 aliased copies
    ]
    df = spark.createDataFrame(rows, "sent string, pred string, args array<string>")
    got = {}
    for r in binarize_tuples(df).collect():
        got.setdefault(r.sent, []).append((r.pred, tuple(r.args)))
    assert got["s1"] == [("rel", ("a0", "a1"))]
    assert got["s2"] == [("rel", ("a0",))]
    assert sorted(got["s3"]) == [("rel a1 in", ("a0", "paris"))] * 2
    assert sorted(got["s4"]) == [("rel a1 of", ("a0", "z"))] * 3


def test_binary_compare_self_is_perfect(spark):
    from openie_spark.eval.carb import carb_compare

    g = spark.createDataFrame(
        [("A is B in C .", "is", ["A", "B", "in C"]),
         ("D said E .", "said", ["D", "E"])],
        "sent string, pred string, args array<string>")
    row = carb_compare(g, g, binary=True).collect()[0]
    assert row.precision == 1.0 and row.recall == 1.0


# ------------------------------------------------- reference parity

def _load_reference_matcher():
    """Import the reference Matcher with its unused heavy deps stubbed."""
    for name in ("ipdb",):
        sys.modules.setdefault(name, types.ModuleType(name))
    nltk = types.ModuleType("nltk")
    translate = types.ModuleType("nltk.translate")
    bleu = types.ModuleType("nltk.translate.bleu_score")
    bleu.sentence_bleu = None
    nltk.translate = translate
    translate.bleu_score = bleu
    sys.modules.setdefault("nltk", nltk)
    sys.modules.setdefault("nltk.translate", translate)
    sys.modules.setdefault("nltk.translate.bleu_score", bleu)
    sys.path.insert(0, os.path.join(REF, "eval", "oie_eval"))
    import importlib

    return importlib.import_module("matcher").Matcher


class _Ex:
    def __init__(self, pred, args):
        self.pred = pred
        self.args = list(args)

    def elementToStr(self, elem):
        return str(elem)

    def bow(self):
        return " ".join([self.elementToStr(x) for x in [self.pred] + self.args])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_matcher_parity_randomized():
    Matcher = _load_reference_matcher()
    rng = random.Random(42)
    vocab = ["John", "Mary", "the", "a", "ran", "said", "told", "be", "is",
             "was", "tall", "baker", "hello", "quickly", "to", "London"]

    def rand_tuple():
        pred = " ".join(rng.choices(vocab, k=rng.randint(0, 3)))
        args = [" ".join(rng.choices(vocab, k=rng.randint(1, 4)))
                for _ in range(rng.randint(0, 4))]
        return pred, args

    n_diff = 0
    for _ in range(500):
        gp, ga = rand_tuple()
        ep, ea = rand_tuple()
        want = Matcher.binary_linient_tuple_match(
            _Ex(gp, ga), _Ex(ep, ea), ignoreStopwords=True, ignoreCase=True)
        got = binary_lenient_match(gp, ga, ep, ea)
        assert [round(x, 9) for x in got] == [round(x, 9) for x in list(want)], (
            f"gold=({gp!r},{ga!r}) pred=({ep!r},{ea!r})")
        n_diff += got != [0.0, 0.0]
    assert n_diff > 20  # the sweep must exercise non-trivial matches


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_alt_matchers_parity_randomized():
    """E7 alternative scorers vs the reference Matcher (bleuMatch
    excluded — nltk absent and unreachable from the default path).
    Gate-returns normalized: the reference's False ≡ [0, 0] here."""
    from openie_spark.eval.matcher import (
        arg_match,
        binary_tuple_match,
        bow_match,
        lexical_match,
        pred_match,
        simple_tuple_match,
        tuple_match,
    )

    Matcher = _load_reference_matcher()
    rng = random.Random(7)
    vocab = ["John", "Mary", "the", "of", "is", "ran", "said", "be", "was",
             "tall", "baker", "hello", "to", "London", "x"]

    def rand_tuple():
        pred = " ".join(rng.choices(vocab, k=rng.randint(0, 3)))
        args = [" ".join(rng.choices(vocab, k=rng.randint(1, 3)))
                for _ in range(rng.randint(0, 4))]
        return pred, args

    pairs = [
        ("bowMatch", bow_match), ("predMatch", pred_match),
        ("lexicalMatch", lexical_match), ("argMatch", arg_match),
        ("tuple_match", tuple_match), ("simple_tuple_match", simple_tuple_match),
        ("binary_tuple_match", binary_tuple_match),
    ]
    n_checked = {name: 0 for name, _ in pairs}
    for _ in range(400):
        gp, ga = rand_tuple()
        ep, ea = rand_tuple()
        for name, ours in pairs:
            ref_fn = getattr(Matcher, name)
            try:
                want = ref_fn(_Ex(gp, ga), _Ex(ep, ea),
                              ignoreStopwords=True, ignoreCase=True)
            except (ZeroDivisionError, IndexError):
                continue    # reference crashes on empty spans; skip case
            got = ours(gp, ga, ep, ea)
            if isinstance(got, bool):
                assert got == want, (name, gp, ga, ep, ea)
            else:
                if want is False:       # tuple_match-family gate returns
                    want = [0, 0]       # False; ours normalizes to [0,0]
                assert [round(x, 9) for x in got] == [round(x, 9) for x in list(want)], (
                    name, gp, ga, ep, ea)
            n_checked[name] += 1
    assert all(v > 100 for v in n_checked.values()), n_checked


def test_bleu_match_hand_values():
    """bleuMatch (matcher.py:73-78): nltk is absent, so _sentence_bleu
    is our from-scratch transcription of the public algorithm — pinned
    here against hand-computed exact values."""
    import math

    from openie_spark.eval.matcher import _sentence_bleu, bleu_match

    toks = list("abcdefgh")
    # identical -> every p_n = 1, bp = 1
    assert _sentence_bleu(toks, toks) == 1.0
    # one substituted token out of 8: p = 7/8 * 6/7 * 5/6 * 4/5 = 1/2
    got = _sentence_bleu(toks, list("abcdefgX"))
    assert abs(got - 0.5 ** 0.25) < 1e-12
    # exact 4-token prefix of an 8-token ref: precisions 1, bp = e^-1
    assert abs(_sentence_bleu(toks, list("abcd")) - math.exp(-1)) < 1e-12
    # no unigram overlap -> exactly 0
    assert _sentence_bleu(toks, list("XYZW")) == 0.0
    # overlap but no common 4-gram -> method0 crushes the geo-mean
    assert _sentence_bleu(list("abcd"), list("abcX")) < 1e-60

    # threshold is strict > 0.4: the e^-1 ≈ 0.368 brevity case fails,
    # a 5-token prefix (bp = e^-0.6 ≈ 0.549) passes
    assert not bleu_match("a b c d", ["e f g h"], "a b", ["c d"])
    assert bleu_match("a b c", ["d e f g h"], "a b c", ["d e"])
    # identity always matches
    assert bleu_match("ran", ["John", "to London"], "ran", ["John", "to London"])


def test_bleu_match_in_oie16_compare(spark):
    """bleu_match plugs into the Oie16 compare flow as a boolean
    matcher: self-comparison is perfect."""
    from openie_spark.eval.benchmark import oie16_compare
    from openie_spark.eval.matcher import bleu_match

    from pyspark.sql import functions as F

    g = spark.createDataFrame(
        [("A is B today .", "is", ["A big red thing", "B today"]),
         ("C ran very fast .", "ran", ["C or so", "very very fast"])],
        "sent string, pred string, args array<string>")
    p = g.select("*", F.lit(1.0).alias("confidence"))
    out = oie16_compare(g, p, match_fn=bleu_match)
    assert out["optimal"][0] == 1.0 and out["optimal"][1] == 1.0


def test_alt_matcher_in_scorer(spark):
    """E7 matchers plug into the cogrouped scorer via match_fn."""
    from openie_spark.eval.carb import carb_compare
    from openie_spark.eval.matcher import tuple_match

    g = spark.createDataFrame(
        [("A is B .", "is", ["A", "B"]), ("C ran fast .", "ran", ["C", "fast"])],
        "sent string, pred string, args array<string>")
    row = carb_compare(g, g, match_fn=tuple_match).collect()[0]
    assert row.precision == 1.0 and row.recall == 1.0


# ------------------------------------------------------------- Spark

def test_carb_self_score_is_perfect(spark):
    """Engine triples scored against themselves ⇒ P = R = F1 = 1
    (the ≥0.95 parity gate is tautologically met on identical outputs;
    SURVEY.md §5 'identical model weights ⇒ identical triples')."""
    from openie_spark.eval.carb import carb_compare, triples_as_tuples
    from openie_spark.operators.extract import extract_triples

    rows = [
        ("c0", 0, "u", "John is a teacher .", None),
        ("c0", 1, "a", "Mary wrote three books . They sold well .", None),
        ("c1", 0, "u", "Rome was not built in a day .", None),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    triples = triples_as_tuples(extract_triples(t))
    row = carb_compare(triples, triples).collect()[0]
    assert row.precision == 1.0 and row.recall == 1.0 and row.f1 == 1.0
    assert row.n_gold_sents > 0


def test_carb_degraded_predictions(spark):
    """Dropping every prediction's second arg must cost recall but keep
    the scorer finite and deterministic."""
    from pyspark.sql import functions as F

    from openie_spark.eval.carb import carb_compare, triples_as_tuples
    from openie_spark.operators.extract import extract_triples

    rows = [
        ("c0", 0, "u", "John is a teacher .", None),
        ("c1", 0, "u", "Mary wrote three books about Rome .", None),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    gold = triples_as_tuples(extract_triples(t))
    # keep the arg arity (dropping an arg at i<2 gates the pair to
    # [0,0], matcher.py:196-198) but truncate every arg to its first
    # token → precision stays 1, recall drops below 1.
    pred = gold.withColumn("args", F.transform("args", lambda a: F.split(a, " ")[0]))
    row = carb_compare(gold, pred).collect()[0]
    assert row.precision == 1.0
    assert 0 < row.recall < 1
    assert row.f1 <= 1.0

    # value-assert against the transcribed reference loop (the driver's
    # carb_score_degraded row has no SQL oracle — this is its pin)
    g_rows = [(r.sent, r.pred, list(r.args)) for r in gold.collect()]
    p_rows = [(r.sent, r.pred, list(r.args)) for r in pred.collect()]
    g_dict, p_dict = {}, {}
    for s, pr, ar in g_rows:
        g_dict.setdefault(normalize_key(s), []).append((pr, ar, 1.0))
    for s, pr, ar in p_rows:
        p_dict.setdefault(normalize_key(s), []).append((pr, ar, 1.0))
    _, want_p, want_r = _reference_sweep(g_dict, p_dict)
    assert row.precision == round(want_p[0], 6)
    assert row.recall == pytest.approx(want_r[0], abs=1e-6)


def _reference_sweep(gold, pred):
    """Direct transcription of the reference PR sweep
    (/root/reference/eval/oie_eval/carb.py:77-163) over in-memory
    dicts: key -> [(pred, args, confidence)]. Used as the independent
    golden for carb_pr_curve (duplicate confidences iterated exactly as
    the reference does — they fall into empty slices)."""
    conf_thresholds = sorted({c for exts in pred.values() for (_, _, c) in exts})
    num = len(conf_thresholds)
    p = [0.0] * num
    pl = [0] * num
    r = [0.0] * num
    rl = [0] * num
    for sent, gold_ex in gold.items():
        pred_ex = pred.get(sent, [])
        scores = [
            [binary_lenient_match(gp, list(ga), ep, list(ea)) for ep, ea, _ in pred_ex]
            for gp, ga, _ in gold_ex
        ]
        sent_confs = sorted(c for _, _, c in pred_ex)
        prev_c = 0
        for conf in sent_confs:
            c = conf_thresholds.index(conf)
            ext = [j for j, (_, _, cf) in enumerate(pred_ex) if cf >= conf]
            rec_num = sum(max([row[j][1] for j in ext], default=0) for row in scores)
            prec_num = 0.0
            sel_rows, sel_cols = [], []
            for _ in range(min(len(scores), len(ext))):
                m_p, m_i, m_j = -1.0, -1, -1
                for i in range(len(scores)):
                    if i in sel_rows:
                        continue
                    for j in ext:
                        if j in sel_cols:
                            continue
                        if scores[i][j][0] > m_p:
                            m_p, m_i, m_j = scores[i][j][0], i, j
                sel_rows.append(m_i)
                sel_cols.append(m_j)
                prec_num += m_p
            for t in range(prev_c, c + 1):
                p[t] += prec_num
                pl[t] += len(ext)
                r[t] += rec_num
                rl[t] += len(scores)
            prev_c = c + 1
        for t in range(prev_c, num):
            rl[t] += len(scores)
    prec = [a / b if b > 0 else 1 for a, b in zip(p, pl)]
    rec = [a / b if b > 0 else 0 for a, b in zip(r, rl)]
    return conf_thresholds, prec, rec


def test_pr_curve_matches_reference_sweep(spark):
    """E5 full threshold sweep vs the transcribed reference loop on
    varied-confidence predictions with partial matches, a gold-only
    sentence, and a pred-only sentence."""
    from openie_spark.eval.carb import carb_pr_curve, carb_sweep_summary

    gold_rows = [
        ("A is B .", "is", ["A", "B"]),
        ("A is B .", "is", ["A", "B C"]),
        ("C was D .", "was", ["C", "D"]),
        ("E is F .", "is", ["E", "F"]),          # gold-only sentence
        ("G said H .", "said", ["G", "H"]),
    ]
    pred_rows = [
        ("A is B .", "is", ["A", "B"], 0.9),
        ("A is B .", "is", ["A", "wrong"], 0.3),
        ("C was D .", "was", ["C", "D extra"], 0.6),
        ("G said H .", "said", ["H", "G"], 0.3),  # reversed, said-rule
        ("Z is Q .", "is", ["Z", "Q"], 0.9),      # pred-only sentence
    ]
    gold = spark.createDataFrame(gold_rows, "sent string, pred string, args array<string>")
    pred = spark.createDataFrame(pred_rows, "sent string, pred string, args array<string>, confidence double")

    g_dict, p_dict = {}, {}
    for s, pr, ar in gold_rows:
        g_dict.setdefault(normalize_key(s), []).append((pr, ar, 1.0))
    for s, pr, ar, cf in pred_rows:
        p_dict.setdefault(normalize_key(s), []).append((pr, ar, cf))
    confs, want_p, want_r = _reference_sweep(g_dict, p_dict)

    got = sorted(carb_pr_curve(gold, pred).collect(), key=lambda r: r.t)
    assert [r.conf for r in got] == confs
    assert [r.precision for r in got] == [round(x, 6) for x in want_p]
    assert [r.recall for r in got] == [round(x, 6) for x in want_r]
    # curve must be non-trivial: recall strictly drops at the top
    # threshold, precision varies across thresholds
    assert got[0].recall > got[-1].recall
    summary = carb_sweep_summary(carb_pr_curve(gold, pred))
    assert 0 < summary["auc"] <= 1
    assert summary["optimal_f1"] == max(r.f1 for r in got)


def test_tab_reader_feeds_pr_sweep(spark, tmp_path):
    """End-to-end user path: a tab-format system output (S7 reader,
    real confidences) scored against a gold-format file through the
    full E5 sweep — the round-1 gap (scorer could only do conf≡1)."""
    from openie_spark.eval.carb import carb_pr_curve
    from openie_spark.sources.conll import read_tuple_file

    gold_path = tmp_path / "gold.tsv"
    gold_path.write_text(
        "A is B .\tis\tA\tB\n"
        "A is B .\tis\tA\tB C\n"
        "C was D .\twas\tC\tD\n"
        "E is F .\tis\tE\tF\n")
    tab_path = tmp_path / "sys.tsv"
    tab_path.write_text(
        "A is B .\t0.9\tis\tA\tB\n"
        "A is B .\t0.3\tis\tA\twrong\n"
        "C was D .\t0.6\twas\tC\tD extra\n")
    gold = read_tuple_file(spark, str(gold_path), style="gold")
    pred = read_tuple_file(spark, str(tab_path), style="tab")
    curve = sorted(
        carb_pr_curve(gold.select("sent", "pred", "args"),
                      pred.select("sent", "pred", "args", "confidence")).collect(),
        key=lambda r: r.t)

    g_dict, p_dict = {}, {}
    for r in gold.collect():
        g_dict.setdefault(normalize_key(r.sent), []).append((r.pred, list(r.args), 1.0))
    for r in pred.collect():
        p_dict.setdefault(normalize_key(r.sent), []).append(
            (r.pred, list(r.args), r.confidence))
    confs, want_p, want_r = _reference_sweep(g_dict, p_dict)
    assert [r.conf for r in curve] == confs == [0.3, 0.6, 0.9]
    assert [r.precision for r in curve] == [round(x, 6) for x in want_p]
    assert [r.recall for r in curve] == [round(x, 6) for x in want_r]


def test_pr_curve_single_confidence_degenerates_to_point(spark):
    """conf≡1 predictions: the sweep's one point must equal the
    single-point scorer (the reference-parity path)."""
    from pyspark.sql import functions as F

    from openie_spark.eval.carb import carb_compare, carb_pr_curve

    gold = spark.createDataFrame(
        [("A is B .", "is", ["A", "B"]), ("C is D .", "is", ["C", "D"])],
        "sent string, pred string, args array<string>")
    pred = spark.createDataFrame(
        [("A is B .", "is", ["A", "B"])],
        "sent string, pred string, args array<string>")
    curve = carb_pr_curve(gold, pred.withColumn("confidence", F.lit(1.0))).collect()
    point = carb_compare(gold, pred).collect()[0]
    assert len(curve) == 1
    assert curve[0].precision == point.precision
    assert curve[0].recall == point.recall
    assert curve[0].f1 == point.f1


def test_carb_gold_only_and_pred_only_sentences(spark):
    """Gold-only sentences inflate the recall denominator; pred-only
    sentences are ignored (carb.py:92-97,159-160)."""
    from openie_spark.eval.carb import carb_compare

    gold = spark.createDataFrame(
        [("A is B .", "is", ["A", "B"]), ("C is D .", "is", ["C", "D"])],
        "sent string, pred string, args array<string>")
    pred = spark.createDataFrame(
        [("A is B .", "is", ["A", "B"]), ("Z is Q .", "is", ["Z", "Q"])],
        "sent string, pred string, args array<string>")
    row = carb_compare(gold, pred).collect()[0]
    # recall: sentence1 full match (3 tokens), sentence2 zero → 0.5
    assert row.recall == pytest.approx(0.5)
    # precision: only the gold-matched sentence's predictions count
    assert row.precision == 1.0

def test_pr_curve_rejects_null_and_nan_confidence(spark):
    """A single malformed 'tab' line (NULL confidence) or a NaN must
    fail fast with a clear error, not a worker KeyError/TypeError."""
    from openie_spark.eval.carb import carb_pr_curve

    gold = spark.createDataFrame(
        [("A is B .", "is", ["A", "B"])],
        "sent string, pred string, args array<string>")
    for bad in (None, float("nan")):
        pred = spark.createDataFrame(
            [("A is B .", "is", ["A", "B"], 0.9),
             ("A is B .", "is", ["A", "B"], bad)],
            "sent string, pred string, args array<string>, confidence double")
        with pytest.raises(ValueError, match="NULL/NaN confidence"):
            carb_pr_curve(gold, pred).collect()


def test_pr_curve_bounded_thresholds_at_1e5_distinct_confs(spark):
    """~10^5 globally-distinct confidences: the sweep must complete
    with a threshold table bounded by max_thresholds (quantized grid),
    and the quantized curve must agree with the reference transcription
    run on the SAME snapped confidences (the documented deviation is
    the snap, not the sweep semantics)."""
    import bisect

    from pyspark.sql import functions as F

    from openie_spark.eval.carb import carb_pr_curve

    n_sent, per_sent = 2500, 40  # 100_000 distinct confidences
    gold_rows, pred_rows = [], []
    for s in range(n_sent):
        sent = f"Entity{s} likes Object{s} ."
        gold_rows.append((sent, "likes", [f"Entity{s}", f"Object{s}"]))
        for j in range(per_sent):
            conf = (s * per_sent + j + 1) / (n_sent * per_sent + 1)
            arg2 = f"Object{s}" if j % 3 == 0 else f"Wrong{j}"
            pred_rows.append((sent, "likes", [f"Entity{s}", arg2], conf))
    gold = spark.createDataFrame(
        gold_rows, "sent string, pred string, args array<string>")
    pred = spark.createDataFrame(
        pred_rows, "sent string, pred string, args array<string>, confidence double")

    K = 64  # small grid so the test is fast; default is 1024
    curve = sorted(carb_pr_curve(gold, pred, max_thresholds=K).collect(),
                   key=lambda r: r.t)
    assert 0 < len(curve) <= K + 1  # +1: global min unioned into the grid
    grid = [r.conf for r in curve]
    assert grid == sorted(set(grid))
    # min confidence is always on the grid (floor-snap never underflows)
    assert grid[0] <= min(c for *_, c in pred_rows)

    # independent check: reference transcription on snapped confidences
    g_dict, p_dict = {}, {}
    for s, pr, ar in gold_rows:
        g_dict.setdefault(normalize_key(s), []).append((pr, ar, 1.0))
    for s, pr, ar, cf in pred_rows:
        snapped = grid[max(bisect.bisect_right(grid, cf) - 1, 0)]
        p_dict.setdefault(normalize_key(s), []).append((pr, ar, snapped))
    confs, want_p, want_r = _reference_sweep(g_dict, p_dict)
    assert [r.conf for r in curve] == confs
    assert [r.precision for r in curve] == [round(x, 6) for x in want_p]
    assert [r.recall for r in curve] == [round(x, 6) for x in want_r]


def test_tokenized_matcher_parity_randomized():
    """The pre-tokenized fast path (pre_gold/pre_pred +
    binary_lenient_match_tokens) must reproduce binary_lenient_match
    exactly — including said-reversal, be-forms, missing-arg gates,
    multi-space and empty parts."""
    import random

    from openie_spark.eval.matcher import (
        binary_lenient_match,
        binary_lenient_match_tokens,
        pre_gold,
        pre_pred,
    )

    rng = random.Random(42)
    vocab = ["the", "cat", "be", "said", "ran", "on", "", "  ", "mat dog",
             "is", "was", "john told reporters"]

    def mk():
        pred = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
        args = [" ".join(rng.choices(vocab, k=rng.randint(0, 3)))
                for _ in range(rng.randint(0, 4))]
        return pred, args

    for _ in range(3000):
        gp, ga = mk()
        ep, ea = mk()
        want = binary_lenient_match(gp, list(ga), ep, list(ea))
        got = binary_lenient_match_tokens(pre_gold(gp, ga), pre_pred(ep, ea))
        assert got == want, (gp, ga, ep, ea, got, want)


def test_carb_prekeyed_inputs_match_unkeyed(spark):
    """The pre-keyed/pre-partitioned eval-input path (_with_key reusing
    an existing norm_key, the __spark_entry__ carb memo shape) is
    row-identical to handing the scorer raw (sent, pred, args) frames."""
    from pyspark.sql import functions as F

    from openie_spark.eval.carb import carb_compare, normalize_key_col

    rows = [
        ("The cat (old) sat.", "sat", ["The cat", "on the mat"]),
        ("The cat (old) sat.", "lay", ["A dog", "yesterday"]),
        ("Dogs -LRB-two-RRB- ran fast.", "ran", ["Dogs", "fast"]),
    ]
    gold = spark.createDataFrame(
        rows, "sent string, pred string, args array<string>")
    pred = gold.withColumn(
        "args", F.transform("args", lambda a: F.split(a, " ")[0]))

    direct = carb_compare(gold, pred).collect()
    keyed_gold = (gold.withColumn("norm_key", normalize_key_col(F.col("sent")))
                  .repartition(4, "norm_key").persist())
    keyed_pred = (pred.withColumn("norm_key", normalize_key_col(F.col("sent")))
                  .repartition(4, "norm_key").persist())
    keyed = carb_compare(keyed_gold, keyed_pred).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in keyed]
