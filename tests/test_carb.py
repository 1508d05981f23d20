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
