"""CaRB benchmark compare as a distributed Spark job (E1, E2, E5, E6).

Dataflow (single-confidence point — our engine emits confidence = 1.0
everywhere, reference parity SURVEY.md §2.6, so the reference's
threshold sweep degenerates to one point; /root/reference/eval/oie_eval/carb.py:79-90):

    gold, pred : DataFrame[sent string, pred string, args array<string>]
      → add norm_key (E1, pure Catalyst string exprs)
      → cogroup on norm_key, per-sentence score matrix + greedy match
        (E2/E5, applyInPandas — matrices are ≤ ~10×10 per sentence)
      → global sum + driver-free final select (E6)

Scale notes: the cogroup is ONE hash-partition shuffle on the sentence
key; with 10^12 turns both sides partition-prune on the same key and
the per-group work is O(gold×pred) tiny. Sentence-key skew (dup
sentences collapse into one group, raw2col-style T10) is bounded by
dropDuplicates upstream. The reference walks a Python dict of the whole
corpus in one process (/root/reference/eval/oie_eval/carb.py:92-160).

Reference quirks preserved:
  * sentences present only in predictions are IGNORED entirely (the
    loop is over gold keys: carb.py:92-97) — cogroup emits zeros for
    pred-only groups.
  * gold sentences with no predictions only inflate the recall
    denominator (carb.py:159-160).
  * greedy precision matching scans the matrix row-major and takes the
    first strictly-greater precision, min(|gold|, |pred|) rounds
    (carb.py:128-150) — ties resolve to the earliest (gold, pred) pair.
  * P = Σp/Σpl with empty-denominator → 1; R = Σr/Σrl with → 0
    (carb.py:162-163); F1's 0/0 → 0 (carb.py:219-224); AUC appends the
    (recall=0, precision=1) point (carb.py:173-181), which for a single
    PR point is the trapezoid r·(p+1)/2.
"""

from __future__ import annotations

import string
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openie_spark.eval.matcher import binary_lenient_match

# PTB bracket escapes (/root/reference/eval/oie_eval/carb.py:291-298)
PTB_ESCAPES = (
    ("(", "-LRB-"), (")", "-RRB-"),
    ("[", "-LSB-"), ("]", "-RSB-"),
    ("{", "-LCB-"), ("}", "-RCB-"),
)


def normalize_key(sent: str) -> str:
    """E1 (python twin): despace → PTB-unescape → strip punctuation
    (/root/reference/eval/oie_eval/carb.py:263-289)."""
    s = sent.replace(" ", "")
    for plain, esc in PTB_ESCAPES:
        s = s.replace(esc, plain)
    return s.translate(str.maketrans("", "", string.punctuation))


def normalize_key_col(sent: Column) -> Column:
    """E1 as a Catalyst expression chain (codegen'd, JVM-side)."""
    c = F.replace(sent, F.lit(" "), F.lit(""))
    for plain, esc in PTB_ESCAPES:
        c = F.replace(c, F.lit(esc), F.lit(plain))
    return F.translate(c, string.punctuation, "")


_SCORE_SCHEMA = "norm_key string, p double, pl long, r double, rl long"


def _score_group(gold_pdf: pd.DataFrame, pred_pdf: pd.DataFrame) -> pd.DataFrame:
    if len(gold_pdf) == 0:
        # prediction-only sentence: contributes nothing (carb.py:92-97)
        return pd.DataFrame(columns=["norm_key", "p", "pl", "r", "rl"])
    key = gold_pdf["norm_key"].iloc[0]
    n_gold = len(gold_pdf)
    n_pred = len(pred_pdf)
    if n_pred == 0:
        return pd.DataFrame([[key, 0.0, 0, 0.0, n_gold]],
                            columns=["norm_key", "p", "pl", "r", "rl"])

    gold = list(zip(gold_pdf["pred"], gold_pdf["args"]))
    pred = list(zip(pred_pdf["pred"], pred_pdf["args"]))
    scores = [
        [binary_lenient_match(gp, list(ga), ep, list(ea)) for ep, ea in pred]
        for gp, ga in gold
    ]

    recall_num = sum(max((row[j][1] for j in range(n_pred)), default=0) for row in scores)

    precision_num = 0.0
    used_rows: set[int] = set()
    used_cols: set[int] = set()
    for _ in range(min(n_gold, n_pred)):
        best_p, best_i, best_j = -1.0, -1, -1
        for i in range(n_gold):
            if i in used_rows:
                continue
            for j in range(n_pred):
                if j in used_cols:
                    continue
                if scores[i][j][0] > best_p:
                    best_p, best_i, best_j = scores[i][j][0], i, j
        used_rows.add(best_i)
        used_cols.add(best_j)
        precision_num += best_p

    return pd.DataFrame([[key, precision_num, n_pred, recall_num, n_gold]],
                        columns=["norm_key", "p", "pl", "r", "rl"])


def _with_key(df: DataFrame) -> DataFrame:
    """Project (sent, pred, args, norm_key) through FRESH aliases.

    The re-alias matters: scoring a DataFrame against itself (the
    parity self-check) makes both cogroup children share attribute ids;
    Catalyst's column pruning under the downstream aggregate then
    drops the duplicated child columns and the pandas kernel receives
    key-only frames. Fresh exprIds per side keep the plans disjoint.
    """
    return df.select(
        F.col("sent").alias("sent"),
        F.col("pred").alias("pred"),
        F.col("args").alias("args"),
        normalize_key_col(F.col("sent")).alias("norm_key"),
    )


def sentence_scores(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Per-sentence score components. Input schema for both sides:
    (sent string, pred string, args array<string>)."""
    g = _with_key(gold.select("sent", "pred", "args"))
    p = _with_key(pred.select("sent", "pred", "args"))
    return (
        g.groupBy("norm_key")
        .cogroup(p.groupBy("norm_key"))
        .applyInPandas(lambda l, r: _score_group(l, r), _SCORE_SCHEMA)
    )


def carb_compare(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Global single-point CaRB metrics: one row
    (precision, recall, f1, auc, n_gold_sents)."""
    sums = sentence_scores(gold, pred).agg(
        F.sum("p").alias("p"), F.sum("pl").alias("pl"),
        F.sum("r").alias("r"), F.sum("rl").alias("rl"),
        F.count(F.lit(1)).alias("n_gold_sents"),
    )
    P = F.when(F.col("pl") > 0, F.col("p") / F.col("pl")).otherwise(F.lit(1.0))
    R = F.when(F.col("rl") > 0, F.col("r") / F.col("rl")).otherwise(F.lit(0.0))
    prf = sums.select(
        P.alias("precision"), R.alias("recall"), F.col("n_gold_sents")
    ).select(
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round(
            F.when(F.col("precision") + F.col("recall") > 0,
                   2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall"))
                   ).otherwise(F.lit(0.0)), 6).alias("f1"),
        F.round(F.col("recall") * (F.col("precision") + 1) / 2, 6).alias("auc"),
        "n_gold_sents",
    )
    return prf


def triples_as_tuples(triples: DataFrame) -> DataFrame:
    """Adapt the engine's triples table to the scorer's input shape."""
    return triples.select("sent", "pred", "args")
