"""Benchmark decontamination: flag training documents whose word
n-grams overlap a held-out benchmark/eval set.

The standard pre-training hygiene step (GPT-3 appx. C used 13-gram
overlap, Llama-2 used token n-grams): any training document sharing
long n-grams with an evaluation benchmark leaks test data into the
model. Here the "benchmark" is a deterministic md5-ticket slice of the
corpus itself (sandbox rule: no external data), which doubles as a
ground-truth generator — the planted exact/near duplicates in the
documents table produce real contamination hits across the split.

Semantics (engine-portable, mirrored bit-for-bit by
plans/datapipe_oracles.decontaminate_sql):

* tokens: split on single space, empty tokens dropped (repo-wide
  convention, hashing.tokens_of).
* grams: distinct word 8-grams per doc; docs shorter than 8 tokens
  contribute their whole token list as ONE gram (same fallback as
  hashing.word_ngrams). Grams travel as md5h60 hashes — the shuffle
  carries 8-byte keys, never the strings.
* eval membership: md5h60('decon-v1#' || doc_id) % 1e6 <
  DECON_HOLDOUT_PPM — the salted-ticket scheme of
  quality.stratified_sample (deterministic at any parallelism).
* output, one row per TRAIN doc: n_grams (distinct), n_hit (distinct
  grams also present anywhere in the eval slice), contam_ppm =
  round-half-up ppm(n_hit / n_grams), contaminated flag at
  DECON_CONTAM_PPM.

Scale shape (100 TB corpus, benchmark-sized eval slice): gram build is
posexplode + window lead over ONE doc_id shuffle (whole-stage codegen
— the per-gram slice/join HOF form is interpreted, measured ~4s/sf0.1
in the gopher work); per-doc distinct is a partial-aggregated shuffle
on (doc_id, gh); the probe is an equi-join on the 8-byte gram hash —
uniformly distributed by construction (no skew), and AQE broadcasts
the eval side when it fits (a real benchmark suite is millions of
grams, far under broadcast limits). The gram table feeds both sides of
the split, so it is localCheckpointed once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openie_spark.datapipe.hashing import md5h60, tokens_of
from openie_spark.datapipe.textstats import _ppm

DECON_N = 8                  # word n-gram width
DECON_HOLDOUT_PPM = 50_000   # 5% of docs act as the benchmark slice
DECON_SALT = "decon-v1"
DECON_CONTAM_PPM = 100_000   # >=10% of a doc's grams hit => contaminated


def _ticket(doc_id: Column) -> Column:
    return md5h60(
        F.concat(F.lit(f"{DECON_SALT}#"), doc_id.cast("string"))) % 1_000_000


def gram_hashes(docs: DataFrame, n: int = DECON_N) -> DataFrame:
    """(doc_id, gh): distinct md5h60 hashes of the doc's word n-grams
    (whole-token-list fallback below n tokens; NULL text yields one
    NULL gh so the doc still reports a row downstream)."""
    base = docs.select("doc_id", tokens_of(F.col("text")).alias("toks"))
    ex = base.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    tails = [f"t{i}" for i in range(1, n)]
    leads = ex.select(
        "doc_id", "tok",
        *[F.lead("tok", i).over(w).alias(t) for i, t in enumerate(tails, 1)])
    # concat_ws SKIPS nulls: the isNotNull guard on the LAST lead is
    # what stops truncated tail grams from leaking out.
    full = leads.where(F.col(tails[-1]).isNotNull()).select(
        "doc_id", F.concat_ws(" ", "tok", *tails).alias("g"))
    # explicit NULL arm: size(NULL) is NULL (not -1) so a bare `< n`
    # would silently DROP null-text docs — the oracle keeps them as
    # one NULL-gram row, and so must we.
    short = base.where(
        (F.size("toks") < n) | F.col("toks").isNull()
    ).select("doc_id", F.array_join("toks", " ").alias("g"))
    return (
        full.unionAll(short)
        .select("doc_id", md5h60(F.col("g")).alias("gh"))
        .distinct()
    )


def decontaminate(docs: DataFrame,
                  holdout_ppm: int = DECON_HOLDOUT_PPM,
                  contam_ppm: int = DECON_CONTAM_PPM) -> DataFrame:
    """-> (doc_id, n_grams, n_hit, contam_ppm, contaminated) for every
    TRAIN doc (the ~1-holdout_ppm complement of the eval slice)."""
    grams = gram_hashes(docs).localCheckpoint(eager=False)
    tick = _ticket(F.col("doc_id"))
    ev = grams.where(tick < holdout_ppm).select("gh").distinct()
    tr = grams.where(tick >= holdout_ppm)
    hits = tr.join(ev.withColumn("hit", F.lit(1)), "gh", "left")
    ppm = _ppm(F.col("n_hit"), F.greatest(F.col("n_grams"), F.lit(1)))
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"))
        .select(
            "doc_id", "n_grams", "n_hit",
            ppm.alias("contam_ppm"),
            (ppm >= contam_ppm).alias("contaminated"),
        )
    )
