"""Span-extraction parity with the two reference variants.

Golden values below are hand-derived from the documented semantics of
/root/reference/models/seqie.py:58-72 (get_predicate_span: P-B flushes
the open span and starts a new one; P-I appends its index to the open
span even when none was opened or after a gap; trailing span flushed)
and /root/reference/run.py:29-41 (tag2span: contiguous [l, r]; closes
only on a non-P tag; trailing open span DROPPED; duplicate [l, r]
suppressed; P-B overwrites an open span without flushing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openie_spark.functions.arrays import seqie_spans, tag2span_spans


def _run(spark, expr_fn, tags):
    df = spark.createDataFrame([(tags,)], "tags array<string>")
    return df.select(expr_fn(F.col("tags")).alias("s")).head()["s"]


SEQIE_CASES = [
    # (tags, expected spans as index lists)
    (["O", "P-B", "P-I", "O"], [[1, 2]]),
    (["P-B", "O", "P-B", "P-I"], [[0], [2, 3]]),               # trailing span flushed
    (["P-I", "O"], [[0]]),                                     # leading I opens a span
    (["P-B", "O", "P-I"], [[0, 2]]),                           # I after gap extends (non-contiguous)
    (["P-B", "P-B"], [[0], [1]]),                              # B flushes open span
    (["O", "O"], []),
    ([], []),
    (["P-B", "P-I", "P-I", "P-I"], [[0, 1, 2, 3]]),
]

TAG2SPAN_CASES = [
    (["O", "P-B", "P-I", "O"], [[1, 2]]),
    (["P-B", "P-I"], []),                                      # trailing open span dropped
    (["P-B", "O", "P-B", "P-I", "O"], [[0, 0], [2, 3]]),
    (["P-B", "O", "P-B", "O"], [[0, 0]]),                      # dup [l,r]? no — second [2,2]
    (["P-B", "O", "P-B", "P-B", "O"], [[0, 0], [3, 3]]),       # B overwrites open span silently
    (["P-I", "O"], []),                                        # l==-1: leading I alone never opens
    (["O"], []),
]
# fix the fourth case golden: spans are [0,0] then [2,2] — distinct pairs
TAG2SPAN_CASES[3] = (["P-B", "O", "P-B", "O"], [[0, 0], [2, 2]])


@pytest.mark.parametrize("tags,expected", SEQIE_CASES)
def test_seqie_spans(spark, tags, expected):
    assert _run(spark, seqie_spans, tags) == expected


@pytest.mark.parametrize("tags,expected", TAG2SPAN_CASES)
def test_tag2span_spans(spark, tags, expected):
    assert _run(spark, tag2span_spans, tags) == expected


def test_tag2span_dedup(spark):
    # identical [l,r] appearing twice is suppressed (run.py:38)
    tags = ["P-B", "O"] * 2  # spans would be [0,0] and [2,2] — distinct
    assert _run(spark, tag2span_spans, tags) == [[0, 0], [2, 2]]


def test_tag2span_leading_pi_sets_r_only(spark):
    # P-I with l==-1 sets r but never opens: following O closes nothing
    assert _run(spark, tag2span_spans, ["P-I", "P-I", "O"]) == []
