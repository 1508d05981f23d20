"""Triple-assembly (write_output) parity — /root/reference/run.py:148-178.

Quirks pinned here:
  * predicate = space-join of ALL P-tagged words in order; empty → ' '
  * arg slot k collects words whose tag[1] == str(k) (A4/A5 dropped —
    the pos loop stops at '3')
  * empty arg slots are COMPACTED out of the emitted args list, so
    subj = first non-empty slot, not necessarily A0
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.functions.arrays import args_array, pred_string


def _run(spark, words, tags):
    df = spark.createDataFrame([(words, tags)], "words array<string>, tags array<string>")
    return df.select(
        pred_string(F.col("words"), F.col("tags")).alias("p"),
        args_array(F.col("words"), F.col("tags")).alias("a"),
    ).head()


def test_basic_assembly(spark):
    r = _run(spark, ["John", "is", "tall"], ["A0-B", "P-B", "A1-B"])
    assert r["p"] == "is"
    assert r["a"] == ["John", "tall"]


def test_empty_pred_is_single_space(spark):
    r = _run(spark, ["a", "b"], ["A0-B", "A1-B"])
    assert r["p"] == " "


def test_arg_compaction(spark):
    # no A0 → subj slot falls through to A1 (run.py:174-175 only
    # appends non-empty args)
    r = _run(spark, ["is", "blue"], ["P-B", "A1-B"])
    assert r["a"] == ["blue"]


def test_a4_a5_dropped(spark):
    r = _run(
        spark,
        ["w0", "w1", "w2", "w3", "w4", "w5", "p"],
        ["A0-B", "A1-B", "A2-B", "A3-B", "A4-B", "A5-B", "P-B"],
    )
    assert r["a"] == ["w0", "w1", "w2", "w3"]  # A4/A5 silently dropped


def test_noncontiguous_pred_joined_in_order(spark):
    r = _run(spark, ["a", "is", "b", "was", "c"], ["A0-B", "P-B", "O", "P-I", "A1-B"])
    assert r["p"] == "is was"


def test_multi_slot_order(spark):
    r = _run(spark, ["x", "y", "z"], ["A2-B", "A0-B", "A1-B"])
    # slots emitted in pos order 0,1,2 regardless of word order
    assert r["a"] == ["y", "z", "x"]


def test_full_pipeline_triples(spark):
    """End-to-end on a hand-built transcript with known extractions."""
    from openie_spark.operators.extract import extract_triples

    t = spark.createDataFrame(
        [("c1", 0, "user", "John is tall . Mary was here", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["sent_idx"], r["ext_idx"]): (r["subj"], r["pred"], r["obj"])
        for r in extract_triples(t).collect()
    }
    assert got == {
        (0, 0): ("John", "is", "tall"),
        (1, 0): ("Mary", "was", "here"),
    }


def test_pipeline_span_at_start_compacts(spark):
    from openie_spark.operators.extract import extract_triples

    t = spark.createDataFrame(
        [("c1", 0, "user", "is blue sky", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    r = extract_triples(t).head()
    # no words before span → A0 empty → compaction: subj = A1 text
    assert (r["subj"], r["pred"], r["obj"]) == ("blue sky", "is", "")
