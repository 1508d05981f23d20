"""Arrow rule backend must be row-identical to the codegen path."""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.operators.extract import extract_triples
from openie_spark.operators.fast_extract import extract_triples_arrow
from openie_spark.sources.transcripts import read_transcripts

COLS = ["conv_id", "turn_idx", "sent_idx", "ext_idx", "sent",
        "pred", "args", "subj", "obj", "confidence"]


def _diff(a, b):
    sa = a.select(*COLS).withColumn("args", F.to_json("args"))
    sb = b.select(*COLS).withColumn("args", F.to_json("args"))
    return sa.exceptAll(sb).count() + sb.exceptAll(sa).count()


def test_arrow_matches_codegen_on_testdata(spark):
    t = read_transcripts(spark, "/root/testdata/sf0.001")
    a = extract_triples_arrow(t)
    b = extract_triples(t)
    assert a.count() == b.count()
    assert _diff(a, b) == 0
    # mapInPandas output fields are always nullable; compare name/type
    assert [(f.name, f.dataType) for f in a.schema] == \
        [(f.name, f.dataType) for f in b.select(*COLS).schema]


def test_arrow_matches_codegen_on_hostile(spark):
    t = spark.createDataFrame(
        [("c0", 0, "user", None, None, None),
         ("c0", 1, "user", "", None, None),
         ("c0", 2, "user", "   ", None, None),
         ("c0", 3, "user", ". ! ?", None, None),
         ("c0", 4, "user", "is was are", None, None),
         ("c0", 5, "user", "a . b ! c ?", None, None),
         ("c0", 6, "user", " ".join(["is"] * 120), None, None),
         ("c0", 7, "user", " ".join(f"w{i}" for i in range(120)) + " . tail is here", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    assert _diff(extract_triples_arrow(t), extract_triples(t)) == 0
