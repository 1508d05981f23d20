"""Topic segmentation: exact-ppm overlap, boundary rule, running ids."""

from __future__ import annotations


def test_topic_segments_hand_golden(spark):
    from openie_spark.kg.dialogue import topic_segments

    df = spark.createDataFrame(
        [("c1", 0, "spark shuffle join"),
         ("c1", 1, "shuffle join costs"),        # 2/4 = 500000, same seg
         ("c1", 2, "tomato basil recipe"),       # 0 overlap -> boundary
         ("c1", 3, "basil recipe oven tomato"),  # 3/4 = 750000, same seg
         ("c2", 0, "solo opener")],
        "conv_id string, turn_idx int, text string")
    got = {(r.conv_id, r.turn_idx): (r.overlap_ppm, r.is_boundary, r.seg_idx)
           for r in topic_segments(df).collect()}
    assert got == {
        ("c1", 0): (0, True, 0),
        ("c1", 1): (500000, False, 0),
        ("c1", 2): (0, True, 1),
        ("c1", 3): (750000, False, 1),
        ("c2", 0): (0, True, 0),
    }


def test_topic_segments_empty_and_dup_tokens(spark):
    """Empty turns: empty union counts as zero overlap -> boundary;
    duplicate tokens collapse before the set overlap."""
    from openie_spark.kg.dialogue import topic_segments

    df = spark.createDataFrame(
        [("c1", 0, "a a a b"), ("c1", 1, "b b a"), ("c1", 2, "..."),
         ("c1", 3, "...")],
        "conv_id string, turn_idx int, text string")
    got = {r.turn_idx: (r.overlap_ppm, r.is_boundary, r.seg_idx)
           for r in topic_segments(df).collect()}
    assert got == {
        0: (0, True, 0),
        1: (1000000, False, 0),   # {a,b} == {b,a}
        2: (0, True, 1),          # empty vs {a,b}: inter 0 / union 2
        3: (0, True, 2),          # empty vs empty: union 0 -> zero rule
    }


def test_topic_segments_partition_invariance(spark):
    from openie_spark.kg.dialogue import topic_segments
    from openie_spark.sources.transcripts import read_transcripts

    t = read_transcripts(spark, "/root/testdata/sf0.001")
    a = sorted(tuple(r) for r in topic_segments(t).collect())
    b = sorted(tuple(r) for r in topic_segments(t.repartition(7)).collect())
    assert a == b and a
