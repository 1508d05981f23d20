"""Topic segmentation: exact-ppm overlap, boundary rule, running ids."""

from __future__ import annotations

from pyspark.sql import functions as F


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


# --------------------------------------------------- dialogue stats

def test_dialogue_stats_hand_conversation(spark):
    from openie_spark.kg.dialogue import dialogue_stats

    rows = [
        # conv A: user(5 chars), asst, asst, tool, user — runs: u,a2,t,u
        ("A", 0, "user",      "hello",       None,     "2024-01-01 00:00:00"),
        ("A", 1, "assistant", "hi there",    None,     "2024-01-01 00:01:00"),
        ("A", 2, "assistant", "more",        None,     "2024-01-01 00:02:00"),
        ("A", 3, "tool",      "result",      "search", "2024-01-01 00:03:00"),
        ("A", 4, "user",      "thanks",      None,     "2024-01-01 00:10:00"),
        # conv B: assistant monologue, no user text
        ("B", 0, "assistant", "aaaa",        None,     "2024-01-01 01:00:00"),
        ("B", 1, "assistant", "bb",          None,     "2024-01-01 01:05:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.conv_id: r.asDict() for r in dialogue_stats(df).collect()}
    a = got["A"]
    assert (a["n_turns"], a["n_user"], a["n_assistant"], a["n_tool_turns"]) == (5, 2, 2, 1)
    assert a["total_chars"] == 5 + 8 + 4 + 6 + 6
    assert a["avg_turn_chars"] == a["total_chars"] // 5
    assert a["duration_min"] == 10
    # assistant 12 chars / user 11 chars, round-half-up ppm
    assert a["asst_user_char_ppm"] == (2 * 12 * 1_000_000 + 11) // (2 * 11)
    assert a["longest_run"] == 2
    b = got["B"]
    assert b["asst_user_char_ppm"] is None
    assert (b["n_turns"], b["longest_run"], b["duration_min"]) == (2, 2, 5)


def test_dialogue_stats_single_turn_and_empty_text(spark):
    from openie_spark.kg.dialogue import dialogue_stats

    df = spark.createDataFrame(
        [("C", 0, "user", "", None, "2024-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = dialogue_stats(df).collect()[0]
    assert (r.n_turns, r.total_chars, r.avg_turn_chars,
            r.duration_min, r.longest_run) == (1, 0, 0, 0, 1)
    # no assistant chars but user length 0 -> denominator 0 -> NULL
    assert r.asst_user_char_ppm is None


def test_conv_documents_orders_by_turn_idx(spark):
    from openie_spark.kg.dialogue import conv_documents

    df = spark.createDataFrame(
        [("c1", 2, "three"), ("c1", 0, "one"), ("c1", 1, "two"),
         ("c2", 0, None), ("c2", 1, "solo")],
        "conv_id string, turn_idx int, text string")
    got = {r.doc_id: r.text for r in conv_documents(df).collect()}
    assert got["c1"] == "one two three"
    assert got["c2"] in (" solo", "solo ", "solo")  # null -> '' join artifact ok
    # partition independence
    got2 = {r.doc_id: r.text
            for r in conv_documents(df.repartition(5)).collect()}
    assert got == got2


def test_conv_neardup_finds_planted_twins_only(spark):
    """Each conversation pairs with its own perturbed twin; two
    vocabulary-disjoint conversations never pair with each other."""
    from openie_spark.kg.dialogue import conv_neardup_pairs

    rows = []
    for c, base in (("ca", "alpha"), ("cb", "beta")):
        for t in range(4):
            rows.append((c, t, " ".join(f"{base}{t}w{j}" for j in range(20))))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {(r.a, r.b): r.jaccard for r in conv_neardup_pairs(df).collect()}
    assert set(got) == {("ca", "ca~twin"), ("cb", "cb~twin")}
    assert all(0.5 <= j <= 1.0 for j in got.values())


def test_role_transitions_hand_golden(spark):
    """Adjacent-turn role bigrams per conversation; conv support and
    round-down row shares."""
    import datetime as dt

    rows = [
        ("c0", 0, "user"), ("c0", 1, "assistant"), ("c0", 2, "user"),
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "tool"),
    ]
    t0 = dt.datetime(2024, 1, 1)
    tr = spark.createDataFrame(
        [(c, i, r, f"t{i}", None, t0) for c, i, r in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    from openie_spark.kg.dialogue import role_transitions

    got = {(r.from_role, r.to_role): (r.n_transitions, r.n_convs, r.row_ppm)
           for r in role_transitions(tr).collect()}
    assert got == {
        ("user", "assistant"): (2, 2, 1000000),
        ("assistant", "user"): (1, 1, 500000),
        ("assistant", "tool"): (1, 1, 500000),
    }


def test_tool_stats_hand_golden(spark):
    """Per-tool rollup: latency to the NEXT turn in integer minutes, a
    trailing tool turn counted in n_calls but not n_followed, tool-less
    turns excluded entirely."""
    import datetime as dt

    from openie_spark.kg.dialogue import tool_stats

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, ts(0)),
         ("c1", 1, "tool", "xxxx", "search", ts(1)),     # next at +3 -> 2 min
         ("c1", 2, "assistant", "ok", None, ts(3)),
         ("c1", 3, "tool", "yy", "search", ts(4)),       # trailing: no next
         ("c2", 0, "tool", "zzzzzz", "calc", ts(0)),     # next at +90s -> 1
         ("c2", 1, "assistant", "done", None, ts(1.5)),
         ("c2", 2, "tool", "x", "probe", ts(5))],        # never followed
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    got = {r.tool: r.asDict() for r in tool_stats(df).collect()}
    assert set(got) == {"search", "calc", "probe"}
    s = got["search"]
    assert (s["n_calls"], s["n_convs"], s["total_chars"], s["avg_chars"]) == (2, 1, 6, 3)
    assert (s["n_followed"], s["avg_follow_min"]) == (1, 2)
    c = got["calc"]
    assert (c["n_calls"], c["n_convs"], c["n_followed"], c["avg_follow_min"]) == (1, 1, 1, 1)
    # an entirely-unfollowed tool reports the -1 sentinel, never NULL
    # (a NULL would float the int column under pandas — driver hash)
    p = got["probe"]
    assert (p["n_calls"], p["n_followed"], p["avg_follow_min"]) == (1, 0, -1)


def test_tool_stats_negative_gap_floors(spark):
    """Timestamps non-monotone in turn_idx (the window orders by
    turn_idx, not ts): a -90s gap must FLOOR to -2 minutes like the
    DuckDB twin's `//`, not truncate to -1; same for the average."""
    import datetime as dt

    from openie_spark.kg.dialogue import tool_stats

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [("c1", 0, "tool", "x", "probe", t0),
         ("c1", 1, "assistant", "ok", None, t0 - dt.timedelta(seconds=90))],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    r = tool_stats(df).collect()[0]
    assert (r.tool, r.n_followed, r.avg_follow_min) == ("probe", 1, -2)


def test_tool_sequences_skips_non_tool_turns(spark):
    """The chain is over TOOL turns only: intervening assistant/user
    turns don't break adjacency; row_ppm row-normalizes per from_tool."""
    import datetime as dt

    from openie_spark.kg.dialogue import tool_sequences

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, tool in enumerate(["a", None, "b", None, "a", "b"]):
        rows.append(("c1", i, "tool" if tool else "assistant",
                     "t", tool, t0))
    rows += [("c2", 0, "tool", "t", "a", t0), ("c2", 1, "tool", "t", "b", t0)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")
    got = {(r.from_tool, r.to_tool): (r.n_transitions, r.n_convs, r.row_ppm)
           for r in tool_sequences(df).collect()}
    # c1 chain: a->b->a->b ; c2 chain: a->b
    assert got == {
        ("a", "b"): (3, 2, 1000000),
        ("b", "a"): (1, 1, 1000000),
    }
