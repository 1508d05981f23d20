"""KG enrichment operators: entity typing, relation lemma
canonicalization, salience, display-label selection."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_lemma_rules_hand_table(spark):
    """Every LEMMA_RULES branch plus the guards that must NOT fire."""
    from openie_spark.kg.enrich import lemma_col

    cases = {
        "studies": "study",     # ies -> y
        "matches": "match",     # (ch|sh|x|z|ss)es
        "classes": "class",
        "scans": "scan",        # plain plural
        "plays": "play",
        "running": "run",       # doubled-consonant ing
        "meeting": "meet",      # plain ing
        "stopped": "stop",      # doubled-consonant ed
        "merged": "merg",       # plain ed (documented under-stem)
        "ring": "ring",         # too short for the ing rule
        "sing": "sing",
        "bus": "bus",           # -us plurals excluded
        "his": "his",           # -is excluded
        "pass": "pass",         # -ss excluded
        "is": "is",             # untouched
        "ties": "tie",          # short for the ies rule; plain plural fires
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {r.w: r.lem for r in df.select("w", lemma_col(F.col("w")).alias("lem")).collect()}
    assert got == cases


def test_canon_relation_aux_and_empty_guard(spark):
    from openie_spark.kg.enrich import canon_relation_col

    cases = {
        "will meet": "meet",            # modal dropped
        "has merged": "merg",
        "is": "is",                     # aux-only keeps its lemma
        "does not": "does not",         # all-aux multi-token kept
        "scans filters": "scan filter", # every token lemmatized
        "query": "query",
    }
    df = spark.createDataFrame([(p,) for p in cases], "p string")
    got = {r.p: r.c for r in df.select(
        "p", canon_relation_col(F.col("p")).alias("c")).collect()}
    assert got == cases


def test_etype_rule_ladder_all_branches(spark):
    from openie_spark.kg.enrich import etype_col

    cases = {
        "1999": "year",
        "2024": "year",
        "42": "numeric",
        "gpt4": "code",
        "3x9b": "code",
        "5 dollars": "measure",
        "dr smith": "person",
        "acme corp": "org",
        "hudson river": "place",
        "fast hash join": "phrase",
        "table": "term",
    }
    df = spark.createDataFrame([(w,) for w in cases], "c string")
    got = {r.c: r.t for r in df.select("c", etype_col(F.col("c")).alias("t")).collect()}
    assert got == cases


def test_entity_salience_hand_golden(spark):
    """Two conversations; entity 'x' appears in both (idf halves its
    score), 'y' only in c1. Integer score = n_local * n_total DIV
    n_convs; rank ties break on entity_id."""
    from openie_spark.kg.enrich import entity_salience

    edges = spark.createDataFrame(
        [("c1", "x", "y", "p", 0, 0, 0), ("c1", "y", "x", "p", 0, 0, 0),
         ("c2", "x", "z", "p", 0, 0, 0)],
        "conv_id string, src_id string, dst_id string, pred string,"
        " turn_idx int, sent_idx int, ext_idx int")
    got = {(r.conv_id, r.entity_id): (r.n_local, r.n_convs, r.salience, r.rank)
           for r in entity_salience(edges).collect()}
    # occurrences: c1 -> x:2 y:2 ; c2 -> x:1 z:1 ; n_total=2
    assert got == {
        ("c1", "y"): (2, 1, 4, 1),   # 2*2//1
        ("c1", "x"): (2, 2, 2, 2),   # 2*2//2
        ("c2", "z"): (1, 1, 2, 1),
        ("c2", "x"): (1, 2, 1, 2),
    }


def test_display_labels_tie_breaks(spark):
    """Max freq wins; freq ties go to the shorter then smaller norm;
    singleton components display themselves."""
    from openie_spark.kg.graph import display_labels

    canon = spark.createDataFrame(
        [("big table", 5, "big table"), ("the big table", 9, "big table"),
         ("big tables", 9, "big table"), ("solo", 3, "solo")],
        "norm string, freq long, component string")
    got = {r.canonical: (r.display, r.display_freq, r.n_aliases, r.freq)
           for r in display_labels(canon).collect()}
    # 'big tables' (10 chars) beats 'the big table' (13) at freq 9
    assert got == {"big table": ("big tables", 9, 3, 23),
                   "solo": ("solo", 3, 1, 3)}
    ids = {r.canonical: r.entity_id for r in display_labels(canon).collect()}
    import hashlib
    assert ids["solo"] == hashlib.md5(b"solo").hexdigest()


def test_relation_canon_groups_inflections(spark):
    from openie_spark.kg.enrich import relation_canon

    rows = [("c1", "a", "b", p, 0, 0, 0) for p in
            ["scan", "scans", "scanned", "will scan", "merge", "query"]]
    edges = spark.createDataFrame(
        rows, "conv_id string, src_id string, dst_id string, pred string,"
              " turn_idx int, sent_idx int, ext_idx int")
    got = {r.rel_canon: (r.n_forms, r.forms, r.n_edges)
           for r in relation_canon(edges).collect()}
    assert got["scan"] == (4, "scan|scanned|scans|will scan", 4)
    assert got["merge"] == (1, "merge", 1)
    assert got["query"] == (1, "query", 1)


def test_relation_schema_hand_golden(spark):
    """Two relations over typed endpoints: signature counts, rank
    order (support desc, then types asc), exact-ppm shares, top-k."""
    from openie_spark.kg.enrich import relation_schema

    edges = spark.createDataFrame(
        # src_id, dst_id, pred, conv_id, turn_idx, sent_idx, ext_idx
        [("p1", "o1", "runs", "c0", 0, 0, 0),
         ("p2", "o1", "runs", "c0", 0, 0, 1),
         ("p1", "t1", "runs", "c1", 0, 0, 0),
         ("p1", "o1", "run", "c1", 0, 0, 1),     # lemma-groups with runs
         ("t1", "t2", "has merged", "c2", 0, 0, 0)],
        "src_id string, dst_id string, pred string, conv_id string, "
        "turn_idx int, sent_idx int, ext_idx int")
    nodes = spark.createDataFrame(
        [("p1", "dr smith", 1, 3), ("p2", "mr jones", 1, 1),
         ("o1", "acme corp", 1, 3), ("t1", "table", 1, 2),
         ("t2", "scan", 1, 1)],
        "entity_id string, canonical string, n_aliases int, freq long")
    got = [(r.rel_canon, r.src_type, r.dst_type, r.n_edges, r.n_convs,
            r.rank, r.share_ppm)
           for r in relation_schema(edges, nodes, k=2).collect()]
    got.sort()
    assert got == [
        # 'has merged' -> aux dropped -> 'merg' (documented under-stem)
        ("merg", "term", "term", 1, 1, 1, 1000000),
        # 'run': person->org 3 of 4 edges, person->term 1 of 4
        ("run", "person", "org", 3, 2, 1, 750000),
        ("run", "person", "term", 1, 1, 2, 250000),
    ]


def test_relation_schema_top_k_truncates(spark):
    from openie_spark.kg.enrich import relation_schema

    edges = spark.createDataFrame(
        [("a", "b", "links", "c0", 0, 0, 0),
         ("b", "a", "links", "c0", 0, 0, 1),
         ("a", "a", "links", "c0", 0, 0, 2)],
        "src_id string, dst_id string, pred string, conv_id string, "
        "turn_idx int, sent_idx int, ext_idx int")
    nodes = spark.createDataFrame(
        [("a", "dr who", 1, 1), ("b", "acme inc", 1, 1)],
        "entity_id string, canonical string, n_aliases int, freq long")
    out = relation_schema(edges, nodes, k=1).collect()
    assert len(out) == 1 and out[0].rank == 1


def test_segment_salience_scopes_to_segments(spark):
    """Entities dominant in different segments of ONE conversation get
    rank 1 in their own segment; segment frequency is the idf axis."""
    from openie_spark.kg.enrich import segment_salience

    edges = spark.createDataFrame(
        [("x", "y", "p", "c1", 0, 0, 0),
         ("x", "z", "p", "c1", 1, 0, 0),
         ("q", "r", "p", "c1", 2, 0, 0),
         ("q", "z", "p", "c1", 3, 0, 0)],
        "src_id string, dst_id string, pred string, conv_id string, "
        "turn_idx int, sent_idx int, ext_idx int")
    segments = spark.createDataFrame(
        [("c1", 0, 0), ("c1", 1, 0), ("c1", 2, 1), ("c1", 3, 1)],
        "conv_id string, turn_idx int, seg_idx int")
    got = {(r.seg_idx, r.entity_id): (r.n_local, r.n_segs, r.salience, r.rank)
           for r in segment_salience(edges, segments).collect()}
    assert got == {
        (0, "x"): (2, 1, 4, 1),   # 2 * 2 segs // in-1-seg
        (0, "y"): (1, 1, 2, 2),
        (0, "z"): (1, 2, 1, 3),   # z appears in both segs -> idf halves
        (1, "q"): (2, 1, 4, 1),
        (1, "r"): (1, 1, 2, 2),
        (1, "z"): (1, 2, 1, 3),
    }


def test_statement_role_provenance_hand_golden(spark):
    """Role counts per statement and the exact tool-source share: a
    statement mentioned from a tool turn and a user turn reads
    tool_src_ppm = 500000; a user-only statement reads 0."""
    import datetime as dt

    from openie_spark.kg.enrich import statement_role_provenance

    tr = spark.createDataFrame(
        [("c1", 0, "user", "t", None, dt.datetime(2024, 1, 1)),
         ("c1", 1, "tool", "t", "search", dt.datetime(2024, 1, 1)),
         ("c2", 0, "user", "t", None, dt.datetime(2024, 1, 1))],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    edges = spark.createDataFrame(
        # src, dst, pred, conv, turn, sent, ext
        [("a", "b", "r", "c1", 0, 0, 0),
         ("a", "b", "r", "c1", 1, 0, 0),
         ("x", "y", "q", "c2", 0, 0, 0)],
        "src_id string, dst_id string, pred string, conv_id string,"
        " turn_idx int, sent_idx int, ext_idx int")
    got = {(r.src_id, r.pred, r.dst_id):
           (r.n_mentions, r.n_user, r.n_tool, r.tool_src_ppm)
           for r in statement_role_provenance(edges, tr).collect()}
    assert got == {
        ("a", "r", "b"): (2, 1, 1, 500000),
        ("x", "q", "y"): (1, 1, 0, 0),
    }
