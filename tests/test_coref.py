"""Coref-lite: referring-fragment -> antecedent recency resolution."""

from __future__ import annotations


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, sent_idx int, ext_idx int, "
        "subj string, obj string",
    )


def _resolve(spark, rows):
    from openie_spark.kg.coref import resolve_pronouns

    out = resolve_pronouns(_triples(spark, rows))
    return {
        (r.conv_id, r.turn_idx, r.sent_idx, r.ext_idx, r.side):
            (r.pronoun, r.antecedent)
        for r in out.collect()
    }


def test_recency_order_and_fragment_classes(spark):
    """Pins: transcript order (turn, sent, ext, subj-before-obj),
    normalization before matching ('It' -> 'it'), fragments never
    serving as antecedents, and no-prior-mention rows dropped."""
    rows = [
        ("c1", 0, 0, 0, "the scan", "big table"),
        ("c1", 1, 0, 0, "It", "fast hash join"),
        ("c1", 1, 0, 1, "they", "the"),
        ("c2", 0, 0, 0, "it", "x"),
    ]
    got = _resolve(spark, rows)
    assert got == {
        # most recent prior entity is turn 0's OBJECT, not its subject
        ("c1", 1, 0, 0, "subj"): ("it", "big table"),
        # the fragment subj 'they' of the same extraction is skipped
        # as an antecedent; 'fast hash join' (prev extraction's obj) wins
        ("c1", 1, 0, 1, "subj"): ("they", "fast hash join"),
        # bare determiner resolves like a pronoun
        ("c1", 1, 0, 1, "obj"): ("the", "fast hash join"),
        # c2's subj 'it' has no prior entity mention -> dropped
    }


def test_subject_of_same_extraction_precedes_object(spark):
    got = _resolve(spark, [("c3", 0, 0, 0, "alpha scan", "it")])
    assert got == {("c3", 0, 0, 0, "obj"): ("it", "alpha scan")}


def test_multiword_span_containing_pronoun_is_not_a_fragment(spark):
    """'it all' carries content -> neither resolved nor stop-filtered;
    it even SERVES as an antecedent for the next fragment."""
    got = _resolve(spark, [
        ("c4", 0, 0, 0, "it all", "beta"),
        ("c4", 1, 0, 0, "this", "gamma"),
    ])
    assert got == {("c4", 1, 0, 0, "subj"): ("this", "beta")}


def test_outputs_are_well_typed(spark):
    """Every output pronoun is a REF_FRAGMENT; no antecedent is ever a
    fragment or stop mention."""
    from openie_spark.config import REF_FRAGMENTS, STOP_MENTIONS

    rows = [
        ("c%d" % (i % 3), i // 3, 0, 0, s, o)
        for i, (s, o) in enumerate(
            [("it", "scan"), ("the", "they"), ("user", "an"),
             ("merge batch", "this"), ("a", "it"), ("sort", "value")] * 3
        )
    ]
    got = _resolve(spark, rows)
    assert got, "expected at least one resolution"
    for pron, ante in got.values():
        assert pron in REF_FRAGMENTS
        assert ante not in REF_FRAGMENTS and ante not in STOP_MENTIONS


def test_coref_edges_repair_and_attach(spark):
    """Repaired rows only; subj / both classes; no-prior rows and
    unrepaired rows excluded; endpoints mapped through the canon map."""
    import hashlib

    from openie_spark.kg.coref import coref_edges

    triples = spark.createDataFrame(
        [("c1", 0, 0, 0, "likes", "alpha scan", "beta table"),
         ("c1", 1, 0, 0, "runs", "it", "gamma sort"),
         ("c1", 2, 0, 0, "has", "it", "those"),
         ("c2", 0, 0, 0, "p", "it", "solo")],
        "conv_id string, turn_idx int, sent_idx int, ext_idx int, "
        "pred string, subj string, obj string")
    canon = spark.createDataFrame(
        [(n, 1, n) for n in
         ("alpha scan", "beta table", "gamma sort", "solo")],
        "norm string, freq long, component string")
    got = {(r.conv_id, r.turn_idx): (r.src_id, r.dst_id, r.pred, r.repaired)
           for r in coref_edges(triples, canon).collect()}
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got == {
        # 'it' -> most recent prior entity 'beta table'
        ("c1", 1): (h("beta table"), h("gamma sort"), "runs", "subj"),
        # subj 'it' and obj 'those' BOTH resolve to 'gamma sort'
        ("c1", 2): (h("gamma sort"), h("gamma sort"), "has", "both"),
        # c2: no prior entity -> no repair -> excluded
    }


def test_hostile_inputs_do_not_crash(spark):
    """The verify-skill probe set: null / empty / punct-only /
    whitespace-only args must neither crash nor emit rows with empty
    norms anywhere in coref outputs."""
    from openie_spark.kg.coref import coref_edges, resolve_pronouns

    triples = spark.createDataFrame(
        [("h1", 0, 0, 0, "p", None, "alpha"),
         ("h1", 1, 0, 0, "p", "", "it"),
         ("h1", 2, 0, 0, "p", "...", "   "),
         ("h1", 3, 0, 0, "p", "it", None)],
        "conv_id string, turn_idx int, sent_idx int, ext_idx int, "
        "pred string, subj string, obj string")
    res = resolve_pronouns(triples).collect()
    assert {(r.pronoun, r.antecedent) for r in res} == {("it", "alpha")}
    canon = spark.createDataFrame(
        [("alpha", 1, "alpha")], "norm string, freq long, component string")
    edges = coref_edges(triples, canon).collect()
    # 'it' at (1,0,0,obj) repairs to alpha but its subj '' drops on the
    # inner map join; 'it' at (3,0,0,subj) repairs but obj None drops
    assert edges == []
