"""Physical-plan regression guards: the scale properties PLANS.md
audits are asserted here for key queries so a refactor cannot silently
reintroduce a cross join, an unpruned scan, or a per-row Python eval.
explain()-only — no query executes."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _count(plan: str, pat: str) -> int:
    return len(re.findall(pat, plan))


@pytest.fixture(scope="module")
def entry(spark):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rule_extraction_is_pure_codegen(spark, entry):
    """The default extraction path must stay JVM-side: zero Python
    eval nodes, zero joins, scan pruned to the needed columns."""
    plan = _plan(entry.queries()["triples_extract"](spark, SF))
    assert _count(plan, r"ArrowEvalPython|BatchEvalPython|MapInPandas") == 0
    assert _count(plan, r"Join") == 0
    assert "ReadSchema" in plan


def test_no_nested_loop_joins_on_scale_paths(spark, entry):
    """The LSH/IVF/near-dup family exists to avoid the quadratic join —
    a BroadcastNestedLoopJoin/CartesianProduct appearing there means
    the bucketing broke. (dp_embedding_topk / dp_ngram_pairs are the
    LABELED quadratic ground truths and are exempt.)"""
    qs = entry.queries()
    for name in ("dp_minhash_pairs", "dp_simhash_pairs", "dp_embedding_pairs",
                 "dp_embedding_lsh", "dp_embedding_ivf", "dp_decontam",
                 "dp_ev_intervals", "kg_pairs_minhash"):
        plan = _plan(qs[name](spark, SF))
        assert _count(plan, r"CartesianProduct|BroadcastNestedLoopJoin") == 0, name


def test_asof_join_is_single_window_single_exchange_chain(spark, entry):
    """dp_ev_asof's whole point is ONE hash partition on user_id plus a
    window — a theta-join formulation would show a nested loop and a
    second user-side exchange."""
    plan = _plan(entry.queries()["dp_ev_asof"](spark, SF))
    assert _count(plan, r"CartesianProduct|BroadcastNestedLoopJoin") == 0
    assert _count(plan, r"\bWindow\b") >= 1
    # union feeds one shuffle per branch on the same key; anything >2
    # means an extra repartition crept in
    assert _count(plan, r"\bExchange\b") <= 2


def test_chunking_is_map_only(spark, entry):
    plan = _plan(entry.queries()["dp_chunks"](spark, SF))
    assert _count(plan, r"\bExchange\b") == 0
    assert _count(plan, r"ArrowEvalPython|BatchEvalPython|MapInPandas") == 0


def test_mixture_window_runs_post_aggregation(spark, entry):
    """corpus_mixture's unpartitioned window is safe ONLY because it
    sees the post-agg stratum table: the plan must place HashAggregate
    below the Window, and the single-partition exchange must feed the
    window, not the scan."""
    plan = _plan(entry.queries()["dp_mixture"](spark, SF))
    w = plan.find("Window")
    agg = [m.start() for m in re.finditer("HashAggregate", plan)]
    assert w != -1 and agg and min(agg) > w  # formatted plan prints top-down


def test_hll_registers_are_pure_codegen_group(spark, entry):
    """dp_hll_distinct's point is the bounded register aggregation:
    no Python stage, no sort/window, no join anywhere in the plan."""
    plan = _plan(entry.queries()["dp_hll_distinct"](spark, SF))
    assert _count(plan, r"ArrowEvalPython|BatchEvalPython|MapInPandas") == 0
    assert _count(plan, r"CartesianProduct|BroadcastNestedLoopJoin") == 0
    assert _count(plan, r"\bWindow\b") == 0
    assert _count(plan, r"\bJoin\b") == 0


def test_entity_types_is_map_only(spark, entry):
    """Typing is a projection over the memoized nodes table — zero
    exchanges of its own."""
    plan = _plan(entry.queries()["kg_entity_types"](spark, SF))
    assert _count(plan, r"\bExchange\b") == 0
    assert _count(plan, r"ArrowEvalPython|BatchEvalPython|MapInPandas") == 0


def test_salience_has_exactly_one_scalar_broadcast(spark, entry):
    """kg_salience attaches the global conversation total via ONE
    1-row broadcast cross join; everything else must stay equi-join
    (a second NLJ would mean the tf/idf join degraded)."""
    plan = _plan(entry.queries()["kg_salience"](spark, SF))
    # formatted explain prints every node twice (tree + detail block)
    assert _count(plan, r"BroadcastNestedLoopJoin") == 2
    assert _count(plan, r"CartesianProduct") == 0


def test_winnow_is_map_only(spark, entry):
    """Winnowing must stay embarrassingly parallel: no Exchange, no
    Python stage, no join — and the k-gram hash array must be owned by
    a Generate barrier (md5 once per gram, not re-inlined per window)."""
    plan = _plan(entry.queries()["dp_winnow"](spark, SF))
    assert _count(plan, r"\bExchange\b") == 0
    assert _count(plan, r"ArrowEvalPython|BatchEvalPython|MapInPandas") == 0
    assert _count(plan, r"\bJoin\b") == 0


def test_coref_is_single_window_no_join(spark, entry):
    """Coref-lite must stay ONE conv-partitioned window: no joins, no
    Python stage beyond the memoized input."""
    plan = _plan(entry.queries()["kg_coref"](spark, SF))
    assert _count(plan, r"\bJoin\b") == 0
    assert _count(plan, r"\bWindow\b") > 0
    assert _count(plan, r"CartesianProduct|BroadcastNestedLoopJoin") == 0


def test_topic_segments_single_exchange(spark, entry):
    """One conv window serves lag + running sum: exactly one shuffle
    (x2 in formatted output), no joins, no Python."""
    plan = _plan(entry.queries()["kg_topic_segments"](spark, SF))
    assert _count(plan, r"\bExchange\b") == 2
    assert _count(plan, r"\bJoin\b") == 0
    assert _count(plan, r"ArrowEvalPython|BatchEvalPython|MapInPandas") == 0


def test_metapaths_all_equi_joins_and_capped_windows(spark, entry):
    """Every metapath join must be an equi-join (AQE picks
    broadcast/SMJ by size at runtime; a nested-loop would mean the
    canon or type attach degenerated), and the hub caps must compile
    to WindowGroupLimit (partial per-partition top-k BEFORE the
    shuffle — the cap does its work map-side)."""
    plan = _plan(entry.queries()["kg_metapaths"](spark, SF))
    assert _count(plan, r"CartesianProduct|BroadcastNestedLoopJoin") == 0
    assert _count(plan, r"WindowGroupLimit") >= 2
