"""Unit + property tests for the KGX merge family (SURVEY §5.2/§5.3):
deterministic first-wins under rank, list union, idempotence,
permutation-invariance."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from data_services_spark.operators.merge import merge_edges, merge_nodes

NODE_SCHEMA = ("id string, name string, category array<string>, "
               "source_rank int")


def rows_to_nodes(spark, rows):
    return spark.createDataFrame(rows, NODE_SCHEMA)


def merged_map(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def test_first_wins_by_rank(spark):
    df = rows_to_nodes(spark, [
        ("A", "second", ["x"], 2),
        ("A", "first", ["y"], 1),
        ("B", None, ["z"], 1),
        ("B", "fallback", [], 2),
    ])
    out = merged_map(merge_nodes(df))
    assert out["A"]["name"] == "first"
    assert out["A"]["category"] == ["x", "y"]
    assert out["A"]["n_merged"] == 2
    # rank-1 name is NULL -> falls through to rank-2 non-null value
    assert out["B"]["name"] == "fallback"


def test_all_null_scalar_stays_null(spark):
    df = rows_to_nodes(spark, [("A", None, ["x"], 1), ("A", None, ["x"], 2)])
    out = merged_map(merge_nodes(df))
    assert out["A"]["name"] is None
    assert out["A"]["category"] == ["x"]


def test_empty_category_lists(spark):
    df = rows_to_nodes(spark, [("A", "n", [], 1), ("A", "n", [], 2)])
    assert merged_map(merge_nodes(df))["A"]["category"] == []


def test_edge_merge_unions_lists(spark):
    schema = ("subject string, predicate string, object string, "
              "primary_knowledge_source string, publications array<string>, "
              "aggregator_knowledge_sources array<string>, source_rank int")
    df = spark.createDataFrame([
        ("s", "p", "o", "ks", ["PMID:2"], ["agg1"], 1),
        ("s", "p", "o", "ks", ["PMID:1", "PMID:2"], ["agg2"], 2),
        ("s", "p", "o", "ks2", ["PMID:9"], [], 1),
    ], schema)
    out = {(r["subject"], r["primary_knowledge_source"]): r.asDict()
           for r in merge_edges(df).collect()}
    assert out[("s", "ks")]["publications"] == ["PMID:1", "PMID:2"]
    assert out[("s", "ks")]["aggregator_knowledge_sources"] == ["agg1", "agg2"]
    assert out[("s", "ks")]["n_merged"] == 2
    assert out[("s", "ks2")]["n_merged"] == 1


node_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),                      # id
        st.one_of(st.none(), st.sampled_from(["n1", "n2"])),   # name
        st.lists(st.sampled_from(["c1", "c2", "c3"]), max_size=3),
        st.integers(min_value=1, max_value=5),                 # rank
    ),
    min_size=1, max_size=8,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=node_strategy)
def test_merge_idempotent_and_permutation_invariant(spark, rows):
    """merge(merge(x)) == merge(x) modulo n_merged, and input order does not
    change the outcome when (id, rank) resolves scalars uniquely."""
    # keep one name candidate per (id, rank) so first-wins is well-defined
    seen, clean = set(), []
    for r in rows:
        if (r[0], r[3]) in seen:
            continue
        seen.add((r[0], r[3]))
        clean.append(r)
    df = rows_to_nodes(spark, clean)
    once = merge_nodes(df)
    out1 = {k: {p: v for p, v in d.items() if p != "n_merged"}
            for k, d in merged_map(once).items()}
    again = merge_nodes(once.withColumn("source_rank", once.n_merged * 0 + 1))
    out2 = {k: {p: v for p, v in d.items() if p != "n_merged"}
            for k, d in merged_map(again).items()}
    assert out1 == out2
    perm = rows_to_nodes(spark, list(reversed(clean)))
    out3 = {k: {p: v for p, v in d.items() if p != "n_merged"}
            for k, d in merged_map(merge_nodes(perm)).items()}
    assert out1 == out3


def test_merge_nodes_matches_duckdb(spark, duck):
    """A1 on the derived fixture vs the oracle at sf0.001 (unit-level copy of
    the registry check, kept here so merge refactors fail fast)."""
    from data_services_spark.registry import ORACLES, QUERIES
    from tests.conftest import SF_DIR, assert_same_result

    assert_same_result(QUERIES["kgx_node_merge"](spark, SF_DIR), duck,
                       ORACLES["kgx_node_merge"])


def test_incremental_agg_state_merge(spark):
    """Delta-only keys appear, state-only keys carry through untouched,
    shared keys merge pairwise; avg derives from sum+count at read time
    (a stored average would weight the delta wrongly — the classic bug)."""
    import pytest

    from data_services_spark.operators.incremental import (
        agg_state, finish_avg, merge_agg_state)

    specs = {"n": ("count", "*"), "s": ("sum", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")}
    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k string, v long")
    delta = spark.createDataFrame(
        [("a", 30), ("c", 7)], "k string, v long")
    state = agg_state(base, ["k"], specs)
    merged = {r.k: r for r in
              merge_agg_state(state, delta, ["k"], specs).collect()}
    assert (merged["a"].n, merged["a"].s, merged["a"].lo,
            merged["a"].hi) == (3, 60, 10, 30)
    assert (merged["b"].n, merged["b"].s) == (1, 5)      # untouched
    assert (merged["c"].n, merged["c"].s) == (1, 7)      # new group
    avg = {r.k: r.m for r in finish_avg(
        merge_agg_state(state, delta, ["k"], specs),
        "m", "s", "n").collect()}
    assert avg["a"] == 20.0  # (10+20+30)/3, NOT mean(mean(10,20), 30)=22.5
    with pytest.raises(ValueError, match="non-mergeable"):
        merge_agg_state(state, delta, ["k"], {"m": ("avg", "v")})
