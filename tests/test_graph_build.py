"""EP2 graph-spec build + load-metadata tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_services_spark.plans.graph_build import (
    GraphSource, GraphSpec, build_graph,
)
from data_services_spark.plans.metadata import LoadMetadata

NODES = "id string, name string, category array<string>"
EDGES = ("subject string, predicate string, object string, "
         "primary_knowledge_source string, publications array<string>, "
         "aggregator_knowledge_sources array<string>")


def _src(spark, name, nodes, edges, priority, strategy="default"):
    return GraphSource(
        name=name,
        nodes=spark.createDataFrame(nodes, NODES),
        edges=spark.createDataFrame(edges, EDGES),
        merge_priority=priority,
        merge_strategy=strategy)


def test_build_graph_merges_by_priority_and_subset(spark):
    # src_a (priority 1) and src_b (priority 2) disagree on node A's name
    a = _src(spark, "src_a",
             [("A", "alpha", ["biolink:Gene"]), ("B", "beta", ["biolink:Gene"])],
             [("A", "biolink:related_to", "B", "infores:a", ["PMID:1"], [])],
             priority=1)
    b = _src(spark, "src_b",
             [("A", "ALPHA-2", ["biolink:NamedThing"]),
              ("C", "gamma", ["biolink:Disease"])],
             [("A", "biolink:related_to", "B", "infores:a", ["PMID:2"], [])],
             priority=2)
    # literature source: may only connect existing nodes; edge to "Z" dropped
    lit = _src(spark, "lit",
               [],
               [("A", "biolink:mentions", "C", "infores:lit", [], []),
                ("A", "biolink:mentions", "Z", "infores:lit", [], [])],
               priority=3, strategy="connected_edge_subset")

    spec = GraphSpec("test_graph", [a, b, lit])
    nodes, edges = build_graph(spec)

    n = {r["id"]: r for r in nodes.collect()}
    assert set(n) == {"A", "B", "C"}
    assert n["A"]["name"] == "alpha"          # priority 1 wins
    assert n["A"]["category"] == ["biolink:Gene", "biolink:NamedThing"]
    assert n["A"]["n_merged"] == 2

    e = {(r["subject"], r["predicate"], r["object"]): r
         for r in edges.collect()}
    # duplicate edge from a+b merged, publications unioned
    assert e[("A", "biolink:related_to", "B")]["publications"] == [
        "PMID:1", "PMID:2"]
    # subset source: edge to existing C admitted, edge to unknown Z dropped
    assert ("A", "biolink:mentions", "C") in e
    assert ("A", "biolink:mentions", "Z") not in e


def test_build_graph_normalizes_before_merge(spark):
    a = _src(spark, "src_a",
             [("N:1", "one", ["biolink:Gene"]), ("N:2", "two", ["biolink:Gene"])],
             [("OLD:1", "biolink:related_to", "N:2", "infores:a", [], [])],
             priority=1)
    nmap = spark.createDataFrame([("OLD:1", "N:1")],
                                 "orig_id string, canon_id string")
    nodes, edges = build_graph(GraphSpec("g", [a]), node_map=nmap)
    row = edges.collect()[0]
    assert row["subject"] == "N:1"  # endpoint rewritten before the merge


def test_load_metadata_counts_without_extra_pass(spark):
    meta = LoadMetadata("demo", version="v1")
    df = spark.createDataFrame(
        [("CUR:1",), ("bad",), ("CUR:2",)], "id string")
    df = meta.track(df, "parse", valid=F.col("id").rlike("^[A-Za-z]+:"))
    kept = df.filter(F.col("id").rlike("^[A-Za-z]+:"))
    kept = meta.track(kept, "normalize")
    assert kept.count() == 2  # one action materializes every observation
    out = meta.to_dict()
    assert out["stages"]["parse"] == {"records": 3, "skipped": 1}
    assert out["stages"]["normalize"] == {"records": 2}
    assert out["source_id"] == "demo" and out["version"] == "v1"


def test_yaml_graph_spec_roundtrip(spark, tmp_path):
    """Reference-style YAML spec -> GraphSpec -> built graph."""
    import json

    from data_services_spark.plans.graph_build import load_graph_spec

    for src, rows in (
        ("a", [{"id": "X:1", "name": "one", "category": ["biolink:Gene"]},
               {"id": "X:2", "name": "two", "category": ["biolink:Gene"]}]),
        ("b", [{"id": "X:1", "name": "ONE", "category": ["biolink:Entity"]}]),
    ):
        d = tmp_path / src
        d.mkdir()
        (d / "nodes.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n")
        (d / "edges.jsonl").write_text(json.dumps(
            {"subject": "X:1", "predicate": "biolink:related_to",
             "object": "X:2", "primary_knowledge_source": f"infores:{src}",
             "publications": [f"PMID:{src}"],
             "aggregator_knowledge_sources": []}) + "\n")

    spec_yaml = f"""
graph_id: test_graph
node_scalar_props: [name]
node_list_props: [category]
sources:
  - name: a
    nodes: {tmp_path}/a/nodes.jsonl
    edges: {tmp_path}/a/edges.jsonl
    merge_priority: 1
  - name: b
    nodes: {tmp_path}/b/nodes.jsonl
    edges: {tmp_path}/b/edges.jsonl
    merge_priority: 2
"""
    spec = load_graph_spec(spark, spec_yaml)
    assert spec.graph_id == "test_graph"
    assert [s.name for s in spec.sources] == ["a", "b"]

    nodes, edges = build_graph(spec)
    got = {r.id: r for r in nodes.collect()}
    assert got["X:1"].name == "one"  # priority 1 wins
    assert sorted(got["X:1"].category) == ["biolink:Entity", "biolink:Gene"]
    e = edges.collect()
    assert len(e) == 2  # distinct primary_knowledge_source -> no merge


def test_pagerank_star_center_dominates(spark):
    from data_services_spark.operators.components import pagerank
    # undirected star: center 0 <-> leaves 1..8
    pairs = [(0, i) for i in range(1, 9)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long")
    ranks = {r.node: r["rank"] for r in pagerank(edges, iterations=4).collect()}
    assert len(ranks) == 9
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0)
    # leaves are symmetric -> identical ranks
    leaf = {v for k, v in ranks.items() if k != 0}
    assert len(leaf) == 1
    # rank mass is conserved (no dangling nodes): sum == n up to quantization
    assert abs(sum(ranks.values()) - 9.0) < 1e-3
    # deterministic across repartitioned input
    again = {r.node: r["rank"]
             for r in pagerank(edges.repartition(7), iterations=4).collect()}
    assert again == ranks
