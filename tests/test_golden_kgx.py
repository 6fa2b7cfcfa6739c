"""Golden KGX fixture (SURVEY §5.4): a hand-written two-source graph with
fully known merged output, asserted exactly after canonical sort."""

from __future__ import annotations

from data_services_spark.operators.merge import merge_edges, merge_nodes

NODE_SCHEMA = ("id string, name string, category array<string>, "
               "source_rank int")
EDGE_SCHEMA = ("subject string, predicate string, object string, "
               "primary_knowledge_source string, publications array<string>, "
               "aggregator_knowledge_sources array<string>, source_rank int")

# source A (rank 1 — wins conflicts), source B (rank 2)
NODES = [
    ("CHEBI:1", "aspirin", ["biolink:ChemicalEntity"], 1),
    ("CHEBI:1", "ASA", ["biolink:Drug"], 2),
    ("NCBIGene:10", None, ["biolink:Gene"], 1),
    ("NCBIGene:10", "PTGS2", ["biolink:Gene"], 2),
    ("MONDO:5", "headache", [], 1),
]
EDGES = [
    ("CHEBI:1", "biolink:affects", "NCBIGene:10", "infores:a",
     ["PMID:1"], ["infores:agg1"], 1),
    ("CHEBI:1", "biolink:affects", "NCBIGene:10", "infores:a",
     ["PMID:2", "PMID:1"], ["infores:agg2"], 2),
    ("CHEBI:1", "biolink:treats", "MONDO:5", "infores:b",
     ["PMID:3"], [], 1),
]

GOLDEN_NODES = [
    # id, name, category (sorted-distinct), n_merged
    ("CHEBI:1", "aspirin", ["biolink:ChemicalEntity", "biolink:Drug"], 2),
    ("MONDO:5", "headache", [], 1),
    # rank-1 name is NULL -> first non-null by rank is rank 2's
    ("NCBIGene:10", "PTGS2", ["biolink:Gene"], 2),
]
GOLDEN_EDGES = [
    ("CHEBI:1", "biolink:affects", "NCBIGene:10", "infores:a",
     ["PMID:1", "PMID:2"], ["infores:agg1", "infores:agg2"], 2),
    ("CHEBI:1", "biolink:treats", "MONDO:5", "infores:b",
     ["PMID:3"], [], 1),
]


def test_golden_node_merge(spark):
    out = merge_nodes(spark.createDataFrame(NODES, NODE_SCHEMA))
    got = [(r.id, r.name, r.category, r.n_merged)
           for r in out.orderBy("id").collect()]
    assert got == GOLDEN_NODES


def test_golden_edge_merge(spark):
    out = merge_edges(spark.createDataFrame(EDGES, EDGE_SCHEMA))
    got = [(r.subject, r.predicate, r.object, r.primary_knowledge_source,
            r.publications, r.aggregator_knowledge_sources, r.n_merged)
           for r in out.orderBy("subject", "predicate", "object").collect()]
    assert got == GOLDEN_EDGES
