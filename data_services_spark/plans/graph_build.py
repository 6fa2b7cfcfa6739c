"""Graph-spec-driven multi-source build — the engine's equivalent of the
reference's EP2 entry point (`python Common/build_manager.py build <graph>`;
`[R: Common/build_manager.py — GraphBuilder, Common/kgx_file_merger.py —
KGXFileMerger, Common/kgxmodel.py — GraphSpec dataclasses — unverified]`,
SURVEY §3).

A graph spec names sources, gives each a merge priority (arrival rank) and a
merge strategy:

- ``default``: union the source into the graph, node-merge (A1) + edge-merge
  (A2) resolving conflicts by rank;
- ``connected_edge_subset``: admit the source's edges only where BOTH
  endpoints already exist in the merged node set (J3) — secondary literature
  sources must not introduce new nodes.

The reference merges sources sequentially file-by-file; here the build is a
single declarative plan: all 'default' sources union once and merge in one
shuffle, then each connected_edge_subset source filters with two semi joins
against the merged node ids. Normalization (J1) runs per-source before the
merge when a node map is supplied, mirroring EP1's normalize stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from data_services_spark.operators.merge import merge_edges, merge_nodes
from data_services_spark.operators.normalize import normalize_edges
from data_services_spark.operators.subset import connected_edge_subset


@dataclass
class GraphSource:
    """One source in a graph spec (nodes + edges DataFrames, KGX schema)."""
    name: str
    nodes: DataFrame
    edges: DataFrame
    merge_priority: int = 1
    merge_strategy: str = "default"  # or "connected_edge_subset"


@dataclass
class GraphSpec:
    graph_id: str
    sources: list[GraphSource] = field(default_factory=list)
    node_scalar_props: tuple[str, ...] = ("name",)
    node_list_props: tuple[str, ...] = ("category",)


def load_graph_spec(spark, yaml_text_or_path: str) -> GraphSpec:
    """Parse a reference-style YAML graph spec into a :class:`GraphSpec`
    `[R: graph_specs/default-graph-spec.yml — unverified]`.

    Expected shape::

        graph_id: my_graph
        node_scalar_props: [name]          # optional
        node_list_props: [category]        # optional
        sources:
          - name: src1
            nodes: /data/src1/nodes.jsonl  # KGX JSONL paths
            edges: /data/src1/edges.jsonl
            merge_priority: 1              # optional (spec order default)
            merge_strategy: default        # or connected_edge_subset

    PyYAML is an optional dependency (import-gated); the dataclass API
    works without it.
    """
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise ImportError("YAML graph specs need pyyaml; construct "
                          "GraphSpec/GraphSource directly instead") from e
    from data_services_spark.sources.kgx import (
        read_kgx_edges, read_kgx_nodes,
    )

    if "\n" not in yaml_text_or_path:
        with open(yaml_text_or_path) as fh:
            raw = yaml.safe_load(fh)
    else:
        raw = yaml.safe_load(yaml_text_or_path)

    sources = [
        GraphSource(
            name=s["name"],
            nodes=read_kgx_nodes(spark, s["nodes"]),
            edges=read_kgx_edges(spark, s["edges"]),
            merge_priority=int(s.get("merge_priority", i + 1)),
            merge_strategy=s.get("merge_strategy", "default"),
        )
        for i, s in enumerate(raw["sources"])
    ]
    spec = GraphSpec(graph_id=raw["graph_id"], sources=sources)
    if "node_scalar_props" in raw:
        spec.node_scalar_props = tuple(raw["node_scalar_props"])
    if "node_list_props" in raw:
        spec.node_list_props = tuple(raw["node_list_props"])
    return spec


def build_graph(spec: GraphSpec,
                node_map: DataFrame | None = None
                ) -> tuple[DataFrame, DataFrame]:
    """Assemble a named graph per spec; returns (nodes, edges) merged frames.

    Every source row is stamped with the source's merge priority as its
    ``source_rank`` so first-wins conflicts resolve by spec order,
    deterministically, in one shuffle (SURVEY §4 hard-part 1).
    """
    default = [s for s in spec.sources if s.merge_strategy == "default"]
    subset = [s for s in spec.sources
              if s.merge_strategy == "connected_edge_subset"]
    # compare by strategy string, never by GraphSource equality — the
    # dataclass __eq__ would compare DataFrame fields, and
    # DataFrame.__eq__ yields a Column (non-boolean)
    unknown = [s.name for s in spec.sources
               if s.merge_strategy not in ("default",
                                           "connected_edge_subset")]
    if unknown:
        raise ValueError(f"unknown merge_strategy for sources: {unknown}")
    if not default:
        raise ValueError("graph spec needs at least one 'default' source")

    def stamp(df: DataFrame, rank: int) -> DataFrame:
        return df.withColumn("source_rank", F.lit(rank).cast("int"))

    def norm(edges: DataFrame) -> DataFrame:
        if node_map is None:
            return edges
        return normalize_edges(edges, node_map).drop(
            "subject_normalized", "object_normalized")

    nodes_u = None
    edges_u = None
    for s in default:
        n, e = stamp(s.nodes, s.merge_priority), stamp(norm(s.edges),
                                                       s.merge_priority)
        nodes_u = n if nodes_u is None else nodes_u.unionByName(
            n, allowMissingColumns=True)
        edges_u = e if edges_u is None else edges_u.unionByName(
            e, allowMissingColumns=True)

    merged_nodes = merge_nodes(nodes_u,
                               scalar_props=spec.node_scalar_props,
                               list_props=spec.node_list_props)

    # Round 14 (guide §1.2 "don't compute things you throw away"):
    # admission needs the merged node ID SET only — which is exactly
    # the distinct ids of the pre-merge union (the merge groups by id,
    # so the id sets are identical by construction; the DuckDB oracle
    # says the same thing: `node_ids AS (SELECT DISTINCT id FROM
    # src_nodes)`). Using the merged relation here dragged the whole
    # min_by/list-union property aggregation into the EDGES plan —
    # twice, once per semi-join side (measured: graph_build
    # 3.17 -> 2.22 s at sf0.1; full-row parity at both SFs).
    node_ids = nodes_u.select("id").distinct()
    for s in subset:
        admitted = connected_edge_subset(norm(s.edges), node_ids)
        edges_u = edges_u.unionByName(stamp(admitted, s.merge_priority),
                                      allowMissingColumns=True)

    merged_edges = merge_edges(edges_u)
    return merged_nodes, merged_edges
