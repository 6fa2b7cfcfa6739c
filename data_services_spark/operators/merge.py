"""KGX graph merge — the core operator family of the reference pipeline.

Reference semantics (reconstructed; `[R: Common/merging.py —
GraphMerger.merge_nodes/merge_edges — unverified]`, see SURVEY.md §2.4 A1/A2):

- nodes group by ``id``; duplicate nodes merge with *first-wins* scalars
  (arrival order) and *set-union* list properties;
- edges group by ``(subject, predicate, object, primary_knowledge_source)``
  with the same scalar/list rules (publications & aggregator sources union).

The reference's arrival-order "first wins" is nondeterministic under a Spark
shuffle, so the engine makes rank explicit: every source row carries a
``source_rank`` (priority) column and scalars resolve via ``min_by(value,
rank)`` restricted to non-null values. This keeps the whole merge inside
Tungsten-codegen built-ins — no Python, one shuffle on the merge key. List
props are unioned then sorted so results are order-insensitive.

The reference's separate in-memory vs on-disk merge paths (`[R:
Common/merging.py — MemoryGraphMerger/DiskGraphMerger — unverified]`, an
external chunk-sort + heapq k-way merge) collapse into this single
``groupBy``: Spark's hash aggregate spills automatically, which is exactly
what DiskGraphMerger hand-rolls.

Scale: the merge key is the shuffle key; biomedical graphs are heavy-tailed
(hub nodes), but the *group key* here is the node id itself, so groups stay
small — skew shows up in joins (see normalize.py), not in this agg.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

NODE_KEY = ("id",)
EDGE_KEY = ("subject", "predicate", "object", "primary_knowledge_source")


def first_by_rank(value: Column | str, rank: Column | str) -> Column:
    """First non-null `value` by ascending `rank` — deterministic 'first wins'.

    Rows where `value` is null get a null ordering key, which ``min_by``
    skips (mirrors DuckDB ``arg_min`` semantics, so oracle SQL matches).
    """
    v = F.col(value) if isinstance(value, str) else value
    r = F.col(rank) if isinstance(rank, str) else rank
    return F.min_by(v, F.when(v.isNotNull(), r))


def union_lists(col: Column | str) -> Column:
    """Set-union of array-typed property across merged rows, sorted for
    order-insensitive comparison.

    ``collect_set`` rather than ``collect_list`` (round 14, guide §2.3
    "aggregate before you shuffle"): the partial-aggregate buffer is a
    SET, so duplicate property arrays within a map partition are dropped
    BEFORE the exchange — collect_list shipped every row's array
    un-combined. Value-identical by construction: dropping duplicate
    arrays cannot change the union of their elements, and
    array_distinct + array_sort canonicalize the rest (measured:
    graph_build 3.37 -> 3.16 s warm noop at sf0.1; full-row parity on
    kgx_node_merge / graph_build / graph_build_nodes at sf0.1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_sort(F.array_distinct(F.flatten(F.collect_set(c))))


def _merge(df: DataFrame, key: Sequence[str], scalar_props: Sequence[str],
           list_props: Sequence[str], rank_col: str,
           count_alias: str) -> DataFrame:
    aggs = [first_by_rank(p, rank_col).alias(p) for p in scalar_props]
    aggs += [union_lists(p).alias(p) for p in list_props]
    aggs.append(F.count(F.lit(1)).alias(count_alias))
    return df.groupBy(*key).agg(*aggs)


def merge_nodes(nodes: DataFrame,
                scalar_props: Sequence[str] = ("name",),
                list_props: Sequence[str] = ("category",),
                rank_col: str = "source_rank",
                count_alias: str = "n_merged") -> DataFrame:
    """A1 node merge: one row per node id with merged properties."""
    return _merge(nodes, NODE_KEY, scalar_props, list_props, rank_col, count_alias)


def merge_edges(edges: DataFrame,
                scalar_props: Sequence[str] = (),
                list_props: Sequence[str] = ("publications",
                                             "aggregator_knowledge_sources"),
                rank_col: str = "source_rank",
                count_alias: str = "n_merged") -> DataFrame:
    """A2 edge merge: one row per (s, p, o, primary_knowledge_source)."""
    return _merge(edges, EDGE_KEY, scalar_props, list_props, rank_col, count_alias)
