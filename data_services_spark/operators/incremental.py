"""Incremental aggregate maintenance: update a materialized rollup from
a delta batch without rescanning the base facts.

The reference rebuilds its per-source summaries from scratch on every
run `[R: Common/meta_kg.py — unverified]`. At 100 TB the incremental
form is mandatory: keep the GROUP BY result as a STATE table of
mergeable partial aggregates, aggregate only the new rows, and merge
the two by key — cost O(|delta| + |touched state|), never O(|facts|).
This is exactly Spark's own partial/final aggregation contract
(map-side partials merged at the final exchange) lifted to a persisted
table across runs; pair it with the bucketed generational state of
``streaming/ingest.py`` so only touched buckets rewrite.

Mergeable specs supported: ``count``, ``sum``, ``min``, ``max`` —
closed under pairwise merge. ``avg`` is NOT mergeable and must be
derived as sum/count at READ time (`finish_avg`); storing averages in
state is the classic incremental-ETL bug this module's tests pin."""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_INIT = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def agg_state(facts: DataFrame, keys: Sequence[str],
              specs: Mapping[str, tuple[str, str]]) -> DataFrame:
    """Build the state table from scratch: one row per key group, one
    column per spec. ``specs`` maps output column -> (kind, input col),
    e.g. ``{"n": ("count", "*"), "total": ("sum", "value")}``."""
    aggs = []
    for out, (kind, col) in specs.items():
        if kind not in _INIT:
            raise ValueError(f"non-mergeable aggregate kind: {kind!r}")
        c = F.lit(1) if col == "*" else F.col(col)
        aggs.append(_INIT[kind](c).alias(out))
    return facts.groupBy(*keys).agg(*aggs)


def merge_agg_state(state: DataFrame, delta: DataFrame,
                    keys: Sequence[str],
                    specs: Mapping[str, tuple[str, str]]) -> DataFrame:
    """Fold a delta batch of RAW FACTS into an existing state table.

    The delta is first aggregated to partials (tiny — one row per
    touched key), then outer-merged with the state by key: both present
    -> pairwise merge, delta-only -> new group, state-only -> carried
    through untouched. The base facts are never read. With the state
    bucketed by key, the join on the bucket key is exchange-free and
    only touched buckets rewrite."""
    d = agg_state(delta, keys, specs)
    s = state.select(*keys, *[F.col(o).alias(f"__s_{o}") for o in specs])
    d = d.select(*keys, *[F.col(o).alias(f"__d_{o}") for o in specs])
    merged = s.join(d, on=list(keys), how="full")
    cols: list[Column] = [F.col(k) for k in keys]
    for out, (kind, _) in specs.items():
        if kind not in _INIT:
            raise ValueError(f"non-mergeable aggregate kind: {kind!r}")
        a, b = F.col(f"__s_{out}"), F.col(f"__d_{out}")
        if kind in ("count", "sum"):
            # SQL SUM over no/all-NULL rows is NULL; preserve that
            # through the merge instead of manufacturing a zero.
            both = F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
                F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)))
        elif kind == "min":
            both = F.least(a, b)
        else:  # max
            both = F.greatest(a, b)
        cols.append(both.alias(out))
    return merged.select(*cols)


def finish_avg(state: DataFrame, out: str, sum_col: str,
               count_col: str) -> DataFrame:
    """Derive an average at read time from mergeable sum + count state."""
    return state.withColumn(
        out, F.col(sum_col).cast("double") / F.col(count_col))
