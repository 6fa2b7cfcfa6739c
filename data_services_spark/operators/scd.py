"""Slowly-changing-dimension type-2 merge (MERGE INTO semantics as a
batch operator).

The reference pipeline rebuilds graph state wholesale per run; real
warehouse upkeep is incremental: an update batch closes out changed
dimension rows (stamping ``valid_to``) and opens new versions, leaving
untouched history byte-identical. This is the batch twin of the bucketed
streaming upsert (streaming/ingest.py) — same O(delta) intent, here as a
pure DataFrame transform whose output is the full next state.

Scale shape: ONE shuffled (or broadcast, when the batch is small) full
outer join between the open rows and the update batch on the key;
closed history never joins anything — it unions through untouched. At
100 TB pair this with partition-by-key-bucket storage so only buckets
containing updated keys rewrite (plans/bucketing.py), exactly like the
streaming sink.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def scd2_merge(state: DataFrame, updates: DataFrame,
               key_cols: Sequence[str], tracked_cols: Sequence[str],
               eff_col: str = "eff_ms",
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Apply one SCD2 update batch and return the full next state.

    ``state`` rows carry ``key_cols + tracked_cols + valid_from +
    valid_to`` with epoch-ms BIGINT validity bounds, ``valid_to`` NULL
    marking the open (current) version. ``updates`` carries ``key_cols +
    tracked_cols + eff_col`` with at most one row per key (the caller
    dedups — last-writer-wins belongs to the batch builder, not here).

    Per key: an update whose tracked values all match the open row is a
    no-op; a differing update closes the open row at ``eff_col`` and
    opens a new version; a key with no open row inserts its first
    version. Keys without updates, and all already-closed history rows,
    pass through unchanged.
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    out_cols = [*keys, *tracked, valid_from, valid_to]

    hist = state.filter(F.col(valid_to).isNotNull()).select(*out_cols)
    open_rows = state.filter(F.col(valid_to).isNull())

    s = open_rows.alias("s")
    u = updates.alias("u")
    j = s.join(u, keys, "full_outer")

    has_open = F.col(f"s.{valid_from}").isNotNull()
    has_upd = F.col(f"u.{eff_col}").isNotNull()
    # null-safe inequality on any tracked column = a real change
    diff = F.lit(False)
    for c in tracked:
        diff = diff | ~F.col(f"s.{c}").eqNullSafe(F.col(f"u.{c}"))
    changed = has_open & has_upd & diff

    # open rows that survive as-is: no update, or a no-op update
    keep_open = j.filter(has_open & ~changed).select(
        *keys, *[F.col(f"s.{c}").alias(c) for c in tracked],
        F.col(f"s.{valid_from}").alias(valid_from),
        F.col(f"s.{valid_to}").alias(valid_to))
    # changed: the old version closes at the update's effective time
    closed = j.filter(changed).select(
        *keys, *[F.col(f"s.{c}").alias(c) for c in tracked],
        F.col(f"s.{valid_from}").alias(valid_from),
        F.col(f"u.{eff_col}").cast("long").alias(valid_to))
    # changed or brand-new: a fresh open version from the update values
    opened = j.filter(changed | (has_upd & ~has_open)).select(
        *keys, *[F.col(f"u.{c}").alias(c) for c in tracked],
        F.col(f"u.{eff_col}").cast("long").alias(valid_from),
        F.lit(None).cast("long").alias(valid_to))

    return hist.unionByName(keep_open).unionByName(closed) \
        .unionByName(opened)
