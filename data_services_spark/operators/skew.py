"""Skew mitigation (SURVEY §4 posture item 4: biomedical graphs are
heavy-tailed — hub nodes like `NCBITaxon:9606` concentrate a huge share of
edges on one key).

Two tools, complementing AQE — with the roles sharpened by measurement
(tools/skew_bench.py, round 4; numbers in SCALE.md):

- AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  session.py) handles skewed *sort-merge joins* at runtime — prefer it
  (measured −29% on a 25%-hot 24M-row join vs −24% for salting).
- **Salted aggregation** is for *holistic* aggregates (collect_list/
  collect_set), where it is a MEMORY bound, not a speed-up: list partials
  don't shrink, so the two-phase form re-ships every element (~10%
  slower measured) — but it caps any task's group at
  `rows(hot_key)/n_buckets`, which is what keeps a 10^7-edge hub key
  from OOMing a reducer at the 100 TB design point. Do NOT salt
  algebraic aggregates (sum/count/min/max/min_by): Spark's map-side
  partial aggregation already collapses hot keys to ≤1 row per map task
  before the shuffle, and the second pass is pure overhead.
- **Salted join** is the manual fallback for skewed large-large joins when
  AQE is unavailable: the probe side salts each row, the build side
  replicates each row across all salt buckets.

Salts are deterministic (hash of stable columns, not rand()) so retried
tasks and reruns produce identical partitioning — required for both test
reproducibility and Spark's task-retry correctness under non-deterministic
expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT = "__salt"


def with_salt(df: DataFrame, n_buckets: int,
              from_cols: Sequence[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, n_buckets) hashed from
    `from_cols` (default: all columns)."""
    cols = [F.col(c) for c in (from_cols or df.columns)]
    return df.withColumn(SALT, F.pmod(F.xxhash64(*cols), F.lit(n_buckets))
                         .cast("int"))


def salted_agg(df: DataFrame, keys: Sequence[str],
               partial: Sequence[Column], combine: Sequence[Column],
               n_buckets: int = 32,
               salt_cols: Sequence[str] | None = None) -> DataFrame:
    """Generic two-phase skew-safe aggregation.

    `partial` aggregates run on (keys + salt) — each hot key spreads over
    `n_buckets` reducers; `combine` aggregates merge the per-salt partials
    on keys alone (a shuffle of at most n_buckets rows per key).

    Example (sum + count, i.e. enough for avg):
        salted_agg(df, ["k"],
                   partial=[F.sum("v").alias("s"), F.count("v").alias("c")],
                   combine=[F.sum("s").alias("s"), F.sum("c").alias("c")])
    """
    salted = with_salt(df, n_buckets, salt_cols)
    part = salted.groupBy(*keys, SALT).agg(*partial)
    return part.groupBy(*keys).agg(*combine)


def salted_count(df: DataFrame, keys: Sequence[str],
                 n_buckets: int = 32, out: str = "n") -> DataFrame:
    """Skew-safe COUNT(*) per key group."""
    return salted_agg(
        df, keys,
        partial=[F.count(F.lit(1)).alias("__pc")],
        combine=[F.sum("__pc").cast("long").alias(out)],
        n_buckets=n_buckets)


def salted_join(probe: DataFrame, build: DataFrame, on: str,
                n_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skewed large-large equi join: salt the probe side, replicate the
    build side into every salt bucket, join on (key, salt).

    Replication multiplies the build side by `n_buckets` — use only when
    the build side is too big to broadcast but small enough to replicate,
    and AQE skew splitting is not available. Probe-side columns keep their
    names; build-side key column is dropped (equi semantics).
    """
    # probe salt hashes the full row: it must spread a single hot key value
    p = probe.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]),
                     F.lit(n_buckets)).cast("int"))
    b = (build.withColumn(
            SALT, F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))))
         .withColumn(SALT, F.col(SALT).cast("int")))
    out = p.join(b, [on, SALT], how)
    return out.drop(SALT)
