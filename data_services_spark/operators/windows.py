"""Window and time-window operators (all added surface — the reference
pipeline has no window operator anywhere; SURVEY §2.5/§2.9).

Batch forms here; streaming twins live in ``data_services_spark.streaming``.
Every helper emits epoch-millisecond BIGINT window boundaries rather than raw
timestamps so results compare bit-stably across engines and ns/us precisions.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from data_services_spark.functions.numeric import epoch_ms


def _ms(col: Column | str) -> Column:
    # Integral div (exact, DuckDB-truncation-identical); the cast re-tags
    # NTZ parquet timestamps as LTZ under the UTC session tz.
    return epoch_ms(col)


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    rank_alias: str = "rn") -> DataFrame:
    """W1/W4: row_number top-k. `order_by` must be a total order (add a
    unique tiebreaker) or results are nondeterministic."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn(rank_alias, F.row_number().over(w))
            .filter(F.col(rank_alias) <= k))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """T3 batch sessionization: gap-based session ids via lag + running sum.

    A session breaks when the gap since the previous event exceeds
    `gap_minutes`. Returns input rows + `session_id` (0-based per user).
    Equivalent to ``F.session_window`` grouping but keeps row granularity.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_ms = gap_minutes * 60 * 1000
    prev_ms = F.lag(_ms(ts_col)).over(w)
    new_session = (
        F.when(prev_ms.isNull(), F.lit(0))
        .when(_ms(ts_col) - prev_ms > gap_ms, F.lit(1))
        .otherwise(F.lit(0))
    )
    running = Window.partitionBy(user_col).orderBy(ts_col, "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (events
            .withColumn("__new", new_session)
            .withColumn("session_id", F.sum("__new").over(running).cast("long"))
            .drop("__new"))


def tumbling(events: DataFrame, ts_col: str, duration: str,
             group_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """T1 tumbling window aggregate; emits `window_start_ms` BIGINT."""
    return (events
            .groupBy(F.window(ts_col, duration).alias("__w"), *group_cols)
            .agg(*aggs)
            .withColumn("window_start_ms", _ms(F.col("__w.start")))
            .drop("__w"))


def sliding(events: DataFrame, ts_col: str, duration: str, slide: str,
            group_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """T2 sliding window aggregate; emits `window_start_ms` BIGINT."""
    return (events
            .groupBy(F.window(ts_col, duration, slide).alias("__w"), *group_cols)
            .agg(*aggs)
            .withColumn("window_start_ms", _ms(F.col("__w.start")))
            .drop("__w"))


def scalable_running_sum(df: DataFrame, order_cols: Sequence[str],
                         value: Column | str, out: str,
                         num_partitions: int | None = None) -> DataFrame:
    """Global running sum WITHOUT a single-partition sort — the two-pass
    prefix-sum decomposition for the pattern `SUM(x) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)` that otherwise funnels the whole table
    through one task (token packing, interval sweeps, batch numbering
    all hit it).

    Pass 1: range-partition on `order_cols` (global order preserved
    ACROSS partitions), run the within-partition prefix sum. Pass 2:
    per-partition totals — one tiny row per partition — cumulate on the
    driver-side-sized frame and broadcast back as offsets. The big table
    is touched by exactly one range shuffle and one broadcast join; the
    only single-partition window runs over `num_partitions` rows.

    `order_cols` must be a total order (tie-break explicitly), exactly
    as the single-window form requires for determinism. Exact for
    integer/long values; for doubles feed a quantized column
    (functions/numeric.py) so partial sums are order-independent.
    """
    v = F.col(value) if isinstance(value, str) else value
    oc = [F.col(c) for c in order_cols]
    d = (df.repartitionByRange(num_partitions, *oc) if num_partitions
         else df.repartitionByRange(*oc))
    # CORRECTNESS INVARIANT: the range exchange below has TWO consumers
    # (the offsets aggregate and the final join), and __pid comes from
    # spark_partition_id() — nondeterministic range-boundary sampling
    # means the two branches only agree on __pid if Catalyst instantiates
    # the exchange ONCE (ReusedExchange). Spark canonicalizes both
    # branches to the same exchange today; if a future plan change defeats
    # reuse, offsets would silently mismatch pids. Guarded by a plan
    # assertion (exactly one "Exchange rangepartitioning" + a
    # ReusedExchange) in tests/test_operators.py.
    d = d.withColumn("__pid", F.spark_partition_id())
    w_in = (Window.partitionBy("__pid").orderBy(*oc)
            .rowsBetween(Window.unboundedPreceding, 0))
    t = d.withColumn("__run", F.sum(v).over(w_in))
    w_off = (Window.orderBy("__pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (t.groupBy("__pid").agg(F.sum(v).alias("__tot"))
               .withColumn("__off",
                           F.coalesce(F.sum("__tot").over(w_off),
                                      F.lit(0).cast("long")))
               .select("__pid", "__off"))
    return (t.join(F.broadcast(offsets), "__pid")
            .withColumn(out, F.col("__run") + F.col("__off"))
            .drop("__pid", "__run", "__off"))
