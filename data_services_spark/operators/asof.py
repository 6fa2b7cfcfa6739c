"""As-of and range joins (added surface; SURVEY §2.3 J7/J8).

``asof_join`` uses the union trick: interleave both sides ordered by time and
carry the latest right-side payload forward with ``last(..., ignorenulls)``
over an unbounded-preceding window. One shuffle on the key, no quadratic
intermediate — this is the formulation that survives 100 TB, unlike the
naive join + row_number which materializes every (left, right-candidates)
pair first.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_payload: Sequence[str],
              suffix: str = "_right") -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` within the same `on` key (inclusive, like DuckDB
    ASOF JOIN). Left rows with no prior right row keep nulls.
    """
    on = list(on)
    lcols = [c for c in left.columns]
    payload_out = [f"{c}{suffix}" for c in right_payload]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_payload],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal timestamps => inclusive asof.
    w = (Window.partitionBy(*on).orderBy(F.col("__t"), F.col("__is_left"))
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        *unioned.columns,
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(f"__f_{c}")
          for c in payload_out],
    )
    return (filled.filter(F.col("__is_left") == 1)
            .select(*on, F.col("__t").alias(left_ts),
                    *[c for c in lcols if c not in on and c != left_ts],
                    *[F.col(f"__f_{c}").alias(c) for c in payload_out]))


def range_join(left: DataFrame, right: DataFrame, on: Sequence[str],
               left_ts: str, right_ts: str,
               lower: Column, upper: Column) -> DataFrame:
    """J7: equi-join on `on` plus a time-range predicate
    ``left_ts + lower < right_ts <= left_ts + upper``.

    The equi keys make this a shuffled hash/sort-merge join with a residual
    range filter — never a broadcast-nested-loop — so it scales with the
    key cardinality, not |L|x|R|.
    """
    lt = F.col(f"__l.{left_ts}")
    rt = F.col(f"__r.{right_ts}")
    cond = None
    for k in on:
        c = F.col(f"__l.{k}") == F.col(f"__r.{k}")
        cond = c if cond is None else (cond & c)
    cond = cond & (rt > lt + lower) & (rt <= lt + upper)
    return left.alias("__l").join(right.alias("__r"), cond, "inner")
