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
              suffix: str = "_right",
              direction: str = "backward",
              tolerance_seconds: float | None = None) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    `on` key (inclusive at equal timestamps, like DuckDB ASOF JOIN and
    pandas merge_asof):

    - ``direction="backward"`` (default): latest right with rt <= lt;
    - ``direction="forward"``: earliest right with rt >= lt;
    - ``direction="nearest"``: the closer of the two, ties -> backward.

    ``tolerance_seconds`` nulls the match when |lt - rt| exceeds it.
    Left rows with no qualifying right row keep nulls.

    Physical shape: still the union trick — one shuffle on the key, a
    forward pass adds one extra Sort under the same Exchange (descending
    traversal), never a quadratic join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
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
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rt"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
        F.col(right_ts).alias("__rt"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = [*payload_out, "__rt"]
    # Right rows sort before left rows at equal timestamps => inclusive.
    wb = (Window.partitionBy(*on).orderBy(F.col("__t"), F.col("__is_left"))
          .rowsBetween(Window.unboundedPreceding, 0))
    # Descending traversal: rights already seen all have rt >= lt, the
    # last non-null carried is the SMALLEST such rt — nearest forward.
    wf = (Window.partitionBy(*on)
          .orderBy(F.col("__t").desc(), F.col("__is_left"))
          .rowsBetween(Window.unboundedPreceding, 0))

    fills = []
    if direction in ("backward", "nearest"):
        fills += [F.last(F.col(c), ignorenulls=True).over(wb)
                  .alias(f"__b_{c}") for c in carried]
    if direction in ("forward", "nearest"):
        fills += [F.last(F.col(c), ignorenulls=True).over(wf)
                  .alias(f"__f_{c}") for c in carried]
    filled = unioned.select(*unioned.columns, *fills) \
        .filter(F.col("__is_left") == 1)

    # NTZ-robust epoch micros: parquet timestamps read as TIMESTAMP_NTZ
    # under inferTimestampNTZ, and unix_micros only accepts LTZ. The cast
    # is a no-op wall-clock-wise under the UTC session timezone.
    def _us(c: F.Column) -> F.Column:
        return F.unix_micros(c.cast("timestamp"))

    lt_us = _us(F.col("__t"))
    tol_us = (None if tolerance_seconds is None
              else F.lit(int(tolerance_seconds * 1_000_000)))

    def ok(side: str) -> F.Column:
        rt = F.col(f"__{side}_{'__rt'}")
        valid = rt.isNotNull()
        if tol_us is not None:
            gap = (lt_us - _us(rt)) if side == "b" \
                else (_us(rt) - lt_us)
            valid = valid & (gap <= tol_us)
        return valid

    if direction == "backward":
        use_b, use_f = ok("b"), F.lit(False)
    elif direction == "forward":
        use_b, use_f = F.lit(False), ok("f")
    else:
        b_ok, f_ok = ok("b"), ok("f")
        closer_b = ((lt_us - _us(F.col("__b___rt")))
                    <= (_us(F.col("__f___rt")) - lt_us))
        use_b = b_ok & (~f_ok | closer_b)
        use_f = f_ok & ~use_b

    def pick(c: str) -> F.Column:
        out = F.lit(None).cast(right.schema[
            right_payload[payload_out.index(c)]].dataType)
        if direction in ("forward", "nearest"):
            out = F.when(use_f, F.col(f"__f_{c}")).otherwise(out)
        if direction in ("backward", "nearest"):
            out = F.when(use_b, F.col(f"__b_{c}")).otherwise(out)
        return out.alias(c)

    return filled.select(
        *on, F.col("__t").alias(left_ts),
        *[c for c in lcols if c not in on and c != left_ts],
        *[pick(c) for c in payload_out])


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
