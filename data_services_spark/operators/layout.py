"""Data-layout operators: Z-order clustering and min/max file skipping.

At 100 TB the dominant read cost is often not scanning but *deciding
what not to scan*: parquet keeps per-row-group min/max statistics, and a
query engine (Spark's parquet filter pushdown, or any other reader)
skips row groups whose [min, max] cannot satisfy the predicate. A table
sorted on ONE key skips beautifully on that key and not at all on any
other; Z-ORDER interleaves the bits of several keys so that files stay
*range-local in every dimension at once* — the multi-dimensional
clustering Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort orders
provide.

Spark-first shape:
- the Z-value is pure JVM integer arithmetic (one ``F.expr`` parse, no
  UDF): per column, an exact integer range-normalization
  ``(v - min) * (2^bits - 1) DIV (max - min)`` (floor division — no
  float rounding to diverge across engines), then bit interleaving;
- column mins/maxes come from a broadcast 1-row aggregate crossJoin —
  never a driver-side ``collect`` (two-pass winsorize shape, so the
  whole computation stays one lazy plan);
- the write clusters with ``repartitionByRange(zkey)`` (range exchange
  = each output file owns a contiguous Z-range) plus
  ``sortWithinPartitions`` (row groups inside a file are Z-local too);
- :func:`rowgroup_skipping_stats` reads back parquet FOOTERS ONLY
  (pyarrow metadata, no data pages) and reports how many row groups a
  given range predicate would skip — the measurable payoff.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _norm_expr(col: str, bits: int) -> str:
    """Exact integer range-normalization of `col` into [0, 2^bits):
    SQL-string form shared by the Spark expression and (modulo DIV
    spelling and the decimal widening) the DuckDB oracle. max==min
    degenerates to 0.

    The multiply routes through DECIMAL(38,0): a BIGINT
    ``(v - min) * top`` overflows int64 once the column range exceeds
    ~2^47 (snowflake-style or hash-derived ids) — throwing under
    Spark 4's default ANSI mode, silently wrapping into wrong zkeys
    with ANSI off (round-6 advisor). decimal128 holds the full
    int64-range product exactly ((2^64)·65535 ≈ 10^24 « 10^38), and
    integral DIV of decimals is exact and returns BIGINT, so the
    result is bit-identical to the int64 formula wherever that one was
    valid, and correct (not wrapped) everywhere else."""
    top = (1 << bits) - 1
    mn, mx = f"__mn_{col}", f"__mx_{col}"
    return (f"CASE WHEN {mx} = {mn} THEN CAST(0 AS BIGINT) "
            f"ELSE (CAST({col} AS DECIMAL(38,0)) - {mn}) * {top} "
            f"DIV (CAST({mx} AS DECIMAL(38,0)) - {mn}) END")


def _interleave_expr(norms: list[str], bits: int) -> str:
    """OR together bit b of normalized column i at position b*k + i —
    the textbook Morton/Z-curve interleave, as one SQL expression
    (bits*k shift-mask-shift terms; 2 cols x 16 bits = 32 terms, well
    inside whole-stage codegen's comfort zone)."""
    k = len(norms)
    terms = []
    for b in range(bits):
        for i, n in enumerate(norms):
            terms.append(f"shiftleft(shiftright({n}, {b}) & 1, {b * k + i})")
    return " | ".join(terms)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append a ``zkey`` BIGINT column: the Z-curve (Morton) interleave
    of `cols`, each range-normalized to `bits` bits against its own
    min/max. Integer-valued numeric columns only (the exact-arithmetic
    contract; floats would need a quantization step first).

    One broadcast 1-row min/max aggregate + one map-side projection —
    no shuffle of `df` itself, so this composes with any downstream
    partitioning choice."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} columns x {bits} bits = {bits * len(cols)} "
            "interleaved bits does not fit a signed 64-bit zkey; "
            "lower bits")
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("long").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"__mx_{c}"))
    ranges = df.agg(*aggs)
    norms = [_norm_expr(c, bits) for c in cols]
    z = F.expr(_interleave_expr(norms, bits)).cast("long").alias("zkey")
    out = df.crossJoin(F.broadcast(ranges)).select(*df.columns, z)
    return out


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 bits: int = 16, num_files: int = 8) -> None:
    """Write `df` as parquet clustered on the Z-curve of `cols`:
    ``repartitionByRange(num_files, zkey)`` gives each file a contiguous
    Z-range (range exchange samples the zkey distribution, so skewed
    key spaces still split evenly), and ``sortWithinPartitions`` makes
    row groups inside each file Z-local. The zkey itself is dropped
    from the output — it is a layout device, not data."""
    keyed = zorder_key(df, cols, bits)
    (keyed.repartitionByRange(num_files, "zkey")
     .sortWithinPartitions("zkey")
     .drop("zkey")
     .write.mode("overwrite").parquet(path))


def linear_write(df: DataFrame, path: str, col: str,
                 num_files: int = 8) -> None:
    """Single-key clustered write (the baseline Z-order is measured
    against): range partition + sort on one column."""
    (df.repartitionByRange(num_files, col)
     .sortWithinPartitions(col)
     .write.mode("overwrite").parquet(path))


def rowgroup_skipping_stats(path: str, predicates: dict[str, tuple]) -> dict:
    """Footer-only skipping report: of all row groups under `path`, how
    many could a reader PROVE irrelevant to ``col BETWEEN lo AND hi``
    conjunctions from min/max statistics alone?

    Reads parquet metadata via pyarrow (no data pages — this is the
    planning cost a real scan pays). Returns ``{"row_groups",
    "skipped_row_groups", "files", "skipped_files", "skip_fraction"}``.
    Driver-side by design: it inspects O(files x row-groups) metadata,
    the same footprint Spark's own scan planning holds on the driver.
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    dataset = pads.dataset(path, format="parquet")
    total_rg = skipped_rg = total_f = skipped_f = 0
    for frag in dataset.get_fragments():
        md = pq.ParquetFile(frag.path).metadata
        total_f += 1
        file_all_skipped = md.num_row_groups > 0
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total_rg += 1
            cols = {rg.column(i).path_in_schema: rg.column(i).statistics
                    for i in range(rg.num_columns)}
            skip = False
            for col, (lo, hi) in predicates.items():
                st = cols.get(col)
                if st is None or not st.has_min_max:
                    continue
                if st.min > hi or st.max < lo:
                    skip = True  # provably disjoint on this conjunct
                    break
            if skip:
                skipped_rg += 1
            else:
                file_all_skipped = False
        if file_all_skipped:
            skipped_f += 1
    return {"row_groups": total_rg, "skipped_row_groups": skipped_rg,
            "files": total_f, "skipped_files": skipped_f,
            "skip_fraction": (skipped_rg / total_rg) if total_rg else 0.0}
