"""Numeric helpers with *deterministic* semantics.

Floating-point SUM is order-dependent, and Spark's shuffle order differs
from DuckDB's scan order — so a naive ``SUM(double)`` can hash-mismatch the
oracle at the last ulp. The engine therefore defines its aggregate sum at a
fixed 1e-6 quantization and accumulates **exactly** via an integer/fraction
long pair:

    ip = floor(x)                         -- integer part, unscaled
    fp = floor((x - floor(x)) * 1e6 + 0.5) -- fractional micros, half-up
    dsum(x) = sum(ip) + sum(fp) / 1e6

Both partial sums are plain LONG aggregates — order-independent, exact, and
fully inside Tungsten whole-stage codegen (no per-row BigDecimal
allocation, which benchmarked ~5x slower). Overflow headroom: the unscaled
integer sum holds ~9.2e18, fine for petabyte-scale fact tables; the
fractional sum grows at most 1e6 per row (~9e12 rows). The oracle SQL
mirrors the identical expression, so both engines produce the same IEEE754
double bit-for-bit regardless of execution order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MICROS = 1_000_000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def idiv(num: Column, den: int) -> Column:
    """Integral division matching DuckDB's ``//`` on BIGINTs exactly.

    Both Spark's ``div`` (IntegralDivide) and DuckDB's integer ``//``
    truncate toward zero (probed 2026-08-14: ``-3 div 2 = -1`` in Spark,
    ``-3 // 2 = -1`` in DuckDB), so the two agree on every input including
    pre-1970 epochs. Pure LONG arithmetic — unlike ``(x / n).cast("long")``
    there is no double rounding step, so it stays exact for |num| >= 2^53
    (epochs past year ~2255) where correctly-rounded double division can
    land within 1e-3 of an integer boundary.
    """
    return F.call_function("div", num, F.lit(den))


def epoch_ms(col: Column | str) -> Column:
    """Event time as epoch-millisecond LONG, bit-identical to DuckDB's
    ``epoch_ms(ts)`` (which also truncates micros toward zero).

    The ``cast("timestamp")`` converts NTZ parquet timestamps to LTZ under
    the UTC session tz (a no-op re-tagging); ``unix_micros`` rejects NTZ
    input directly.
    """
    c = _c(col)
    return idiv(F.unix_micros(c.cast("timestamp")), 1000)


def epoch_s(col: Column | str) -> Column:
    """Event time as epoch-second LONG (truncating, DuckDB-identical)."""
    c = _c(col)
    return idiv(F.unix_micros(c.cast("timestamp")), MICROS)


def _ip(c: Column) -> Column:
    return F.floor(c)


def _fp(c: Column) -> Column:
    return F.floor((c - F.floor(c).cast("double")) * MICROS + F.lit(0.5)) \
        .cast("long")


def dsum_expr(col: Column | str) -> Column:
    c = _c(col)
    return (F.sum(_ip(c)).cast("double")
            + F.sum(_fp(c)).cast("double") / F.lit(float(MICROS)))


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double column (1e-6 quantized), as double."""
    out = dsum_expr(col)
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic average: exact quantized sum, one double division."""
    c = _c(col)
    out = dsum_expr(c) / F.count(c)
    return out.alias(alias) if alias else out


def dmoney(expr: Column, alias: str | None = None) -> Column:
    """dsum over a computed money expression (e.g. price*(1-discount)); the
    expression evaluates row-wise in double (identical everywhere), then
    accumulates exactly."""
    return dsum(expr, alias)


# --- Oracle-side (DuckDB) equivalents for building matching SQL strings ----

def sql_dsum_expr(e: str) -> str:
    return (f"(CAST(SUM(CAST(floor({e}) AS BIGINT)) AS DOUBLE)"
            f" + CAST(SUM(CAST(floor(({e} - floor({e})) * 1000000 + 0.5)"
            f" AS BIGINT)) AS DOUBLE) / 1000000.0)")


def sql_dsum(e: str, a: str) -> str:
    return f"{sql_dsum_expr(e)} AS {a}"


def sql_davg(e: str, a: str) -> str:
    return f"{sql_dsum_expr(e)} / COUNT({e}) AS {a}"
