"""Epoch arithmetic parity on adversarial timestamps.

The registry's `_ms`/`epoch_s` must be bit-identical to the oracle side
(DuckDB ``epoch_ms(ts)`` / ``//``) on inputs the fixtures never contain:

- pre-1970 timestamps with sub-unit remainders (truncation-toward-zero on
  BOTH engines — probed 2026-08-14: Spark ``-3 div 2 = -1``, DuckDB
  ``-3 // 2 = -1``; the old ``(x/1000).cast("long")`` also truncated, so
  values agreed, but only by accident of double rounding);
- |micros| > 2^53, where correctly-rounded double division can land ON an
  integer boundary and the old cast path returned k instead of k-1
  (e.g. 9007199254740999/1000 rounds to exactly 9007199254741.0).

`idiv` is pure LONG arithmetic so neither case can drift.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_services_spark.functions import numeric as nfn

# micros-since-epoch, chosen to hit every truncation corner
ADVERSARIAL_MICROS = [
    -500,                 # -0.5 ms        -> 0 ms, 0 s
    -999_500,             # -999.5 ms      -> -999 ms, 0 s
    -1_000_500,           #                -> -1000 ms, -1 s
    -1_500_000,           # -1.5 s         -> -1500 ms, -1 s
    -3_600_000_001,       # just over -1 h
    0,
    1_500_000,            # +1.5 s
    253_402_300_799_998_999,   # 9999-12-31 23:59:59.998999 — x/1000 double-
                               # rounds UP onto an int (253402300799999.0)
    -62_135_596_799_999_999,   # 0001-01-01 00:00:00.000001-ish mirror: same
                               # misround on the negative side
]


@pytest.fixture(scope="module")
def epoch_table(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("epochs") / "epochs.parquet")
    arr = pa.array(ADVERSARIAL_MICROS, type=pa.timestamp("us"))
    pq.write_table(pa.table({"rid": list(range(len(ADVERSARIAL_MICROS))),
                             "ts": arr}), path)
    return path


def test_epoch_ms_s_parity(spark, epoch_table, duck):
    sdf = (spark.read.parquet(epoch_table)
           .select("rid",
                   nfn.epoch_ms("ts").alias("ms"),
                   nfn.epoch_s("ts").alias("s")))
    got = {r.rid: (r.ms, r.s) for r in sdf.collect()}
    res = duck.execute(
        f"SELECT rid, epoch_ms(ts) AS ms, epoch_ms(ts) // 1000 AS s "
        f"FROM '{epoch_table}' ORDER BY rid").fetchall()
    want = {rid: (ms, s) for rid, ms, s in res}
    assert got == want


def test_idiv_beats_double_cast():
    # Documents WHY idiv exists: the double path misrounds past 2^53.
    x = 253_402_300_799_998_999
    assert int(x / 1000) != x // 1000  # double division rounds up onto int
    assert x // 1000 == 253_402_300_799_998


def test_truncation_composes():
    # trunc(trunc(x/1000)/1000) == trunc(x/1e6) for trunc-toward-zero,
    # so ordering RANGE frames by epoch_ms//1000 (oracle) vs
    # idiv(micros, 1e6) (Spark) is the same key.
    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    for x in ADVERSARIAL_MICROS:
        assert trunc_div(trunc_div(x, 1000), 1000) == trunc_div(x, 1_000_000)
