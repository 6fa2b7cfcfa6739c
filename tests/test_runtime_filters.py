"""Runtime bloom-filter join pruning (SCALE.md posture): for a selective
fact⋈fact shuffle join, Spark injects a bloom filter built from the
selective side and applies `might_contain` on the probe side's scan —
rows that cannot match are dropped BEFORE the shuffle. At the 100 TB
design point this is the difference between shuffling the full probe
fact table and shuffling only the ~matching fraction.

The optimizer is ON by default (`spark.sql.optimizer.runtime.bloomFilter.
enabled`, Spark 3.5+), but its size thresholds target cluster volumes
(probe scan > 10GB); this test lowers them so the injection is observable
at fixture scale, proving the engine's plans compose with it — no query
rewrite needed.
"""

from __future__ import annotations

import pytest

from data_services_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def bloom_confs(spark, monkeypatch):
    # configure_session (re-run by every load_table) re-applies the
    # broadcast threshold from $SPARK_GRAFT_BCAST_BYTES — patch the env,
    # not just the conf, or the threshold snaps back mid-test.
    monkeypatch.setenv("SPARK_GRAFT_BCAST_BYTES", "-1")
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # probe side must look "big enough to benefit" at fixture scale
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # keep the join a SHUFFLE join: bloom pruning never applies to
        # broadcast joins (the hash relation already prunes exactly)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    monkeypatch.delenv("SPARK_GRAFT_BCAST_BYTES")
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_prunes_probe_side(spark, bloom_confs):
    lineitem = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    selective = orders.filter("o_orderpriority = '1-URGENT'") \
                      .select("o_orderkey", "o_orderdate")
    joined = lineitem.join(selective,
                           lineitem.l_orderkey == selective.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:2000]

    # and the pruned plan still returns exactly the join's rows
    expect = (lineitem.join(selective.hint("broadcast"),
                            lineitem.l_orderkey == selective.o_orderkey)
              .count())
    assert joined.count() == expect
