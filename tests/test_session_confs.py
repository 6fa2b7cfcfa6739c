"""Session-configuration contract: the env-tunable knobs must actually
land in the SQL conf (bench.py and cluster deploys depend on them)."""

from __future__ import annotations

import os


def test_bcast_threshold_env_override(spark, monkeypatch):
    from data_services_spark.session import configure_session

    monkeypatch.setenv("SPARK_GRAFT_BCAST_BYTES", str(12 * 1024 * 1024))
    configure_session(spark)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == \
        str(12 * 1024 * 1024)
    assert spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold") \
        == str(12 * 1024 * 1024)
    # restore the default for other tests in this shared session
    monkeypatch.delenv("SPARK_GRAFT_BCAST_BYTES")
    configure_session(spark)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == \
        str(16 * 1024 * 1024)


def test_aqe_advisory_env_override(spark, monkeypatch):
    from data_services_spark.session import configure_session

    monkeypatch.setenv("SPARK_GRAFT_AQE_ADVISORY_BYTES", str(8_000_000))
    configure_session(spark)
    assert spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes") == "8000000"
    monkeypatch.delenv("SPARK_GRAFT_AQE_ADVISORY_BYTES")
