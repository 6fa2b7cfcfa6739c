"""Load metadata — per-stage record/skip counters and build state
(`[R: Common/metadata.py, Common/load_manager.py — record/skipped-record
counters per fetch/parse/normalize stage — unverified]`, SURVEY §2.1 K3 /
§2.4 A4).

The reference increments Python counters row-by-row and writes a metadata
JSON per source. Spark-first: counters ride the existing jobs as
``Observation`` metrics — zero extra passes over the data (a separate
``count()`` per stage would rescan 100 TB per counter).
"""

from __future__ import annotations

import json
import time
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


class LoadMetadata:
    """Collects per-stage metrics across a pipeline run.

    Usage::

        meta = LoadMetadata("ctd", version="2026-08")
        df = meta.track(df, "parse", valid=F.col("id").rlike("^[A-Za-z]+:"))
        ... df feeds later stages ...
        result.write...   # any action materializes the metrics
        meta.to_dict()    # reference-style metadata JSON
    """

    def __init__(self, source_id: str, version: str | None = None):
        self.source_id = source_id
        self.version = version
        self.started_at = time.time()
        self._stages: list[tuple[str, Observation]] = []

    def track(self, df: DataFrame, stage: str,
              valid: Column | None = None) -> DataFrame:
        """Attach counters to `df`; returns the instrumented frame.

        With a `valid` predicate the stage also reports skipped records
        (the reference's skipped_record_counter) — rows failing validity —
        without filtering them (callers decide routing).
        """
        obs = Observation(f"{self.source_id}/{stage}")
        metrics = [F.count(F.lit(1)).alias("records")]
        if valid is not None:
            metrics.append(
                F.sum(F.when(~valid, 1).otherwise(0)).cast("long")
                .alias("skipped"))
        self._stages.append((stage, obs))
        return df.observe(obs, *metrics)

    def to_dict(self) -> dict[str, Any]:
        stages = {}
        for stage, obs in self._stages:
            try:
                stages[stage] = dict(obs.get)
            except Exception:
                stages[stage] = {"records": None}  # stage never materialized
        return {
            "source_id": self.source_id,
            "version": self.version,
            "wall_seconds": round(time.time() - self.started_at, 3),
            "stages": stages,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)
