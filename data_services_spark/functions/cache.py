"""The ONE-SLOT persist device, shared by every operator that derives
an expensive intermediate read by multiple plan branches (bm25's
per-doc tf, bigram/dsir token streams, the PPJoin ordered-array
relation): at most one cached relation alive per registry (each call
releases the previous call's), eviction degrades to recomputation —
never a spill — and release is safe any time, including after the
owning SparkSession stopped (the blocks died with it; a failing
JVM-side unpersist is swallowed). Previously returned results stay
correct; they just recompute instead of reading cache.

Extracted in round 9: four verbatim copies of this ~10-line pattern
had accumulated (review finding), and its subtleties — pop-then-
swallow, MEMORY_ONLY by default — are load-bearing enough to live in
exactly one place.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def release_slot(cache: list[DataFrame]) -> None:
    """Unpersist and drop everything in ``cache`` (normally 0/1 entry)."""
    while cache:
        df = cache.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - dead-session cache is gone
            pass


def persist_slot(cache: list[DataFrame], df: DataFrame,
                 level: StorageLevel = StorageLevel.MEMORY_ONLY
                 ) -> DataFrame:
    """Release the previous occupant, persist ``df``, record it."""
    release_slot(cache)
    df = df.persist(level)
    cache.append(df)
    return df
