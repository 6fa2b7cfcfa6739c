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

# Every slot list ever handed to persist_slot (round 14, r13 ADVICE):
# a slot used to stay pinned until the SAME query ran again, so e.g.
# corpus_curate's full-text survivor relation sat in executor memory
# for the rest of the session. The registry now calls
# release_all_slots() at the START of every fresh query build — the
# next query frees every predecessor's cache, each query still fills
# (and pays for) its own slots inside its timed region, and re-executing
# an already-built plan (bench marginal reps) never triggers a release.
_ALL_SLOTS: list[list[DataFrame]] = []


def release_all_slots() -> None:
    """Release every registered slot (see _ALL_SLOTS rationale)."""
    for cache in _ALL_SLOTS:
        release_slot(cache)


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
    # identity, not ==: distinct empty slot lists compare value-equal
    if not any(c is cache for c in _ALL_SLOTS):
        _ALL_SLOTS.append(cache)
    release_slot(cache)
    df = df.persist(level)
    cache.append(df)
    return df
