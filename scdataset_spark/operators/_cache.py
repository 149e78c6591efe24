"""Bounded persist registry for small intermediate frames.

Operators that persist a tiny frame across a self-join (the banded LSH
frames in ``dedup.py`` / ``similarity.py``) register it here: the most
recent few stay cached, older ones are unpersisted — so bench loops and
long sessions running many queries don't accumulate executor storage
until eviction pressure sets in (each frame is small; the bound is
about lifetime, not size).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame

_CACHE: list[DataFrame] = []
# 8 covers the bench's banded-frame query mix without eviction churn
# (round-5 ran more banded queries than the bound of 4 could hold);
# env-overridable for A/B measurement
_CACHE_MAX = int(os.environ.get("SPARK_GRAFT_CACHE_MAX", "8"))
_LOCK = threading.Lock()


def persist_bounded(df: DataFrame) -> DataFrame:
    """Persist ``df``, evicting the least-recently-registered frame
    beyond the bound.  Callers that need a longer lifetime own their own
    persist.

    Re-registering a SEMANTICALLY IDENTICAL plan returns the existing
    entry (refreshed to most-recent) instead of appending a duplicate.
    This is load-bearing, not an optimization: Spark's CacheManager
    keys cached data by canonicalized plan, so two persist() calls on
    equal plans share one InMemoryRelation — if both sat in this list,
    evicting the OLDER one would unpersist the shared data out from
    under the newer one.  Measured: two LSH queries sharing the banded
    minhash plan thrashed exactly this way at sf10 (41 s warm vs 3 s
    once deduped — each run's eviction of the sibling's stale entry
    dropped the relation the run had just materialized).

    Thread-safe (multi-threaded drivers build queries concurrently).
    Eviction is LRU-by-registration, so constructing more than
    ``_CACHE_MAX`` distinct frames before EXECUTING the queries that use
    them can evict a frame whose plan hasn't run yet — correctness is
    preserved (Spark recomputes the lineage), only the cache benefit is
    lost; keep construct→execute cycles short or persist explicitly for
    longer lifetimes."""
    evict = []
    with _LOCK:  # one critical section: a concurrent double-miss would
        # re-create the duplicate-entry hazard this function exists to
        # prevent (sameSemantics/persist are cheap driver-side calls)
        for i, old in enumerate(_CACHE):
            try:
                same = old.sameSemantics(df)
            except Exception:  # e.g. session of `old` already stopped
                continue
            if same:
                _CACHE.append(_CACHE.pop(i))
                if old.columns == df.columns:
                    return old
                # sameSemantics ignores OUTPUT NAMES (verified: plans
                # differing only in a top-level alias compare equal), so
                # hand back the cached frame re-labeled to the caller's
                # names — a zero-cost projection over the shared
                # InMemoryRelation, not a duplicate registry entry
                return old.toDF(*df.columns)
        df = df.persist()
        _CACHE.append(df)
        while len(_CACHE) > _CACHE_MAX:
            evict.append(_CACHE.pop(0))
    for old in evict:
        old.unpersist()
    return df


def widen_if_narrow(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to cluster width ONLY when it is narrower —
    the guard matters in both directions.  Few-split inputs (small
    parquet at test SFs) pin heavy pre-shuffle compute at input-split
    parallelism, so widening pays (measured: jaccard explode 6.6 s ->
    full-width, BENCH_SCALE round 5); but a 100 TB corpus already has
    far more splits than cores, where an unconditional
    ``repartition(width)`` would shuffle the whole payload just to
    COLLAPSE parallelism to core count.

    Narrowness probe, cheapest first: ``inputFiles()`` is a driver-side
    metadata listing — when the lineage reads >= width files there is at
    least one split per file, so the 100 TB path decides "already wide"
    without ever building an RDD DAG.  Only few-file inputs (where the
    lineage is a short scan chain and physical planning is cheap) fall
    back to ``getNumPartitions``, which answers exactly but at the cost
    of planning the frame into an RDD (pre-AQE view; unavailable under
    Spark Connect — acceptable for the local few-file regime it serves)."""
    width = max(8, df.sparkSession.sparkContext.defaultParallelism)
    try:
        if len(df.inputFiles()) >= width:
            return df
    except Exception:  # non-file-backed lineage: fall through to the probe
        pass
    if df.rdd.getNumPartitions() < width:
        df = df.repartition(width)
    return df
