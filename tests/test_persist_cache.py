"""persist_bounded: the bounded persist registry must deduplicate
semantically identical plans — Spark's CacheManager keys cached data by
canonicalized plan, so duplicate registry entries for one shared
InMemoryRelation turn LRU eviction into unpersisting live data
(measured as a 12x warm-time thrash between two LSH queries sharing
the banded minhash plan at sf10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scdataset_spark.operators import _cache


def _fresh(monkeypatch=None):
    _cache._CACHE.clear()


def test_same_plan_returns_existing_entry(spark):
    _fresh()
    a = spark.range(100).withColumn("v", F.col("id") * 2)
    b = spark.range(100).withColumn("v", F.col("id") * 2)  # equal plan
    pa = _cache.persist_bounded(a)
    pb = _cache.persist_bounded(b)
    assert pb is pa  # deduped: one registry entry, one persisted frame
    assert len(_cache._CACHE) == 1
    assert pb.count() == 100
    _fresh()


def test_distinct_plans_keep_distinct_entries_and_evict_lru(spark):
    _fresh()
    frames = [
        _cache.persist_bounded(spark.range(10 + i).selectExpr(f"id + {i} AS v"))
        for i in range(_cache._CACHE_MAX + 2)
    ]
    assert len(_cache._CACHE) == _cache._CACHE_MAX
    # oldest two evicted, newest survive
    assert frames[0] not in _cache._CACHE and frames[1] not in _cache._CACHE
    assert frames[-1] in _cache._CACHE
    _fresh()


def test_reregistration_refreshes_lru_position(spark):
    _fresh()
    a = _cache.persist_bounded(spark.range(50).selectExpr("id AS v"))
    for i in range(_cache._CACHE_MAX - 1):
        _cache.persist_bounded(spark.range(60 + i).selectExpr(f"id + {100 + i} AS v"))
    # a is now oldest; re-registering an equal plan must refresh it...
    again = _cache.persist_bounded(spark.range(50).selectExpr("id AS v"))
    assert again is a
    # ...so one more distinct frame evicts the SECOND-oldest, not a
    _cache.persist_bounded(spark.range(999).selectExpr("id AS v2"))
    assert a in _cache._CACHE
    _fresh()


def test_same_semantics_different_names_gets_callers_names(spark):
    """sameSemantics ignores output aliases, so the dedupe must re-label
    the cached frame to the caller's names instead of handing back a
    frame with someone else's column names."""
    _fresh()
    a = _cache.persist_bounded(spark.range(20).select((F.col("id") * 3).alias("x")))
    b = _cache.persist_bounded(spark.range(20).select((F.col("id") * 3).alias("y")))
    assert a.columns == ["x"] and b.columns == ["y"]
    assert len(_cache._CACHE) == 1  # still one persisted entry underneath
    assert sorted(r.y for r in b.collect()) == sorted(r.x for r in a.collect())
    _fresh()
