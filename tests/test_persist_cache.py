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


def test_cross_session_entries_never_match(spark):
    """The registry is process-global: an entry registered by a
    DIFFERENT (still-live) session must not be handed to this session
    even when the plans compare sameSemantics — mixing frames across
    sessions misbehaves in some Spark versions."""
    _fresh()
    other = spark.newSession()
    pa = _cache.persist_bounded(other.range(40).selectExpr("id AS v"))
    pb = _cache.persist_bounded(spark.range(40).selectExpr("id AS v"))
    assert pb is not pa
    assert pb.sparkSession is spark and pa.sparkSession is other
    assert len(_cache._CACHE) == 2
    _fresh()


class TestWidenIfNarrowConnectClean:
    """widen_if_narrow must work with NO RDD/SparkContext access (the
    Spark Connect surface): the file-bytes estimator or the
    unconditional-widen fallback decides, never a hard failure."""

    def _sever_classic_api(self, monkeypatch):
        from pyspark.sql import DataFrame, SparkSession

        def _no_rdd(self):
            raise RuntimeError("RDD API unavailable (Spark Connect)")

        def _no_sc(self):
            raise RuntimeError("SparkContext unavailable (Spark Connect)")

        monkeypatch.setattr(DataFrame, "rdd", property(_no_rdd))
        monkeypatch.setattr(SparkSession, "sparkContext", property(_no_sc))

    def test_in_memory_frame_widens_without_rdd(self, spark, monkeypatch):
        self._sever_classic_api(monkeypatch)
        df = spark.range(1000).selectExpr("id", "id * 2 AS v")
        out = _cache.widen_if_narrow(df)
        assert out.count() == 1000  # plans and runs with no RDD access

    def test_jaccard_and_winnowing_run_without_rdd(self, spark, monkeypatch):
        """The two operators that widen internally must stay
        Connect-clean end to end."""
        from scdataset_spark.operators.dedup import (
            jaccard_pairs,
            winnowing_fingerprints,
            with_shingles,
        )

        self._sever_classic_api(monkeypatch)
        _fresh()
        docs = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog " + ("alpha" if i % 2 else "beta"))
             for i in range(30)],
            ["doc_id", "text"],
        )
        pairs = jaccard_pairs(with_shingles(docs), threshold=0.5)
        assert pairs.count() > 0
        fps = winnowing_fingerprints(docs)
        assert fps.count() > 0
        _fresh()

    def test_file_backed_estimate_decides_without_rdd(self, spark, monkeypatch):
        """A small local parquet must take the byte-based estimator path
        (est < width -> repartition) with the classic API severed."""
        from tests.conftest import SF_DIR_SMALL

        from scdataset_spark.catalog import load_table

        cust = load_table(spark, "customer", SF_DIR_SMALL, with_row_id=False)
        self._sever_classic_api(monkeypatch)
        est = _cache._estimate_packed_partitions(spark, cust.inputFiles())
        assert est is not None and est >= 1
        out = _cache.widen_if_narrow(cust)
        assert out.count() == cust.count()


def test_conf_bytes_parses_spark_byte_strings(spark):
    assert _cache._conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 0) > 0
    # unknown key -> default
    assert _cache._conf_bytes(spark, "spark.graft.no.such.key", 7) == 7


def test_bytes_pressure_sweeps_oldest_entries(spark, monkeypatch):
    """When total cached storage exceeds the bytes bound, the oldest
    registry entries are evicted down to one — recompute replaces the
    GC/spill thrash the sf100 audit measured when 8 retained big frames
    pinned the heap."""
    _fresh()
    frames = [
        _cache.persist_bounded(spark.range(30 + i).selectExpr(f"id + {i} AS v"))
        for i in range(4)
    ]
    assert len(_cache._CACHE) == 4
    # simulate pressure: the probe always reports over-bound
    monkeypatch.setattr(_cache, "_storage_bytes", lambda s: _cache._CACHE_MAX_BYTES + 1)
    _cache.persist_bounded(spark.range(999).selectExpr("id AS pressure"))
    assert len(_cache._CACHE) == 1  # swept to the newest entry
    assert frames[0] not in _cache._CACHE
    _fresh()


def test_bytes_probe_none_keeps_count_bound_only(spark, monkeypatch):
    """Spark Connect (no storage probe): the sweep degrades to the
    entry-count bound without erroring."""
    _fresh()
    monkeypatch.setattr(_cache, "_storage_bytes", lambda s: None)
    for i in range(3):
        _cache.persist_bounded(spark.range(40 + i).selectExpr(f"id + {i} AS w"))
    assert len(_cache._CACHE) == 3
    _fresh()


def test_unpersisted_entry_is_a_miss_not_a_stale_hit(spark):
    """An entry that lost its cached storage (external unpersist or the
    bytes-pressure sweep) must be treated as a MISS: for parquet
    relations, plan canonicalization compares only the root path, so a
    stale registry object can hold a file listing that predates a
    rewrite at that path (compaction swap, rebuilt index) and would
    read deleted files.  The registry drops it and registers the
    caller's freshly-resolved frame instead."""
    from scdataset_spark.operators._cache import _CACHE, persist_bounded

    a = persist_bounded(spark.range(123).selectExpr("id * 7 AS x"))
    assert a in _CACHE
    a.unpersist()  # external unpersist — entry is now storage-less
    b = persist_bounded(spark.range(123).selectExpr("id * 7 AS x"))
    assert b is not a, "stale storage-less entry must not be handed back"
    assert a not in _CACHE and b in _CACHE
    assert b.storageLevel.useMemory or b.storageLevel.useDisk
    assert [r.x for r in b.collect()] == [i * 7 for i in range(123)]
