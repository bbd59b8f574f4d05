"""query_persist / release_query_caches lifecycle: the registry that
lets lazily-returned query plans keep self-join intermediates cached
while bounding a long session's storage pool."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_pipeline_spark.session import (
    _QUERY_CACHE_CAP,
    _query_caches,
    query_persist,
    release_query_caches,
)


def _fresh(spark, i: int):
    # distinct plans (distinct literal) so CacheManager can't alias them
    return spark.range(5).select(F.col("id"), F.lit(i).alias("tag"))


def test_release_unpersists_everything(spark):
    release_query_caches()
    a = query_persist(_fresh(spark, 1))
    b = query_persist(_fresh(spark, 2))
    a.count(), b.count()
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    n = release_query_caches()
    assert n == 2
    assert not _query_caches
    assert not a.storageLevel.useMemory and not b.storageLevel.useMemory


def test_cap_evicts_oldest_first(spark):
    release_query_caches()
    frames = [query_persist(_fresh(spark, 100 + i)) for i in range(_QUERY_CACHE_CAP)]
    assert len(_query_caches) == _QUERY_CACHE_CAP
    overflow = query_persist(_fresh(spark, 999))
    # registry stays at cap; the OLDEST frame was unpersisted, newest kept
    assert len(_query_caches) == _QUERY_CACHE_CAP
    assert frames[0] not in _query_caches
    assert overflow in _query_caches
    assert not frames[0].storageLevel.useMemory
    assert overflow.storageLevel.useMemory
    release_query_caches()


def test_identical_plan_dedups_instead_of_thrashing(spark):
    """CacheManager keys entries by canonicalized plan, so repeated
    persists of ONE query (bench best-of-3) must reuse a single registry
    slot — re-registering would let FIFO eviction uncache the live
    entry."""
    release_query_caches()
    a = query_persist(_fresh(spark, 42))
    b = query_persist(_fresh(spark, 42))  # identical plan
    assert b is a
    assert len(_query_caches) == 1
    a.count()
    # filling the cap with distinct plans must not drop the deduped entry
    for i in range(_QUERY_CACHE_CAP - 1):
        query_persist(_fresh(spark, 300 + i))
    assert a in _query_caches and a.storageLevel.useMemory
    release_query_caches()


def test_eviction_skips_plan_shared_with_live_entry(spark):
    """An evicted OLD frame whose canonicalized plan aliases a NEWER
    live entry must not be unpersisted (it would drop the shared cache
    entry). Exercised by forcing two registry slots onto one plan."""
    release_query_caches()
    old = query_persist(_fresh(spark, 7))
    old.count()
    # bypass dedup-on-append to simulate two slots sharing one plan
    twin = _fresh(spark, 7).persist()
    _query_caches.append(twin)
    for i in range(_QUERY_CACHE_CAP - 1):  # push `old` to eviction
        query_persist(_fresh(spark, 400 + i))
    assert old not in _query_caches
    # the shared cache entry survives because `twin` is still live
    assert twin.storageLevel.useMemory
    release_query_caches()


def test_evicted_frame_still_computes_correctly(spark):
    """Eviction is a perf event, never a correctness one: a frame whose
    cache was dropped recomputes from lineage."""
    release_query_caches()
    kept = query_persist(_fresh(spark, 7))
    for i in range(_QUERY_CACHE_CAP):  # push `kept` out of the registry
        query_persist(_fresh(spark, 200 + i))
    assert kept not in _query_caches
    assert kept.count() == 5
    assert [r["tag"] for r in kept.limit(1).collect()] == [7]
    release_query_caches()
