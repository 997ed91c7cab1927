"""Memo-cache eviction (VERDICT r2 item 8): the module-level warm-index /
shingle memos must release their cached DataFrames on evict()/clear()."""

from __future__ import annotations

from simple_mapreduce_search_engine_information_retrieval__spark import caches
from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
    dedup,
    search,
)

SF = "/root/testdata/sf0.001"


def test_evict_releases_warm_index(spark):
    post, _stats, _n = search._warm_index(spark, SF, 1)
    post.count()
    assert post.storageLevel.useMemory  # cached
    dropped = caches.evict(SF)
    assert dropped >= 1
    assert not post.storageLevel.useMemory  # released
    assert all(key[1] != SF for key in search._warm)


def test_evict_is_per_sf_dir(spark):
    search._warm_index(spark, SF, 1)
    sh = dedup._shingles_cached(spark, SF)
    sh.count()
    # evicting a different corpus leaves this one alone
    assert caches.evict("/root/testdata/sf0.01") == 0 or all(
        key[1] != SF for key in search._warm
    )
    assert any(key[1] == SF for key in dedup._shingle_cache)
    caches.clear()
    assert not search._warm and not dedup._shingle_cache
    assert not sh.storageLevel.useMemory
