from __future__ import annotations

from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
    near_dup_groups,
)


def test_distributed_path_matches_driver_path(spark, sf_dir):
    """Force the distributed label-propagation loop (threshold 0) and
    check it agrees with the driver-side union-find path."""
    fast = {(r.doc_id, r.group_id) for r in near_dup_groups(spark, sf_dir).collect()}
    dist = {
        (r.doc_id, r.group_id)
        for r in near_dup_groups(spark, sf_dir, driver_threshold=0).collect()
    }
    assert fast == dist and fast
