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


def test_label_prop_plan_depth_stays_bounded(spark, sf_dir):
    """The loop localCheckpoints every few rounds — the returned plan
    must not embed one join-tree per iteration (round-1 VERDICT item 9:
    unbounded lineage growth at scale)."""
    out = near_dup_groups(spark, sf_dir, max_iter=9, driver_threshold=0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # an unbounded-lineage plan at 9 iterations is thousands of lines;
    # a checkpoint-truncated one holds at most ~2 iterations of joins
    assert plan.count("Join") <= 4, f"plan has {plan.count('Join')} joins"
    assert len(plan.splitlines()) < 120, len(plan.splitlines())
