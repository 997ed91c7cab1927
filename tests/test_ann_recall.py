"""IVF multi-probe recall vs the brute-force exact baseline (VERDICT r2
item 4's done-criterion: recall@10 >= 0.9 on fixtures)."""

from __future__ import annotations

import pytest

from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
    knn_brute_force,
    knn_ivf_bucketed,
)


def _recall_at_10(spark, sf_dir: str) -> float:
    exact = {r.vec_id for r in knn_brute_force(spark, sf_dir).collect()}
    approx = {r.vec_id for r in knn_ivf_bucketed(spark, sf_dir).collect()}
    return len(exact & approx) / len(exact)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_ivf_recall(spark, sf_dir):
    assert _recall_at_10(spark, sf_dir) >= 0.9
