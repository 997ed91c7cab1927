"""Sketch-operator properties beyond oracle parity: CMS never
underestimates, Bloom never false-negatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.plans.indexing import (
    doc_terms,
)
from simple_mapreduce_search_engine_information_retrieval__spark.plans.sketches_queries import (
    BLOOM_PROBES,
    CMS_PROBES,
    bloom_membership,
    cms_estimates,
)


def test_cms_estimate_is_an_upper_bound_on_true_count(spark, sf_dir):
    true = {
        r.term: r.n
        for r in doc_terms(spark, sf_dir, 1)
        .filter(F.col("term").isin(list(CMS_PROBES)))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    est = {r.term: r.est for r in cms_estimates(spark, sf_dir).collect()}
    assert set(est) == set(CMS_PROBES)
    for t in CMS_PROBES:
        assert est[t] >= true.get(t, 0), (t, est[t], true.get(t, 0))
    # a present probe should have a positive estimate
    assert est["spark"] > 0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    vocab = {
        r.term
        for r in doc_terms(spark, sf_dir, 1).select("term").distinct().collect()
    }
    got = {r.term: r.maybe_present for r in bloom_membership(spark, sf_dir).collect()}
    assert set(got) == set(BLOOM_PROBES)
    for t in BLOOM_PROBES:
        if t in vocab:
            assert got[t] is True, t


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    """KMV with k=64 has ~13% stderr; gate loosely at 50% relative error
    (the estimate itself is deterministic — exactness is the oracle's
    job, this guards the estimator's statistical sanity)."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.sketches_queries import (
        kmv_distinct,
    )

    r = kmv_distinct(spark, sf_dir).collect()[0]
    assert r.k >= 1 and r.true_distinct >= r.k
    rel_err = abs(r.est_distinct - r.true_distinct) / r.true_distinct
    assert rel_err < 0.5, (r.est_distinct, r.true_distinct)
