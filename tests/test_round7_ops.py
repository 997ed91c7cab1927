"""Round-7 hardening tests.

1. Fold-order determinism for the integer micro-unit LLR/surprisal
   aggregations (the r6 `pipeline_importance_weights` hash-fail class):
   the same query must emit IDENTICAL rows under different
   `spark.sql.shuffle.partitions` settings — a `round(avg(ln ...), 4)`
   double fold is partition-order dependent; a summed-integer fold is
   associative and cannot be.
"""

from __future__ import annotations

import pytest


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "qname",
    [
        "pipeline_importance_weights",
        "text_unigram_surprisal",
        "text_bigram_surprisal",
        "text_quality_by_source",
        "embedding_label_centroid_norms",
    ],
)
def test_micro_unit_folds_are_partition_invariant(spark, sf_dir, qname):
    """Run under 32 and then 7 shuffle partitions: the partial-agg merge
    tree differs completely, so any order-dependent float fold would
    flip at least one rounding boundary at sf0.01's ~60k tokens. The
    integer micro-unit discipline makes both runs bit-identical."""
    import __spark_entry__ as entry

    q = entry.queries()[qname]
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(q(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _rows(q(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b
    assert a  # non-degenerate
