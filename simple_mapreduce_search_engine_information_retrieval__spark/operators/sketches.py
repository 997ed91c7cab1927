"""Probabilistic sketch operators over engine columns (novel-sketch
coverage; the reference has nothing like these — at 100 TB they are how
you answer membership / heavy-hitter questions without a second scan).

- term Bloom filter: O(1)-space membership for 'is this term indexed' —
  ship to the query frontend to skip cluster round-trips for misses;
- Count-Min over docnos: heavy-hitter document estimates from the
  postings stream without a groupBy.

Spark's sketch aggregations live on the Scala DataFrameStatFunctions only
(PySpark exposes approxQuantile/corr/... but not bloomFilter /
countMinSketch), so these go through the py4j bridge; the returned
sketch objects' probe methods (mightContain / estimateCount) are directly
callable on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class BloomProbe:
    def __init__(self, jsketch):
        self._j = jsketch

    def might_contain(self, value: str) -> bool:
        return bool(self._j.mightContainString(value))


class CountMinProbe:
    def __init__(self, jsketch):
        self._j = jsketch

    def estimate(self, value: int) -> int:
        return int(self._j.estimateCount(int(value)))


def term_bloom_filter(
    postings: DataFrame, expected: int = 1_000_000, fpp: float = 0.01
) -> BloomProbe:
    """BloomFilter over the index vocabulary."""
    j = postings.select("term")._jdf.stat().bloomFilter(
        "term", int(expected), float(fpp)
    )
    return BloomProbe(j)


def docno_count_min(
    postings: DataFrame, eps: float = 0.001, confidence: float = 0.99, seed: int = 42
) -> CountMinProbe:
    """CountMinSketch over the docno stream."""
    j = postings.select("docno")._jdf.stat().countMinSketch(
        "docno", float(eps), float(confidence), int(seed)
    )
    return CountMinProbe(j)
