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


def test_repl_no_star_is_exact_match_by_design(spark, tmp_path):
    """r15 ADVICE pins the INTENTIONAL divergence: the REPL's
    `:wildcard` treats a no-star arg as an exact dictionary lookup
    (it branches before any library call), while the public
    wildcard_terms / wildcard_indexed raise for the same input. If the
    REPL is ever rerouted through the library surface, this test is
    the tripwire that keeps the exact-match branch ahead of the call."""
    import os

    from simple_mapreduce_search_engine_information_retrieval__spark.plans.index_store import (
        build_index,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.repl import (
        REPL_INDEX_NAME,
        _term_lookup,
    )

    out = str(tmp_path / "ix")
    build_index(spark, SF, out, name="r16_repl_exact")
    parts = ("stats", "postings", "meta")
    for part in parts:
        spark.read.parquet(os.path.join(out, part)).createOrReplaceTempView(
            f"{REPL_INDEX_NAME}_{part}"
        )
    try:
        hits = _term_lookup(spark, ":wildcard", "spark").collect()
        assert [r.term for r in hits] == ["spark"]
        assert _term_lookup(spark, ":wildcard", "sparkzzz").collect() == []
        with pytest.raises(ValueError, match="exactly one"):
            wildcard_terms(spark, SF, "spark")
    finally:
        # session-fixture hygiene (r15 review): views over tmp_path
        # stores must not outlive the test
        for part in parts:
            spark.catalog.dropTempView(f"{REPL_INDEX_NAME}_{part}")


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
