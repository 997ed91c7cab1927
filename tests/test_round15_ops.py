"""Round-15 additions: the driver-oracled store-served wildcard
(wildcard_indexed / wildcard_indexed_roundtrip — r14 verdict #2: the
chargram store part was the one serving surface the DuckDB gate never
read) and the pattern_grams consolidation's call-site coupling
(r14 verdict #3)."""

from __future__ import annotations

from simple_mapreduce_search_engine_information_retrieval__spark.plans.index_store import (
    CHARGRAM_K,
    build_index,
    wildcard_indexed,
)

SF = "/root/testdata/sf0.001"


def _expected(stats_terms: list[str], pattern: str) -> set[str]:
    pre, _, suf = pattern.partition("*")
    return {
        t
        for t in stats_terms
        if t.startswith(pre)
        and t.endswith(suf)
        and len(t) >= len(pre) + len(suf)
    }


def test_wildcard_indexed_serves_from_chargram_part(spark, tmp_path):
    """The store-served wildcard equals the dictionary-scan semantics
    for every pattern shape, and its executed plan reads the persisted
    chargrams part via a pushed-down gram filter (index-shaped serving,
    never a corpus scan)."""
    out = str(tmp_path / "ix")
    name = build_index(spark, SF, out, name="r15_wix", chargrams=True)
    terms = [r["term"] for r in spark.read.parquet(f"{out}/stats").collect()]
    assert "spark" in terms

    for pattern in ("*ark", "sp*", "sp*k", "s*rk", "sp*park", "*"):
        df = wildcard_indexed(spark, pattern, name=name)
        got = {r["term"] for r in df.collect()}
        assert got == _expected(terms, pattern), pattern

    # plan shape for a gram-yielding pattern: pushed-down gram IN over
    # the chargrams files (k=3 -> '*ark' probes {'ark','rk$'})
    plan = (
        wildcard_indexed(spark, "*ark", name=name)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "chargrams" in plan
    pushed = [
        seg
        for seg in plan.split("PushedFilters: [")[1:]
        if seg.split("]")[0].strip()
    ]
    assert any("gram" in seg.split("]")[0] for seg in pushed), plan


def test_wildcard_indexed_rejects_malformed_patterns(spark):
    """r15 review: a no-star pattern would silently act as a prefix
    glob ('spark' matching 'sparks') and a multi-star pattern would
    silently return empty — a library caller must get the error, not
    wrong rows (the REPL validates before calling; this API is public)."""
    import pytest

    for bad in ("spark", "a*b*c", ""):
        with pytest.raises(ValueError, match="exactly one"):
            wildcard_indexed(spark, bad, name="never_touched")


def test_wildcard_indexed_short_pattern_falls_back_to_stats(spark, tmp_path):
    """A pattern too short to yield any CHARGRAM_K-gram ('s*k' at k=3:
    parts '$s'/'k$' are both 2 chars) serves from the dictionary-sized
    stats part with only the post-filter — and never touches the
    chargrams part."""
    out = str(tmp_path / "ix")
    name = build_index(spark, SF, out, name="r15_wix_fb", chargrams=True)
    terms = [r["term"] for r in spark.read.parquet(f"{out}/stats").collect()]
    df = wildcard_indexed(spark, "s*k", name=name)
    assert {r["term"] for r in df.collect()} == _expected(terms, "s*k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "chargrams" not in plan


def test_roundtrip_query_matches_registered_oracle_gram_space(spark):
    """wildcard_indexed_roundtrip's registered oracle probes the gram
    space of the STORE's CHARGRAM_K (the QuerySpec renders duck_wildcard
    at k=CHARGRAM_K): the literal IN-list in the SQL is exactly
    pattern_grams of the roundtrip's pattern at that k."""
    import re

    from simple_mapreduce_search_engine_information_retrieval__spark.functions.tokenize import (
        pattern_grams,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        QUERIES,
    )

    sql = QUERIES["wildcard_indexed_roundtrip"].oracle
    m = re.search(r"gram IN \(([^)]*)\)", sql)
    assert m, sql
    rendered = {lit.strip()[1:-1] for lit in m.group(1).split(",")}
    assert rendered == pattern_grams("$*ark$".split("*"), CHARGRAM_K)


def test_repl_fuzzy_threshold_derives_from_max_edits(spark, tmp_path):
    """ADVICE r14: the :fuzzy levenshtein bound and the q-gram candidate
    threshold must derive from ONE constant. Pin the coupling the cheap
    way — the module exposes MAX_EDITS and the chargram-served fuzzy
    lookup stays value-equal to the dictionary scan at that bound (a
    drifted threshold would drop true matches the post-filter cannot
    recover)."""
    from simple_mapreduce_search_engine_information_retrieval__spark import repl

    assert repl.MAX_EDITS == 2
    out = str(tmp_path / "ix")
    build_index(spark, SF, out, name="r15_fz", chargrams=True)
    stats = {
        r["term"] for r in spark.read.parquet(f"{out}/stats").collect()
    }
    parts = ("postings", "stats", "meta", "chargrams")
    for part in parts:
        spark.read.parquet(f"{out}/{part}").createOrReplaceTempView(
            f"{repl.REPL_INDEX_NAME}_{part}"
        )
    try:
        got = {
            r["term"]
            for r in repl._term_lookup(spark, ":fuzzy", "sprak").collect()
        }
    finally:
        # the session fixture outlives this test and tmp_path does not:
        # a leaked view (especially _chargrams) would silently serve a
        # deleted store to later tests (r15 review; the r14 stale-view
        # lesson applied to the suite itself)
        for part in parts:
            spark.catalog.dropTempView(f"{repl.REPL_INDEX_NAME}_{part}")

    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {t for t in stats if _lev(t, "sprak") <= repl.MAX_EDITS}
    assert got == want and "spark" in got
