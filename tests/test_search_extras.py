from __future__ import annotations

from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
    tokenize_query,
    wildcard_terms,
)
from simple_mapreduce_search_engine_information_retrieval__spark.plans.views import (
    SEARCH_SQL_TEMPLATE,
    register_engine_views,
)


def test_query_tokenizer_edge_cases():
    assert tokenize_query("The SPARK!") == ["spark"]
    assert tokenize_query("the a of") == []  # all stopwords
    assert tokenize_query("don't-stop") == ["dont"]  # apostrophe + split


def test_wildcard_prefix(spark, sf_dir):
    terms = {r.term for r in wildcard_terms(spark, sf_dir, "sp*", k=2).collect()}
    assert "spark" in terms
    assert all(t.startswith("sp") for t in terms)


def test_wildcard_infix_verify_kills_false_positives(spark, sf_dir):
    terms = {r.term for r in wildcard_terms(spark, sf_dir, "s*k", k=2).collect()}
    assert all(t.startswith("s") and t.endswith("k") for t in terms)


def test_sql_view_search_matches_plan(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import search

    register_engine_views(spark, sf_dir)
    via_sql = spark.sql(SEARCH_SQL_TEMPLATE.format(terms="'spark','join'", top_k=10))
    via_plan = search(spark, sf_dir, "spark join")
    got = [(r.docno, r.score) for r in via_sql.collect()]
    want = [(r.docno, r.score) for r in via_plan.collect()]
    assert got == want


def test_fidelity_equals_expression_plus_stem_dict_on_fixture_corpus():
    """The premise of the search_fidelity_stemmed oracle: on the fixture
    corpus (fixed word pool, no acronym/period shapes) the full fidelity
    pipeline equals expression tokenization + per-word stem lookup —
    checked doc-for-doc at both test SFs."""
    import re

    import duckdb

    from simple_mapreduce_search_engine_information_retrieval__spark.functions.fidelity import (
        tokenize_text,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.functions.stemmer import stem
    from simple_mapreduce_search_engine_information_retrieval__spark.functions.stopwords import (
        STOPWORD_SET,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.functions.tokenize import (
        MAX_TOKEN_BYTES,
        SPLIT_RE,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        FIXTURE_POOL,
    )

    mapping = {w: stem(w) for w in FIXTURE_POOL}
    for sf in ("0.001", "0.01"):
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('/root/testdata/sf{sf}/documents.parquet')"
        ).fetchall()
        pool_seen = set()
        for _, text in rows:
            expr = [
                t
                for t in re.split(SPLIT_RE, text.lower().replace("'", ""))
                if t and len(t.encode()) < MAX_TOKEN_BYTES and t not in STOPWORD_SET
            ]
            pool_seen.update(expr)
            assert tokenize_text(text) == [mapping.get(t, t) for t in expr]
        # every token the corpus produces is in the embedded dictionary
        assert pool_seen <= set(FIXTURE_POOL)


def test_boolean_semantics(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        _warm_index,
        search_boolean,
    )

    post, _, _ = _warm_index(spark, sf_dir, 1)
    rows = post.select("term", "docno", "tf").collect()
    has = {}
    for r in rows:
        has.setdefault(r.term, {})[r.docno] = r.tf
    want = {
        d: has["hash"][d] + has["join"][d]
        for d in set(has.get("hash", {})) & set(has.get("join", {}))
        if d not in has.get("merge", {})
    }
    got = {
        r.docno: r.tf_sum
        for r in search_boolean(spark, sf_dir, ("hash", "join"), ("merge",)).collect()
    }
    assert got == want
    # a must-term absent from the corpus empties the result (the AND
    # count filter can never reach |must|)
    none = search_boolean(spark, sf_dir, ("hash", "zzzmissing"), ("merge",))
    assert none.count() == 0


def test_phrase_positional_bounded_by_tf(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        _warm_index,
        search_phrase_positional,
    )

    post, _, _ = _warm_index(spark, sf_dir, 1)
    tf = {(r.term, r.docno): r.tf for r in post.collect()}
    for r in search_phrase_positional(spark, sf_dir, "hash join").collect():
        assert 0 < r.occurrences <= min(
            tf.get(("hash", r.docno), 0), tf.get(("join", r.docno), 0)
        )


def test_snippets_contain_a_query_term(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        SNIPPET_RADIUS,
        search_snippets,
    )

    rows = search_snippets(spark, sf_dir, "spark join").collect()
    assert rows  # the fixture corpus has hits for this query
    for r in rows:
        toks = r.snippet.split(" ")
        assert len(toks) <= 2 * SNIPPET_RADIUS + 1
        assert {"spark", "join"} & set(toks)


def test_phrase_positional_arity_guard(spark, sf_dir):
    """Phrases that tokenize below the 2-term minimum (stopword operand,
    single word) take the graceful empty-result path in BOTH builders
    instead of raising (ADVICE r4)."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        duck_search_phrase_positional,
        search_phrase_positional,
    )

    for phrase in ("hash", "the a"):
        df = search_phrase_positional(spark, sf_dir, phrase)
        assert df.columns == ["docno", "occurrences", "rank"]
        assert df.count() == 0
        sql = duck_search_phrase_positional(phrase)
        import duckdb

        con = duckdb.connect()
        try:
            out = con.execute(sql).df()
            assert sorted(out.columns) == ["docno", "occurrences", "rank"]
            assert len(out) == 0
        finally:
            con.close()


def test_hybrid_rrf_threads_top_k_into_both_arms(spark, sf_dir):
    """top_k > 10 must deepen the vector arm too (ADVICE r4: a
    hard-wired TOP_K silently fused a truncated vector ranking). Oracle
    parity at top_k=20 catches any asymmetry because the duck builder
    threads the same depth."""
    from simple_mapreduce_search_engine_information_retrieval__spark import oracle
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        duck_search_hybrid_rrf,
        search_hybrid_rrf,
    )

    df = search_hybrid_rrf(spark, sf_dir, "spark join", top_k=20)
    assert df.count() == 20
    con = oracle.duck_connect(sf_dir)
    try:
        assert oracle.compare(df, con, duck_search_hybrid_rrf("spark join", top_k=20)) == []
    finally:
        con.close()


def test_phrase_positional_n_term_matches_oracle(spark, sf_dir):
    """The generalized positional phrase walk (round 5): 3- and 4-term
    phrases verified against the DuckDB adjacency-join oracle at
    sf0.001, plus a brute-force cross-check on raw token streams for
    the 3-term case."""
    from simple_mapreduce_search_engine_information_retrieval__spark import oracle
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        duck_search_phrase_positional,
        search_phrase_positional,
    )

    con = oracle.duck_connect(sf_dir)
    try:
        for phrase in ("hash join merge", "big data hash join"):
            df = search_phrase_positional(spark, sf_dir, phrase)
            assert (
                oracle.compare(
                    df, con, duck_search_phrase_positional(phrase)
                )
                == []
            ), phrase
    finally:
        con.close()
    # brute force: count adjacent triples in the tokenized streams
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.corpus import (
        tokenized_docs,
    )

    toks = {
        r.doc_id: list(r.kept)
        for r in tokenized_docs(spark, sf_dir).select("doc_id", "kept").collect()
    }
    want = {}
    tgt = ("hash", "join", "merge")
    for d, ts in toks.items():
        n = sum(
            1
            for i in range(len(ts) - 2)
            if tuple(ts[i : i + 3]) == tgt
        )
        if n:
            want[d] = n
    got = {
        r.docno: r.occurrences
        for r in search_phrase_positional(spark, sf_dir, "hash join merge")
        .collect()
    }
    # the query returns top-k; every returned row must match brute force,
    # and if fewer than k docs match overall the sets must be equal
    for d, n in got.items():
        assert want.get(d) == n
    if len(want) <= 10:
        assert got == want
