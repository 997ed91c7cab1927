"""Property tests for the retrieval-eval harness and RAG chunk windows.
Value oracles run in tests/test_oracle_parity.py; these assert semantic
invariants and the shuffle-free chunking plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
    EVAL_DCG_W,
    EVAL_IDCG_PS,
    TOP_K,
    eval_metrics,
)
from simple_mapreduce_search_engine_information_retrieval__spark.plans.textstats import (
    CHUNK_STRIDE,
    CHUNK_WINDOW,
    chunk_windows,
)
from simple_mapreduce_search_engine_information_retrieval__spark.plans.corpus import (
    tokenized_docs,
)


def test_eval_metric_bounds_and_consistency(spark, sf_dir):
    rows = eval_metrics(spark, sf_dir).collect()
    assert rows  # at least one workload query has a non-empty gold set
    for r in rows:
        assert 0 < r.n_gold
        assert 0 <= r.hits10 <= min(TOP_K, r.n_gold)
        assert r.p10_ppm == r.hits10 * 1_000_000 // TOP_K
        assert r.recall10_ppm == r.hits10 * 1_000_000 // r.n_gold
        assert 0 <= r.ndcg_ppm <= 1_000_000
        assert r.dcg_micro <= r.idcg_micro
        assert r.idcg_micro == EVAL_IDCG_PS[min(TOP_K, r.n_gold) - 1]
        if r.hits10 == 0:
            assert r.mrr_micro == 0 and r.dcg_micro == 0


def test_eval_dcg_weights_are_halfup_micro_log2():
    import math

    assert EVAL_DCG_W[0] == 1_000_000  # rank 1: 1/log2(2)
    for r, w in enumerate(EVAL_DCG_W, start=1):
        assert w == int(1_000_000 / math.log2(r + 1) + 0.5)
    assert list(EVAL_DCG_W) == sorted(EVAL_DCG_W, reverse=True)


def test_chunk_windows_cover_and_overlap(spark, sf_dir):
    """Every token position is covered; consecutive chunks overlap by
    WINDOW-STRIDE; the last chunk reaches the end of the doc; chunk
    text round-trips the token slice."""
    chunks = chunk_windows(spark, sf_dir)
    toks = {
        r.doc_id: r.toks
        for r in tokenized_docs(spark, sf_dir).select("doc_id", "toks").collect()
    }
    by_doc: dict = {}
    for r in chunks.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        n = len(toks[doc_id])
        for i, r in enumerate(rows):
            assert r.start_tok == i * CHUNK_STRIDE
            assert r.n_tok == min(r.start_tok + CHUNK_WINDOW, n) - r.start_tok
            assert r.chunk_text == " ".join(
                toks[doc_id][r.start_tok : r.start_tok + CHUNK_WINDOW]
            )
        last = rows[-1]
        assert last.start_tok + last.n_tok == n  # reaches the end
        assert len(rows) == 1 or rows[-2].start_tok + CHUNK_WINDOW < n or (
            len(rows) >= 2 and rows[-1].start_tok < n
        )
    # every doc with tokens produced chunks
    assert set(by_doc) == {d for d, t in toks.items() if t}


def test_search_passages_hits_contain_query_terms(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        search_passages,
        tokenize_query,
    )

    res = search_passages(spark, sf_dir, "spark join").collect()
    assert 0 < len(res) <= TOP_K
    assert [r.rank for r in res] == list(range(1, len(res) + 1))
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)
    terms = set(tokenize_query("spark join"))
    chunks = {
        (r.doc_id, r.chunk_id): r.chunk_text
        for r in chunk_windows(spark, sf_dir).collect()
    }
    for r in res:
        assert terms & set(chunks[(r.doc_id, r.chunk_id)].split())


def test_search_hybrid_rrf_fuses_both_arms(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        RRF_K,
        search_bm25,
        search_hybrid_rrf,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
        knn_brute_force,
    )

    fused = search_hybrid_rrf(spark, sf_dir, "spark join").collect()
    assert 0 < len(fused) <= TOP_K
    assert [r.rank for r in fused] == list(range(1, len(fused) + 1))
    lex = {r.docno: r.rank for r in search_bm25(spark, sf_dir, "spark join").collect()}
    vec_rows = sorted(
        knn_brute_force(spark, sf_dir).collect(),
        key=lambda r: (-r.cos, r.vec_id),
    )
    vec = {r.vec_id: i + 1 for i, r in enumerate(vec_rows)}
    for r in fused:
        want = round(
            (1.0 / (RRF_K + lex[r.docno]) if r.docno in lex else 0.0)
            + (1.0 / (RRF_K + vec[r.docno]) if r.docno in vec else 0.0),
            6,
        )
        assert r.docno in lex or r.docno in vec
        assert abs(r.rrf - want) < 1e-9


def test_chunk_windows_plan_is_shuffle_free(spark, sf_dir):
    spark.catalog.clearCache()
    plan = chunk_windows(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow transform end to end
