"""Property tests for the round-4 operator batch: CDC chunking, token
budget fill, EWMA fold, embedding dim profile, SCD2 intervals."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
    _cdc_chunk_structs,
)
from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
    table,
)


def _chunks_of(spark, toks: list[str]) -> list[tuple[str, int]]:
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    row = df.select(_cdc_chunk_structs(F.col("toks")).alias("c")).collect()[0]
    return [(c.h, c.n) for c in row.c]


def test_cdc_chunks_partition_the_token_stream(spark, sf_dir):
    """Every token lands in exactly one chunk: per-doc chunk token
    counts must sum to the doc's token count."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.corpus import (
        tokenized_docs,
    )

    docs = tokenized_docs(spark, sf_dir).select("doc_id", "toks")
    per_doc = docs.select(
        F.size("toks").alias("n"),
        F.aggregate(
            _cdc_chunk_structs(F.col("toks")),
            F.lit(0).cast("long"),
            lambda acc, c: acc + c["n"],
        ).alias("chunked"),
    )
    assert per_doc.filter(F.col("n") != F.col("chunked")).count() == 0


def test_cdc_chunks_are_edit_stable(spark):
    """Inserting one token must perturb only the chunk containing the
    edit — every other (hash, len) chunk survives. This is the property
    fixed-size passage chunking lacks."""
    base = ["spark", "join", "hash", "table", "scan", "merge", "row"] * 6
    edited = base[:20] + ["inserted"] + base[20:]
    c0 = _chunks_of(spark, base)
    c1 = _chunks_of(spark, edited)
    common = set(c0) & set(c1)
    # all but at most 2 of the original chunks survive the edit (the
    # edited chunk itself, plus a possible boundary shift next to it)
    assert len(set(c0) - common) <= 2
    assert len(set(c1) - common) <= 2


def test_token_budget_is_greedy_maximal(spark, sf_dir):
    """The selection must exhaust the budget: total selected tokens
    <= budget, and the single best unselected doc no longer fits."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.pipeline import (
        TOKEN_BUDGET,
        token_budget_fill,
    )

    rows = token_budget_fill(spark, sf_dir).collect()
    total = sum(r.n_kept for r in rows)
    assert total <= TOKEN_BUDGET
    assert total == max(r.cum_tokens for r in rows)
    n_docs = table(spark, sf_dir, "documents").count()
    if len(rows) < n_docs:  # docs were excluded -> the cut is budget-tight
        sel = {r.doc_id for r in rows}
        from simple_mapreduce_search_engine_information_retrieval__spark.plans.pipeline import (
            quality_classifier,
        )

        clf = {r.doc_id: r.score for r in quality_classifier(spark, sf_dir).collect()}
        from simple_mapreduce_search_engine_information_retrieval__spark.plans.corpus import (
            tokenized_docs,
        )

        kept = {
            r.doc_id: r.n
            for r in tokenized_docs(spark, sf_dir)
            .select("doc_id", F.size("kept").alias("n"))
            .collect()
        }
        best_out = max(
            (d for d in clf if d not in sel), key=lambda d: (clf[d], -d)
        )
        assert total + kept[best_out] > TOKEN_BUDGET


def test_ewma_matches_python_fold(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.relational import (
        EWMA_ALPHA,
        _events_ewma,
    )

    ev = sorted(
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    want: dict = {}
    for r in ev:
        if r.user_id not in want:
            want[r.user_id] = r.value
        else:
            want[r.user_id] = want[r.user_id] * (1 - EWMA_ALPHA) + r.value * EWMA_ALPHA
    got = {r.user_id: r.ewma for r in _events_ewma(spark, sf_dir).collect()}
    assert got.keys() == want.keys()
    for u in want:
        assert got[u] == round(want[u], 4), u


def test_dim_stats_match_numpy(spark, sf_dir):
    import numpy as np

    from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
        embedding_dim_stats,
    )

    mat = np.array(
        [r.embedding for r in table(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    got = {r.dim: r for r in embedding_dim_stats(spark, sf_dir).collect()}
    assert len(got) == mat.shape[1]
    for d in range(mat.shape[1]):
        assert math.isclose(got[d].mean, round(float(mat[:, d].mean()), 4), abs_tol=1e-4)
        assert math.isclose(
            got[d].std, round(float(mat[:, d].std(ddof=1)), 4), abs_tol=1e-4
        )


def test_scd2_intervals_tile_per_user(spark, sf_dir):
    """Segments must be adjacent (valid_to == next valid_from), exactly
    one open interval per user, and segment types must alternate."""
    import __spark_entry__ as entrymod

    reg = entrymod._registry()
    rows = reg["events_user_segments_scd2"].fn(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, segs in by_user.items():
        segs.sort(key=lambda r: r.valid_from_us)
        assert sum(1 for s in segs if s.is_current == 1) == 1
        assert segs[-1].is_current == 1 and segs[-1].valid_to_us == -1
        for a, b in zip(segs, segs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.segment != b.segment  # runs are maximal
