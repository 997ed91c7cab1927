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
        "text_backoff_lm_score",
        "text_quality_by_source",
        "embedding_label_centroid_norms",
        # r7 continuation: the new float-derived micro-unit outputs —
        # per-row cosines are narrow (no partition fold), but pin the
        # end-to-end invariance the same way
        "embedding_margin_bitext",
        "embedding_srp_lsh_pairs",
        "embedding_covariance",
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


def test_semdedup_mega_cluster_guard(spark):
    """Seed ONE giant cluster (500 piles) with a small cap: the census
    must sub-split it so every pairwise block stays ~cap-sized — the
    work bound that stops a degenerate codebook from going
    corpus-quadratic. Also: a below-cap cluster stays one shard, so the
    production output is byte-identical to the unguarded form."""
    from pyspark.sql import functions as F

    from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
        _semdedup_sharded,
    )

    piles = spark.range(520).select(
        F.when(F.col("id") < 500, F.lit(0)).otherwise(F.lit(1)).alias("cluster"),
        F.md5(F.col("id").cast("string")).alias("vkey"),
        F.col("id").alias("rep_id"),
    )
    cap = 50
    sharded = _semdedup_sharded(piles, cap)
    sizes = {
        (r.cluster, r.shard): r.n
        for r in sharded.groupBy("cluster", "shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    mega = {k: v for k, v in sizes.items() if k[0] == 0}
    small = {k: v for k, v in sizes.items() if k[0] == 1}
    assert len(mega) == 10  # ceil(500/50) shards
    assert len(small) == 1  # below the cap: single shard, unguarded form
    # hash balance keeps every block near cap (x3 slack for md5 skew)
    assert max(mega.values()) <= 3 * cap
    # the quadratic bound: sum of per-block pair counts is ~n*cap,
    # nowhere near the unguarded n^2
    pair_work = sum(v * v for v in mega.values())
    assert pair_work < 500 * 500 / 5, pair_work
    # every pile keeps exactly one shard row (the split is a partition)
    assert sharded.count() == 520


def test_token_vocab_join_skew_posture(spark, sf_dir):
    """The DSIR/surprisal family re-joins the full token stream to
    vocabulary counts on a Zipf-skewed word key (stopwords stay in these
    LMs, so the head term is percent-scale of all rows at corpus scale).
    The posture (r6 verdict #4): the vocab side carries NO broadcast
    hint (Heaps' law — not broadcastable at 100 TB), and the session
    runs with AQE skew-join splitting enabled, which re-splits a hot
    post-shuffle partition at runtime for exactly this join shape. This
    test pins both halves of that contract."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.pipeline import (
        importance_weights,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.textstats import (
        backoff_lm_score,
        bigram_surprisal,
        unigram_surprisal,
    )

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    for fn in (
        importance_weights,
        unigram_surprisal,
        bigram_surprisal,
        backoff_lm_score,
    ):
        lines = (
            fn(spark, sf_dir)._jdf.queryExecution().logical().toString()
        ).splitlines()
        hints = [i for i, l in enumerate(lines) if "ResolvedHint" in l]
        assert hints, "expected the 1-row totals broadcast hint"
        for i in hints:
            # every hinted child must be a GLOBAL aggregate (1-row
            # totals/V). A grouped aggregate — the vocabulary count
            # relation — prints as `Aggregate [keys], [exprs]`; hinting
            # that would broadcast a Heaps-law-sized side and remove the
            # join from AQE's skew-split reach.
            # guarded lookahead (r10 ADVICE on the round-10 twin): a
            # hint printing last must fail with the diagnostic assert
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert "Aggregate [" in child and "], [" not in child, (
                "non-1-row relation under a broadcast hint:\n"
                + "\n".join(lines[i : i + 3])
            )


def test_global_shuffle_is_permutation(spark, sf_dir):
    """Every doc lands in exactly one (shard, pos); positions are
    contiguous 1..n_s per shard; shards are hash-balanced (within 3x of
    the mean); and the assignment is a pure function of doc_id (rerun
    identical)."""
    from collections import defaultdict

    from simple_mapreduce_search_engine_information_retrieval__spark.plans.pipeline import (
        GSHUFFLE_SHARDS,
        global_shuffle,
    )

    rows = global_shuffle(spark, sf_dir).collect()
    assert rows and len({r.doc_id for r in rows}) == len(rows)
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r.shard < GSHUFFLE_SHARDS
        by_shard[r.shard].append(r.pos)
    mean = len(rows) / GSHUFFLE_SHARDS
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
        assert len(poss) < 3 * mean, (shard, len(poss))
    again = global_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_semdedup_above_cap_matches_oracle(spark, sf_dir, monkeypatch):
    """The guard's above-cap path must be ORACLE-EXACT, not just
    bounded (r7 code review: a plain-form oracle would go hash-red the
    first time a cluster crossed the cap). Shrink the cap so the
    fixture's clusters actually shard, and compare Spark against the
    cap-adjusted DuckDB oracle — both replay the identical portable
    census + md5(rep_id) split."""
    from simple_mapreduce_search_engine_information_retrieval__spark import (
        oracle,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
        similarity,
    )

    cap = 5
    monkeypatch.setattr(similarity, "SEMDEDUP_CLUSTER_CAP", cap)
    sql = similarity.DUCK_SEMDEDUP.replace(
        "/ 4096)", f"/ {cap})"
    )
    assert f"/ {cap})" in sql  # the cap constant must have substituted
    con = oracle.duck_connect(sf_dir)
    issues = oracle.compare(similarity.semdedup_prune(spark, sf_dir), con, sql)
    assert not issues, issues
    # and the shrunken cap genuinely sharded something (else this test
    # silently degrades to the below-cap case)
    from pyspark.sql import functions as F

    piles = (
        similarity.kmeans_assignment(spark, sf_dir)
        .groupBy("cluster")
        .count()
    )
    assert piles.filter(F.col("count") > cap).count() > 0


def test_backoff_lm_holdout_actually_backs_off(spark, sf_dir):
    """The held-out split must make the backoff arm REAL: at least one
    eval bigram is absent from the train counts, every scored doc is
    odd-doc_id, and scores are <= 0 (log-probabilities of ratios <= 1)."""
    from pyspark.sql import functions as F

    from simple_mapreduce_search_engine_information_retrieval__spark.functions.tokenize import (
        kgrams_col,
        tokens_col,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.textstats import (
        backoff_lm_score,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )

    rows = backoff_lm_score(spark, sf_dir).collect()
    assert rows and all(r.doc_id % 2 == 1 for r in rows)
    assert all(r.mean_logscore_ppm <= 0 and r.n_bigrams > 0 for r in rows)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text"), stopworded=False).alias("toks")
    )
    grams = lambda parity: (  # noqa: E731
        docs.filter(F.col("doc_id") % 2 == parity)
        .select(F.explode(kgrams_col(F.col("toks"), 2)).alias("g"))
        .distinct()
    )
    unseen = grams(1).join(grams(0), "g", "left_anti").count()
    assert unseen > 0, "fixture split produced no unseen bigrams"


def test_minhash_estimate_error_properties(spark, sf_dir):
    """Estimates live on the k/N_HASHES grid, both ppm values are in
    [0, 1e6], the error column is |true - est|, and identical adjacent
    docs (if any) estimate exactly 1."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
        N_HASHES,
        minhash_estimate_error,
    )

    rows = minhash_estimate_error(spark, sf_dir).collect()
    assert rows
    grid = {
        int(i / N_HASHES * 1e6 + 0.5) for i in range(N_HASHES + 1)
    }
    for r in rows:
        assert 0 <= r.jacc_true_ppm <= 1_000_000
        assert r.jacc_est_ppm in grid, r.jacc_est_ppm
        assert r.abs_err_ppm == abs(r.jacc_true_ppm - r.jacc_est_ppm)
        if r.jacc_true_ppm == 1_000_000:
            assert r.jacc_est_ppm == 1_000_000


def test_aqe_skew_join_split_fires(spark):
    """Upgrade the skew POSTURE (conf is on) to an OBSERVATION: build a
    Zipf-shaped join — one key owns half the probe side, the miniature
    of the token x vocab shuffle — with the skew thresholds scaled to
    test size, and assert AQE actually re-splits the hot partition
    (SortMergeJoin(skew=true) + AQEShuffleRead skewed in the executed
    plan). This is the mechanism SCALE.md's DSIR/surprisal posture
    relies on at 100 TB."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit("the"))
            .otherwise(F.concat(F.lit("w"), (F.col("id") % 5000).cast("string")))
            .alias("w"),
            F.col("id").alias("payload"),
        )
        right = spark.range(5001).select(
            F.when(F.col("id") == 5000, F.lit("the"))
            .otherwise(F.concat(F.lit("w"), F.col("id").cast("string")))
            .alias("w"),
            (F.col("id") * 2).alias("cnt"),
        )
        j = left.join(right, "w").groupBy().agg(
            F.sum("payload").alias("p"), F.sum("cnt").alias("c")
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
        assert "AQEShuffleRead skewed" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_sketch_merge_laws_hold_exactly(spark, sf_dir):
    """The merge proofs must actually prove: every HLL register and
    every CMS counter agrees between the whole-corpus sketch and the
    merge of the half sketches, and both relations are non-trivial."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.sketches_queries import (
        cms_merged,
        hll_merged,
    )

    h = hll_merged(spark, sf_dir).collect()
    assert h and any(r.m_whole > 0 for r in h)
    assert all(r.m_whole == r.m_merged for r in h)
    c = cms_merged(spark, sf_dir).collect()
    assert c and any(r.c_whole > 0 for r in c)
    assert all(r.c_whole == r.c_merged for r in c)


def test_snapshot_diff_statuses_partition_the_key_universe(spark, sf_dir):
    """The seeded old-snapshot construction makes every status class
    enumerable from the doc_id arithmetic alone: added = %11 keys
    (absent from old), changed = %5 survivors (content drift), removed
    = re-keyed %17 slice, unchanged = the rest. The audit rows must
    reproduce those counts exactly and together cover the full key
    universe of both snapshots."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
        merge as MG,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )

    ids = [
        r["doc_id"]
        for r in table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    assert len(ids) == len(set(ids))  # diff assumes doc_id is a key
    added = [i for i in ids if i % 11 == 0]
    changed = [i for i in ids if i % 5 == 0 and i % 11 != 0]
    removed = [i + MG.DIFF_OFFSET for i in ids if i % 17 == 0]
    unchanged = [i for i in ids if i % 5 != 0 and i % 11 != 0]
    got = {
        r["status"]: r for r in MG.snapshot_diff(spark, sf_dir).collect()
    }
    assert set(got) == {"added", "changed", "removed", "unchanged"}
    for name, keys in (
        ("added", added),
        ("changed", changed),
        ("removed", removed),
        ("unchanged", unchanged),
    ):
        assert got[name]["n_rows"] == len(keys), name
        assert got[name]["min_doc"] == min(keys), name
        assert got[name]["max_doc"] == max(keys), name
    assert sum(r["n_rows"] for r in got.values()) == len(ids) + len(removed)
