"""Property tests for the round-6b operators: DSIR importance weights,
SemDeDup cluster-pruned semantic dedup, and the small-file compaction
planner. (Value parity vs DuckDB is covered by test_oracle_parity.py;
these assert the semantic invariants.)"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F


def test_importance_weights_separate_target(spark, sf_dir):
    """The whole point of DSIR weights: target-language docs must score
    higher ON AVERAGE than the rest (their vocabulary IS the target
    LM), and every doc with >=1 token gets exactly one weight."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.pipeline import (
        DSIR_TARGET_LANG,
        importance_weights,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )

    iw = importance_weights(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    rows = iw.join(docs, "doc_id").collect()
    assert rows and len({r.doc_id for r in rows}) == len(rows)
    tgt = [r.importance_ppm for r in rows if r.lang == DSIR_TARGET_LANG]
    rest = [r.importance_ppm for r in rows if r.lang != DSIR_TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
    for r in rows:
        assert r.n_tokens > 0


def test_semdedup_keeps_centroid_closest(spark, sf_dir):
    """Every cluster's (d_cent_micro, vec_id)-minimal member is kept — it can
    never be dominated — and every vector appears exactly once with a
    0/1 keep flag."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
        semdedup_prune,
    )

    rows = semdedup_prune(spark, sf_dir).collect()
    assert rows and len({r.vec_id for r in rows}) == len(rows)
    by_cluster = defaultdict(list)
    for r in rows:
        assert r.keep in (0, 1)
        by_cluster[r.cluster].append(r)
    assert len(by_cluster) > 1
    for members in by_cluster.values():
        best = min(members, key=lambda r: (r.d_cent_micro, r.vec_id))
        assert best.keep == 1, best


def test_semdedup_cluster_assignment_matches_kmeans(spark, sf_dir):
    """The two consumers of the shared codebook construction must emit
    identical cluster assignments (the factoring's whole point)."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
        kmeans_clusters,
        semdedup_prune,
    )

    km = {r.vec_id: r.cluster for r in kmeans_clusters(spark, sf_dir).collect()}
    sd = {r.vec_id: r.cluster for r in semdedup_prune(spark, sf_dir).collect()}
    assert km == sd


def test_semdedup_clone_pile_collapses(spark, tmp_path_factory):
    """Skew guard: a pile of identical embeddings must enter the
    pairwise block as ONE representative (collapse-before-LSH applied
    to vectors), and the output must equal the unguarded semantics'
    prediction — exactly the min-vec_id clone survives, every other
    clone is pruned, and orthogonal tail vectors are untouched."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
        DIM,
        semdedup_prune,
    )

    n_clones, n_tail = 300, 20
    clone = [10.0] + [0.0] * (DIM - 1)
    rows = [(100 + i, clone) for i in range(n_clones)]
    # tail: unit vectors on distinct later axes — orthogonal to the
    # clone pile and to each other (all cosines 0 < threshold)
    for j in range(n_tail):
        v = [0.0] * DIM
        v[1 + j] = 5.0 + j
        rows.append((j, v))
    out = tmp_path_factory.mktemp("semdedup_pile")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(out / "embeddings.parquet"))

    got = {r.vec_id: r.keep for r in semdedup_prune(spark, str(out)).collect()}
    assert len(got) == n_clones + n_tail
    clone_keeps = [v for v, k in got.items() if v >= 100 and k == 1]
    assert clone_keeps == [100]
    assert all(got[j] == 1 for j in range(n_tail))


def test_weighted_sample_is_deterministic_and_biased(spark, sf_dir):
    """Efraimidis-Spirakis invariants: exactly K distinct picks ranked
    1..K, bit-identical across reruns (md5 RNG, no state), and the
    n_chars weighting visibly biases the sample toward longer docs."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.pipeline import (
        WSAMPLE_K,
        weighted_sample,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )

    rows = weighted_sample(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    want = min(WSAMPLE_K, n_docs)
    assert len(rows) == want
    assert sorted(r.pick for r in rows) == list(range(1, want + 1))
    assert len({r.doc_id for r in rows}) == want
    again = weighted_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    if n_docs > 2 * want:  # bias is only observable on a partial sample
        corpus_mean = (
            table(spark, sf_dir, "documents")
            .agg(F.avg("n_chars").alias("m"))
            .collect()[0].m
        )
        pick_mean = sum(r.n_chars for r in rows) / len(rows)
        assert pick_mean > corpus_mean


def test_compaction_plan_bins_fill(spark, sf_dir):
    """Partition census invariants: compact=1 iff the partition is
    undersized; kept partitions carry bin -1; every non-final bin is
    filled to the target (first-fit-by-cumsum guarantees cumulative
    rows through bin b >= (b+1)*target)."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.layout import (
        COMPACT_TARGET_ROWS,
        compaction_plan,
    )

    rows = compaction_plan(spark, sf_dir).collect()
    assert rows
    assert len({(r.source, r.lang) for r in rows}) == len(rows)
    bins = defaultdict(int)
    for r in rows:
        assert r.compact == (1 if r.n_rows < COMPACT_TARGET_ROWS else 0)
        if r.compact:
            assert r.bin_id >= 0
            bins[r.bin_id] += r.n_rows
        else:
            assert r.bin_id == -1
    if bins:
        last = max(bins)
        cum = 0
        for b in sorted(bins):
            cum += bins[b]
            if b < last:
                assert cum >= (b + 1) * COMPACT_TARGET_ROWS, (b, cum)
