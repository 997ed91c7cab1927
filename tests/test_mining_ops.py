"""Round-7 mining-family tests: margin-criterion bitext mining and the
exact-integer covariance build pass.

Ground truth is recomputed with independent numpy code (not the query's
own kernels), plus the fold-order/partition-invariance guarantees the
integer disciplines claim.
"""

from __future__ import annotations

import numpy as np

from conftest import physical_plan as _physical
from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
    mining as M,
)
from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
    table,
)


def _slices(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    return ids, vecs, labels


def test_margin_bitext_matches_independent_reimplementation(spark, sf_dir):
    """Recompute the published ratio margin end-to-end in numpy —
    anchors, ppm cosines, bidirectional top-k sums, integer margin,
    per-anchor argmax with the tgt tiebreak — and require the query's
    output rows to match exactly."""
    ids, vecs, labels = _slices(spark, sf_dir)
    src = np.argsort(ids[labels == M.SRC_LABEL])[: M.N_SRC]
    src_ids = np.sort(ids[labels == M.SRC_LABEL])[: M.N_SRC]
    src_vecs = vecs[labels == M.SRC_LABEL][src]
    tgt_ids = ids[labels == M.TGT_LABEL]
    tgt_vecs = vecs[labels == M.TGT_LABEL]
    order = np.argsort(tgt_ids)
    tgt_ids, tgt_vecs = tgt_ids[order], tgt_vecs[order]

    def seq_dot(a, b):
        # left-to-right fold, matching Spark's F.aggregate and DuckDB's
        # list_dot_product exactly (numpy pairwise summation can differ
        # by an ulp — enough to flip a ppm floor on a knife edge)
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    nrm_s = [np.sqrt(seq_dot(v, v)) for v in src_vecs]
    nrm_t = [np.sqrt(seq_dot(v, v)) for v in tgt_vecs]
    c_ppm = np.array(
        [
            [
                int(
                    np.floor(
                        seq_dot(a, b) / (na * nb) * M.MICRO + 0.5
                    )
                )
                for b, nb in zip(tgt_vecs, nrm_t)
            ]
            for a, na in zip(src_vecs, nrm_s)
        ],
        dtype=np.int64,
    )

    def topk_sum(row_ppm, k):
        return int(np.sort(row_ppm)[::-1][:k].sum())

    expected = {}
    sum_x = {i: topk_sum(c_ppm[i], M.BITEXT_K) for i in range(len(src_ids))}
    sum_y = {
        j: topk_sum(c_ppm[:, j], M.BITEXT_K) for j in range(len(tgt_ids))
    }
    for i, sid in enumerate(src_ids):
        best = None
        for j, tid in enumerate(tgt_ids):
            denom = sum_x[i] + sum_y[j]
            if denom <= 0:
                continue
            m = int(
                np.floor(
                    (c_ppm[i, j] * 2 * M.BITEXT_K * M.MICRO) / denom + 0.5
                )
            )
            key = (m, -tid)
            if best is None or key > best[0]:
                best = (key, tid, int(c_ppm[i, j]), m)
        expected[int(sid)] = (
            int(best[1]),
            best[2],
            best[3],
            best[3] >= M.MARGIN_TAU_MICRO,
        )
    got = {
        r["src_id"]: (
            r["tgt_id"],
            r["cos_ppm"],
            r["margin_micro"],
            r["accepted"],
        )
        for r in M.margin_bitext(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == M.N_SRC


def test_margin_topk_window_pushes_group_limit(spark, sf_dir):
    """The src-side k-NN rank filter must compile with Spark's
    WindowGroupLimit (partial per-partition top-k BELOW the shuffle) —
    the property that keeps the per-anchor corpus-sized sort from
    materializing on one executor at 100 TB. The tgt-side window needs
    no limit: its partitions are bounded at N_SRC rows by construction.
    The sum_x relation must re-enter as a broadcast, not a shuffle."""
    plan = _physical(M.margin_bitext(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_covariance_matches_numpy_and_is_partition_invariant(spark, sf_dir):
    """(a) The integer result equals numpy's float covariance of the
    micro-floored components to <=1 unit (the single final division is
    the only float op); (b) repartitioning the input — completely
    different Arrow batch boundaries — yields BIT-IDENTICAL output,
    the associativity claim of the int64/DECIMAL accumulation."""
    _, vecs, _ = _slices(spark, sf_dir)
    xm = np.floor(vecs * M.MICRO + 0.5)
    n = len(xm)
    ref = (xm.T @ xm - np.outer(xm.sum(0), xm.sum(0)) / n) / n / M.MICRO

    got = {
        (r["i"], r["j"]): (r["n"], r["cov_micro"])
        for r in M.covariance(spark, sf_dir).collect()
    }
    assert len(got) == M.DIM * (M.DIM + 1) // 2
    for (i, j), (cnt, cov) in got.items():
        assert cnt == n
        assert abs(cov - ref[i - 1, j - 1]) <= 1.0, (i, j)

    emb = table(spark, sf_dir, "embeddings").select("embedding")
    from pyspark.sql import functions as F

    alt = (
        emb.repartition(13)  # same kernel, different Arrow batching
        .mapInPandas(
            M._gram_partials,
            schema="i int, j int, sp long, sxi long, sxj long, n long",
        )
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("sp").cast("decimal(38,0)")).alias("sp"),
            F.sum(F.col("sxi").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("sxj").cast("decimal(38,0)")).alias("sy"),
            F.sum("n").alias("n"),
        )
    )
    num = (F.col("n") * F.col("sp") - F.col("sx") * F.col("sy")).cast("double")
    den = (
        F.col("n").cast("double")
        * F.col("n").cast("double")
        * F.lit(float(M.MICRO))
    )
    alt_rows = {
        (r["i"], r["j"]): (r["n"], r["cov_micro"])
        for r in alt.select(
            "i",
            "j",
            "n",
            F.floor(num / den + F.lit(0.5)).cast("long").alias("cov_micro"),
        ).collect()
    }
    assert alt_rows == got
