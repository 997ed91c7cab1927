"""Training-pair mining & second-moment statistics over embeddings.

Two operators a large-scale multilingual / representation-learning data
pipeline needs beyond the kNN family in ``plans/similarity.py``:

- ``embedding_margin_bitext``: margin-criterion bitext mining (Artetxe
  & Schwenk 2019, the CCMatrix/LASER selection rule). For each bounded
  source anchor the best target is chosen by the RATIO margin — the
  pair cosine divided by the mean of both sides' k-NN cosines — which
  demotes "hub" targets that are close to everything. The published
  shape: score candidates, normalize by neighborhood density, accept
  above a margin threshold.
- ``embedding_covariance``: the exact D×D second-moment (covariance)
  build pass of PCA/whitening — the step that reduces a corpus-sized
  vector table to D² numbers, after which the eigendecomposition is
  driver-side numpy on a 64×64 matrix. The Spark side accumulates the
  Gram in EXACT int64 arithmetic per Arrow batch (``mapInPandas`` +
  numpy integer matmul — no BLAS float path, so every partial is an
  integer and the fold is associative), then one D²-row shuffle.

Scale notes (100 TB):
- margin mining: the anchor set is bounded and broadcast (the
  contrastive_pairs discipline); the corpus-side target slice is
  scanned ONCE. Per-anchor top-k uses a rank window that Spark rewrites
  to WindowGroupLimit (partial per-partition top-k before the shuffle —
  plan-asserted in tests), so no executor ever materializes a
  corpus-sized sorted partition. Production candidate generation plugs
  the IVF store in front of the same margin math; the dense form here
  IS the verify leg.
- covariance: per-partition work is one int64 numpy matmul per Arrow
  batch; the shuffle carries D(D+1)/2 rows per batch regardless of
  corpus size. Global sums ride DECIMAL(38,0) so 1e12-row corpora
  cannot overflow the int64 partials' sum. The D² output is the only
  thing that leaves the executors.

Reference parity note: the reference engine (Hadoop-era search indexer,
`sa/edu/kaust/*.java`) has no vector surface at all; both operators are
beyond-reference pipeline components per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import table
from . import QuerySpec
from .similarity import _cos, _micro

# --- margin-criterion bitext mining --------------------------------------

SRC_LABEL = 0  # "source language" slice of the embedding fixture
TGT_LABEL = 1  # "target language" slice
N_SRC = 16  # bounded anchor set (the contrastive_pairs discipline)
BITEXT_K = 4  # neighborhood size for the margin denominator
MARGIN_TAU_MICRO = 1_050_000  # accept margin >= 1.05 (CCMatrix ballpark)
MICRO = 1_000_000


def _c_ppm(a, b):
    """Cosine in integer micro-units: both engines run the same libm
    ops on identical doubles, then ONE floor — every downstream sum and
    comparison is integer arithmetic (associative, order-free). Built
    on similarity.py's shared _cos fold + _micro floor so the
    dot-product discipline has exactly one definition."""
    return _micro(_cos(a, b))


def margin_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_id, tgt_id, cos_ppm, margin_micro, accepted): for each of
    the {N_SRC} source anchors (label {SRC_LABEL}), the best
    target-slice (label {TGT_LABEL}) pair by the bidirectional ratio
    margin::

        margin(x, y) = cos(x, y) / mean(topK_cos(x, TGT) ∪ topK_cos(y, SRC))

    computed entirely in integer micro-units: per-pair cosines floor to
    ppm, the margin is one BIGINT-ratio floor, and the per-anchor
    argmax is a combinable struct-max with a tgt_id tiebreak.

    Scale shape — NO corpus-sized sort partition anywhere: the src-side
    k-NN sum is a rank-filter (Spark compiles it to WindowGroupLimit —
    partial per-partition top-k BELOW the shuffle, plan-asserted) that
    collapses to an N_SRC-row broadcast; the tgt-side window partitions
    are bounded at N_SRC rows by construction (each target scores
    exactly the anchor set).

    The scored relation is deliberately recomputed by its two consumers
    (sum_x branch and margin branch): each pass is a narrow scan +
    broadcast cross, while materializing corpus×N_SRC rows to save the
    second pass would cost more than it saves at any scale."""
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    anchors = (
        emb.filter(F.col("label") == SRC_LABEL)
        .orderBy("vec_id")
        .limit(N_SRC)
        .select(F.col("vec_id").alias("src_id"), vecd.alias("src_vec"))
    )
    tgts = emb.filter(F.col("label") == TGT_LABEL).select(
        F.col("vec_id").alias("tgt_id"), vecd.alias("tgt_vec")
    )
    # bounded: N_SRC anchor rows
    scored = tgts.crossJoin(F.broadcast(anchors)).select(
        "src_id",
        "tgt_id",
        _c_ppm(F.col("src_vec"), F.col("tgt_vec")).alias("c_ppm"),
    )
    wx = Window.partitionBy("src_id").orderBy(
        F.desc("c_ppm"), F.asc("tgt_id")
    )
    sum_x = (  # rank-filter -> WindowGroupLimit -> N_SRC-row aggregate
        scored.withColumn("rn_x", F.row_number().over(wx))
        .filter(F.col("rn_x") <= BITEXT_K)
        .groupBy("src_id")
        .agg(F.sum("c_ppm").alias("sum_x"))
    )
    wy = Window.partitionBy("tgt_id").orderBy(
        F.desc("c_ppm"), F.asc("src_id")
    )
    # tgt-side partitions hold exactly N_SRC rows — bounded window
    with_y = scored.withColumn("rn_y", F.row_number().over(wy)).withColumn(
        "sum_y",
        F.sum(
            F.when(F.col("rn_y") <= BITEXT_K, F.col("c_ppm")).otherwise(0)
        ).over(Window.partitionBy("tgt_id")),
    )
    denom = F.col("sum_x") + F.col("sum_y")  # 2K terms, integer ppm
    margin = F.floor(
        (F.col("c_ppm") * F.lit(2 * BITEXT_K * MICRO)) / F.col("denom")
        + F.lit(0.5)
    ).cast("long")
    pairs = (
        # bounded: sum_x is the N_SRC-row per-anchor k-NN sum table
        with_y.join(F.broadcast(sum_x), "src_id")
        .withColumn("denom", denom)
        .filter(F.col("denom") > 0)
        .withColumn("margin_micro", margin)
    )
    best = F.max(
        F.struct(
            F.col("margin_micro").alias("m"),
            (-F.col("tgt_id")).alias("nt"),
            F.col("c_ppm").alias("c"),
        )
    ).alias("b")
    return (
        pairs.groupBy("src_id")
        .agg(best)
        .select(
            "src_id",
            (-F.col("b.nt")).alias("tgt_id"),
            F.col("b.c").alias("cos_ppm"),
            F.col("b.m").alias("margin_micro"),
            (F.col("b.m") >= MARGIN_TAU_MICRO).alias("accepted"),
        )
    )


_DUCK_COS_PPM = (
    "CAST(floor((list_dot_product(a.src_vec, t.tgt_vec) / "
    "(sqrt(list_dot_product(a.src_vec, a.src_vec)) * "
    "sqrt(list_dot_product(t.tgt_vec, t.tgt_vec)))) * 1000000 + 0.5) "
    "AS BIGINT)"
)

DUCK_MARGIN_BITEXT = f"""
WITH anchors AS (
  SELECT vec_id AS src_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS src_vec
  FROM embeddings WHERE label = {SRC_LABEL}
  ORDER BY vec_id LIMIT {N_SRC}
),
tgts AS (
  SELECT vec_id AS tgt_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS tgt_vec
  FROM embeddings WHERE label = {TGT_LABEL}
),
scored AS (
  SELECT a.src_id, t.tgt_id, {_DUCK_COS_PPM} AS c_ppm
  FROM tgts t CROSS JOIN anchors a
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY c_ppm DESC, tgt_id) AS rn_x,
         row_number() OVER (PARTITION BY tgt_id
                            ORDER BY c_ppm DESC, src_id) AS rn_y
  FROM scored
),
summed AS (
  SELECT *,
         sum(CASE WHEN rn_x <= {BITEXT_K} THEN c_ppm ELSE 0 END)
           OVER (PARTITION BY src_id)
         + sum(CASE WHEN rn_y <= {BITEXT_K} THEN c_ppm ELSE 0 END)
           OVER (PARTITION BY tgt_id) AS denom
  FROM ranked
),
margins AS (
  SELECT src_id, tgt_id, c_ppm,
         CAST(floor((c_ppm * {2 * BITEXT_K * MICRO}) / denom + 0.5)
              AS BIGINT) AS margin_micro
  FROM summed WHERE denom > 0
),
best AS (
  SELECT src_id, tgt_id, c_ppm, margin_micro,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY margin_micro DESC, tgt_id) AS rk
  FROM margins
)
SELECT src_id, tgt_id, c_ppm AS cos_ppm, margin_micro,
       margin_micro >= {MARGIN_TAU_MICRO} AS accepted
FROM best WHERE rk = 1
"""


# --- exact integer covariance (the PCA/whitening build pass) -------------

DIM = 64


def _gram_partials(it):
    """mapInPandas kernel: per Arrow batch, the EXACT int64 Gram of the
    micro-unit component matrix plus per-dim sums. numpy integer matmul
    never touches the float path, so partials are exact integers and
    the downstream sum is associative. Emits D(D+1)/2 rows per batch:
    (i, j, sp, sxi, sxj, n) with 1-based dims, i <= j."""
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(DIM)
    for pdf in it:
        if pdf.empty:
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        xm = np.floor(x * MICRO + 0.5).astype(np.int64)
        # int64-exactness guard on the ACTUAL data (numpy matmul wraps
        # silently on overflow): worst partial = max|term| * rows must
        # clear int64 with headroom. At the default 10k-row Arrow
        # batches and |component| <= ~1 (ppm <= ~1e6, term <= 2^40)
        # this is < 2^54; the guard survives batch-size retunes,
        # larger-magnitude fixtures, and `python -O`.
        m = int(np.abs(xm).max(initial=0))
        if m * m * len(pdf) >= 1 << 62:
            raise OverflowError(
                f"Gram batch ({len(pdf)} rows, max|x_ppm|={m}) would "
                "overflow int64; lower arrow.maxRecordsPerBatch"
            )
        gram = xm.T @ xm
        sx = xm.sum(axis=0)
        n = np.int64(len(pdf))
        yield pd.DataFrame(
            {
                "i": (iu[0] + 1).astype(np.int32),
                "j": (iu[1] + 1).astype(np.int32),
                "sp": gram[iu],
                "sxi": sx[iu[0]],
                "sxj": sx[iu[1]],
                "n": np.full(len(iu[0]), n),
            }
        )


def covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, n, cov_micro): the exact upper-triangle covariance matrix
    of the micro-unit embedding components — the distributed moment
    pass of PCA/whitening (eigendecomposition of the 64×64 result is a
    driver-side numpy call, outside the query). cov in micro-units of
    the ORIGINAL component scale::

        cov_micro = floor((n·Σxy − Σx·Σy) / (n² · 1e6) + 0.5)

    where every Σ is an exact integer (int64 per batch, DECIMAL(38,0)
    across batches), so the only float op is the single final division
    — identical in both engines on identical integers."""
    emb = table(spark, sf_dir, "embeddings").select("embedding")
    partials = emb.mapInPandas(
        _gram_partials,
        schema="i int, j int, sp long, sxi long, sxj long, n long",
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = partials.groupBy("i", "j").agg(
        F.sum(d38("sp")).alias("sp"),
        F.sum(d38("sxi")).alias("sx"),
        F.sum(d38("sxj")).alias("sy"),
        F.sum("n").alias("n"),
    )
    num = (F.col("n") * F.col("sp") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    # square AFTER the double cast: n*n in LONG overflows (ANSI error /
    # silent wrap) past n ~ 3.04e9 rows, inside the 1e12-row contract
    den = (
        F.col("n").cast("double")
        * F.col("n").cast("double")
        * F.lit(float(MICRO))
    )
    return sums.select(
        "i",
        "j",
        "n",
        F.floor(num / den + F.lit(0.5)).cast("long").alias("cov_micro"),
    )


DUCK_COVARIANCE = f"""
WITH xm AS (
  SELECT list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {MICRO} + 0.5)
                                  AS BIGINT)) AS v
  FROM embeddings
),
dims AS (SELECT unnest(range(1, {DIM + 1})) AS d),
pairs AS (SELECT a.d AS i, b.d AS j FROM dims a JOIN dims b ON a.d <= b.d),
terms AS (
  SELECT p.i, p.j,
         CAST(xm.v[p.i] AS DECIMAL(38,0)) AS xi,
         CAST(xm.v[p.j] AS DECIMAL(38,0)) AS xj
  FROM xm CROSS JOIN pairs p
),
sums AS (
  SELECT i, j,
         sum(xi * xj) AS sp, sum(xi) AS sx, sum(xj) AS sy,
         count(*) AS n
  FROM terms GROUP BY i, j
)
SELECT i, j, CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(n * sp - sx * sy AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * {MICRO}.0)
                  + 0.5)
            AS BIGINT) AS cov_micro
FROM sums
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_margin_bitext": QuerySpec(
        fn=margin_bitext,
        oracle=DUCK_MARGIN_BITEXT,
        note="margin-criterion bitext mining (Artetxe & Schwenk ratio "
        "margin): bidirectional k-NN-normalized pair selection over "
        "broadcast anchors; integer micro-unit margins, combinable "
        "per-anchor struct-max argmax",
    ),
    "embedding_covariance": QuerySpec(
        fn=covariance,
        oracle=DUCK_COVARIANCE,
        note="exact D×D covariance build pass of PCA/whitening: "
        "per-batch int64 numpy Gram via mapInPandas, DECIMAL(38,0) "
        "cross-batch sums, D²-row shuffle — corpus reduces to 2,080 "
        "numbers in one combinable pass",
    ),
}
