"""Driver-checked sketch operators: Count-Min and Bloom, built as plain
aggregations over an engine-portable hash family.

The py4j-bridged Spark sketches (operators/sketches.py) are the
JVM-native tool; these formulations exist because their hash families
are portable (md5 with an integer salt prefix, the same trick as
MinHash in plans/dedup.py) so build AND probe are exactly
reproducible in DuckDB — which turns "approximate" sketches into
oracle-checkable queries: the sketch table, the point estimates, and
the membership answers are all deterministic functions of the data.

Scale: a CMS build is ONE map-side-combinable aggregate over the token
stream (d x w cells of state per partition); a Bloom build is a
distinct over d_hashes x vocab bit indices. Probes broadcast the tiny
query side. This is the shape that survives 100 TB — no driver-side
loops, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from .indexing import doc_terms, duck_doc_terms

CMS_ROWS = 4
CMS_WIDTH = 64
BLOOM_BITS = 512
BLOOM_HASHES = 3

# probe workloads: present terms, stopword-absent, and never-present
CMS_PROBES = ("spark", "join", "window", "merge", "zzz_absent", "qqq_absent")
BLOOM_PROBES = ("spark", "data", "vector", "zzz_absent", "the", "qqq_absent")


def _h(col: Column, salt: int, modulus: int) -> Column:
    """First 8 md5 nibbles of 'salt:term' as a BIGINT bucket (< 2^32, no
    overflow/sign issues in either engine)."""
    hx = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 8)
    return F.conv(hx, 16, 10).cast("long") % modulus


def _duck_h(expr: str, salt: str, modulus: int) -> str:
    return f"(('0x' || substr(md5({salt} || ':' || {expr}), 1, 8))::BIGINT % {modulus})"


def cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, est): Count-Min point estimates for the probe workload over
    the 1-gram token stream. est >= true count always; equality unless a
    bucket collision in every row — with the same hash family on both
    engines, the estimate itself is deterministic and oracle-checked."""
    stream = doc_terms(spark, sf_dir, 1)
    cells = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        _h(F.col("term"), r, CMS_WIDTH).alias("bucket"),
                    )
                    for r in range(CMS_ROWS)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.bucket")
    cms = cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], "term string")
    probe_cells = probes.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        _h(F.col("term"), r, CMS_WIDTH).alias("bucket"),
                    )
                    for r in range(CMS_ROWS)
                ]
            )
        ).alias("c"),
    ).select("term", "c.row", "c.bucket")
    return (
        probe_cells.join(cms, ["row", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _duck_cms_estimates() -> str:
    probes = ", ".join(f"('{t}')" for t in CMS_PROBES)
    return f"""
WITH stream AS MATERIALIZED ({duck_doc_terms(1)}),
     rows(r) AS (SELECT unnest(generate_series(0, {CMS_ROWS - 1}))),
     cms AS MATERIALIZED (
       SELECT CAST(r AS BIGINT) AS row,
              {_duck_h('term', 'CAST(r AS VARCHAR)', CMS_WIDTH)} AS bucket,
              count(*) AS cnt
       FROM stream, rows
       GROUP BY 1, 2
     ),
     probes(term) AS (VALUES {probes}),
     probe_cells AS (
       SELECT term, CAST(r AS BIGINT) AS row,
              {_duck_h('term', 'CAST(r AS VARCHAR)', CMS_WIDTH)} AS bucket
       FROM probes, rows
     )
SELECT p.term, min(coalesce(c.cnt, 0)) AS est
FROM probe_cells p LEFT JOIN cms c USING (row, bucket)
GROUP BY p.term
"""


def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, maybe_present): Bloom-filter membership for the probe
    workload against the 1-gram vocabulary. No false negatives by
    construction; false positives are a deterministic function of the
    hash family, hence oracle-checkable."""
    vocab = doc_terms(spark, sf_dir, 1).select("term").distinct()
    bits = (
        vocab.select(
            F.explode(
                F.array(*[_h(F.col("term"), 100 + j, BLOOM_BITS) for j in range(BLOOM_HASHES)])
            ).alias("bit")
        )
        .distinct()
    )
    probes = spark.createDataFrame([(t,) for t in BLOOM_PROBES], "term string")
    probe_bits = probes.select(
        "term",
        F.explode(
            F.array(*[_h(F.col("term"), 100 + j, BLOOM_BITS) for j in range(BLOOM_HASHES)])
        ).alias("bit"),
    )
    return (
        probe_bits.join(bits.withColumn("set", F.lit(1)), "bit", "left")
        .groupBy("term")
        .agg((F.count("set") == F.lit(BLOOM_HASHES)).alias("maybe_present"))
    )


def _duck_bloom_membership() -> str:
    probes = ", ".join(f"('{t}')" for t in BLOOM_PROBES)
    hashes = ", ".join(str(100 + j) for j in range(BLOOM_HASHES))
    return f"""
WITH vocab AS MATERIALIZED (SELECT DISTINCT term FROM ({duck_doc_terms(1)})),
     js(j) AS (SELECT unnest([{hashes}])),
     bits AS MATERIALIZED (
       SELECT DISTINCT {_duck_h('term', 'CAST(j AS VARCHAR)', BLOOM_BITS)} AS bit
       FROM vocab, js
     ),
     probes(term) AS (VALUES {probes}),
     probe_bits AS (
       SELECT term, {_duck_h('term', 'CAST(j AS VARCHAR)', BLOOM_BITS)} AS bit
       FROM probes, js
     )
SELECT p.term, count(b.bit) = {BLOOM_HASHES} AS maybe_present
FROM probe_bits p LEFT JOIN bits b USING (bit)
GROUP BY p.term
"""


# K-minimum-values distinct estimator. Chosen over HLL for the oracle
# path on purpose: Spark's approx_count_distinct is HLL++ whose sketch
# layout is engine-private, but KMV is a pure function of the hashed
# value set — est = (k-1)/u_(k) with u the k-th smallest normalized
# hash — so the ESTIMATE itself is deterministic and cross-engine
# checkable with the same portable md5 family as CMS/Bloom/MinHash.
# Scale: one distinct + a k-row top-k (TakeOrdered) — combinable,
# no driver loops. k=64 → ~13% stderr; gated loosely in tests.
KMV_K = 64
_KMV_GRAM = 3  # word-3-gram vocabulary (the 1-gram fixture pool is tiny)


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = doc_terms(spark, sf_dir, _KMV_GRAM).select("term").distinct()
    hashed = vocab.select(
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long").alias("h")
    ).distinct()
    kth = (
        hashed.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("hk"), F.count("*").cast("long").alias("k"))
    )
    true_d = vocab.agg(F.count("*").alias("true_distinct"))
    return kth.crossJoin(true_d).select(
        "k",
        F.round((F.col("k") - 1) * F.lit(4294967296.0) / F.col("hk"), 4).alias(
            "est_distinct"
        ),
        "true_distinct",
    )


def _duck_kmv_distinct() -> str:
    return f"""
WITH vocab AS MATERIALIZED (
       SELECT DISTINCT term FROM ({duck_doc_terms(_KMV_GRAM)})),
     hashed AS (
       SELECT DISTINCT ('0x' || substr(md5(term), 1, 8))::BIGINT AS h
       FROM vocab),
     kth AS (
       SELECT max(h) AS hk, CAST(count(*) AS BIGINT) AS k
       FROM (SELECT h FROM hashed ORDER BY h LIMIT {KMV_K})),
     t AS (SELECT count(*) AS true_distinct FROM vocab)
SELECT k, round((k - 1) * 4294967296e0 / hk, 4) AS est_distinct, true_distinct
FROM kth, t
"""


# Portable HyperLogLog (Flajolet et al.): b=6 -> m=64 registers over the
# same md5 32-bit hash as KMV. Spark's approx_count_distinct is HLL++
# with an engine-private sketch; this register-level formulation is a
# pure function of the hashed value set, so the REGISTERS and the
# estimate are cross-engine deterministic. The harmonic sum is exact in
# IEEE doubles (64 terms, each a power of two in [2^-27, 1] — 33-bit
# spread < 53-bit mantissa), so no rounding tolerance is needed.
# Scale: one max-per-register aggregate (combinable) over the hashed
# stream + a 64-row single-partition finish. alpha_64 = 0.709 (standard).
HLL_B = 6
HLL_M = 1 << HLL_B  # 64
HLL_W = 32 - HLL_B  # 26 value bits
HLL_ALPHA = 0.709


def _hll_regs(vocab: DataFrame) -> DataFrame:
    """(reg, m_j): sparse HLL registers for a (term) relation — the
    max-rank aggregate shared by the whole-corpus sketch and the
    per-half sketches of the merge proof."""
    h = F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
    hashed = vocab.select(h.alias("h"))
    two_w = 1 << HLL_W
    w = (F.col("h") % two_w).cast("long")
    # rank of the first 1-bit in the W value bits: W - bitlen(w) + 1,
    # with all-zero w ranking W+1. length(bin(w)) is integer-exact in
    # both engines (no float log2 at power-of-two boundaries).
    rank = F.when(w == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W) - F.length(F.bin(w)) + 1
    )
    return (
        hashed.select(
            F.floor(F.col("h") / two_w).cast("long").alias("reg"),
            rank.cast("long").alias("rank"),
        )
        .groupBy("reg")
        .agg(F.max("rank").alias("m_j"))
    )


def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(m, est_distinct, true_distinct): register-level HyperLogLog over
    the 3-gram vocabulary, with the small-range linear-counting
    correction (E <= 2.5m and empty registers present -> m*ln(m/V))."""
    vocab = doc_terms(spark, sf_dir, _KMV_GRAM).select("term").distinct()
    regs = _hll_regs(vocab)
    # empty registers count as M_j = 0 (harmonic term 2^0)
    full = (
        spark.range(HLL_M)
        .select(F.col("id").alias("reg"))
        .join(regs, "reg", "left")
        .select(F.coalesce("m_j", F.lit(0)).alias("m_j"))
    )
    agg = full.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("z"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).alias("v"),
    )
    raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / F.col("z")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
    ).otherwise(raw)
    true_d = vocab.agg(F.count("*").alias("true_distinct"))
    return agg.crossJoin(true_d).select(
        F.lit(HLL_M).cast("long").alias("m"),
        F.round(est, 4).alias("est_distinct"),
        "true_distinct",
    )


def _duck_hll_registers() -> str:
    two_w = 1 << HLL_W
    return f"""
WITH vocab AS MATERIALIZED (
       SELECT DISTINCT term FROM ({duck_doc_terms(_KMV_GRAM)})),
     hashed AS (
       SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM vocab),
     regs AS (
       SELECT CAST(floor(h / {two_w}) AS BIGINT) AS reg,
              max(CASE WHEN h % {two_w} = 0 THEN {HLL_W + 1}
                       ELSE {HLL_W} - length(bin(h % {two_w})) + 1 END) AS m_j
       FROM hashed GROUP BY 1),
     full_regs AS (
       SELECT coalesce(regs.m_j, 0) AS m_j
       FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS reg) g
       LEFT JOIN regs USING (reg)),
     agg AS (
       SELECT sum(power(2e0, -m_j)) AS z,
              sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS v
       FROM full_regs),
     t AS (SELECT count(*) AS true_distinct FROM vocab)
SELECT CAST({HLL_M} AS BIGINT) AS m,
       round(CASE WHEN ({HLL_ALPHA}e0 * {HLL_M * HLL_M}e0 / z) <= {2.5 * HLL_M}e0
                       AND v > 0
                  THEN {HLL_M}e0 * ln({HLL_M}e0 / v)
                  ELSE {HLL_ALPHA}e0 * {HLL_M * HLL_M}e0 / z END, 4)
         AS est_distinct,
       true_distinct
FROM agg, t
"""


# --- sketch MERGEABILITY — the property that makes sketches the 100 TB
# tool: every partition/executor/day builds its own small sketch, and
# the combine is a tiny associative merge (max for HLL registers, + for
# CMS counters) instead of re-scanning the union. These two queries
# PROVE the merge laws hold bit-for-bit on this hash family by emitting
# the whole-corpus sketch next to the merge of two half-corpus sketches
# — every row must agree, and the oracle checks both sides.
def hll_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(reg, m_whole, m_merged): whole-vocabulary HLL registers vs the
    register-max MERGE of the two doc-half sketches. HLL registers are
    a max over items, and max is associative/idempotent, so the two
    columns are equal by construction — including for terms occurring
    in both halves (the idempotence a naive counter lacks)."""
    dt = doc_terms(spark, sf_dir, _KMV_GRAM)
    whole = _hll_regs(dt.select("term").distinct())
    halves = [
        _hll_regs(
            dt.filter(F.col("docno") % 2 == p).select("term").distinct()
        )
        for p in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1]).groupBy("reg").agg(
            F.max("m_j").alias("m_merged")
        )
    )
    return (
        spark.range(HLL_M)
        .select(F.col("id").alias("reg"))
        .join(whole.withColumnRenamed("m_j", "m_whole"), "reg", "left")
        .join(merged, "reg", "left")
        .select(
            "reg",
            F.coalesce("m_whole", F.lit(0)).cast("long").alias("m_whole"),
            F.coalesce("m_merged", F.lit(0)).cast("long").alias("m_merged"),
        )
    )


def _duck_hll_merged() -> str:
    two_w = 1 << HLL_W
    reg_sql = (
        "SELECT CAST(floor(h / {tw}) AS BIGINT) AS reg, "
        "max(CASE WHEN h % {tw} = 0 THEN {wp1} "
        "ELSE {w} - length(bin(h % {tw})) + 1 END) AS m_j "
        "FROM (SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT AS h "
        "      FROM {src}) GROUP BY 1"
    )

    def regs(src):
        return reg_sql.format(tw=two_w, wp1=HLL_W + 1, w=HLL_W, src=src)

    return f"""
WITH dt AS MATERIALIZED ({duck_doc_terms(_KMV_GRAM)}),
     whole AS ({regs('(SELECT DISTINCT term FROM dt)')}),
     h0 AS ({regs('(SELECT DISTINCT term FROM dt WHERE docno % 2 = 0)')}),
     h1 AS ({regs('(SELECT DISTINCT term FROM dt WHERE docno % 2 = 1)')}),
     merged AS (SELECT reg, max(m_j) AS m_merged
                FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1)
                GROUP BY reg),
     g AS (SELECT unnest(generate_series(0, {HLL_M - 1})) AS reg)
SELECT g.reg,
       CAST(coalesce(whole.m_j, 0) AS BIGINT) AS m_whole,
       CAST(coalesce(merged.m_merged, 0) AS BIGINT) AS m_merged
FROM g LEFT JOIN whole ON whole.reg = g.reg
       LEFT JOIN merged ON merged.reg = g.reg
"""


def _cms_counters(stream: DataFrame) -> DataFrame:
    """(row, bucket, cnt): CMS counter table over a (term) stream."""
    cells = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        _h(F.col("term"), r, CMS_WIDTH).alias("bucket"),
                    )
                    for r in range(CMS_ROWS)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(row, bucket, c_whole, c_merged): whole-corpus CMS counters vs
    the counter-SUM merge of the two doc-half sketches. The count-min
    sketch is linear in the stream, so + is the merge and every counter
    agrees exactly."""
    stream = doc_terms(spark, sf_dir, 1)
    whole = _cms_counters(stream).withColumnRenamed("cnt", "c_whole")
    halves = [
        _cms_counters(stream.filter(F.col("docno") % 2 == p))
        for p in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("c_merged"))
    )
    return (
        whole.join(merged, ["row", "bucket"], "full")
        .select(
            "row",
            "bucket",
            F.coalesce("c_whole", F.lit(0)).cast("long").alias("c_whole"),
            F.coalesce("c_merged", F.lit(0)).cast("long").alias("c_merged"),
        )
    )


def _duck_cms_merged() -> str:
    cell = (
        "SELECT CAST(r AS BIGINT) AS row, "
        f"{_duck_h('term', 'CAST(r AS VARCHAR)', CMS_WIDTH)} AS bucket, "
        "count(*) AS cnt FROM {src}, rows GROUP BY 1, 2"
    )
    return f"""
WITH stream AS MATERIALIZED ({duck_doc_terms(1)}),
     rows(r) AS (SELECT unnest(generate_series(0, {CMS_ROWS - 1}))),
     whole AS ({cell.format(src='stream')}),
     h0 AS ({cell.format(src='(SELECT * FROM stream WHERE docno % 2 = 0)')}),
     h1 AS ({cell.format(src='(SELECT * FROM stream WHERE docno % 2 = 1)')}),
     merged AS (SELECT row, bucket, sum(cnt) AS c_merged
                FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1)
                GROUP BY row, bucket)
SELECT coalesce(w.row, m.row) AS row,
       coalesce(w.bucket, m.bucket) AS bucket,
       CAST(coalesce(w.cnt, 0) AS BIGINT) AS c_whole,
       CAST(coalesce(m.c_merged, 0) AS BIGINT) AS c_merged
FROM whole w FULL JOIN merged m ON m.row = w.row AND m.bucket = w.bucket
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_hll_registers": QuerySpec(
        fn=hll_registers,
        oracle=_duck_hll_registers(),
        note="register-level HyperLogLog (b=6) with linear-counting "
        "correction — portable md5 hash family makes the registers and "
        "the estimate cross-engine deterministic; build is one "
        "combinable max-per-register aggregate",
    ),
    "sketch_hll_merged": QuerySpec(
        fn=hll_merged,
        oracle=_duck_hll_merged(),
        note="HLL mergeability proof: whole-corpus registers vs the "
        "register-max merge of two half-corpus sketches — max is "
        "associative AND idempotent, so sketches built per partition/"
        "day combine exactly; every row equal, oracle-checked",
    ),
    "sketch_cms_merged": QuerySpec(
        fn=cms_merged,
        oracle=_duck_cms_merged(),
        note="CMS mergeability proof: whole-corpus counters vs the "
        "counter-sum merge of two half-corpus sketches — the sketch is "
        "linear in the stream, so + is the distributed combine; every "
        "counter equal, oracle-checked",
    ),
    "sketch_kmv_distinct": QuerySpec(
        fn=kmv_distinct,
        oracle=_duck_kmv_distinct(),
        note="KMV distinct-count estimator over the 3-gram vocabulary — "
        "portable alternative to HLL whose estimate is itself "
        "deterministic and oracle-checked",
    ),
    "sketch_cms_estimates": QuerySpec(
        fn=cms_estimates,
        oracle=_duck_cms_estimates(),
        note="Count-Min point estimates with a portable md5-salted hash "
        "family — build is one combinable aggregate, probes broadcast",
    ),
    "sketch_bloom_membership": QuerySpec(
        fn=bloom_membership,
        oracle=_duck_bloom_membership(),
        note="Bloom membership over the vocabulary, same portable hash "
        "family — deterministic, so even false positives oracle-match",
    ),
}
