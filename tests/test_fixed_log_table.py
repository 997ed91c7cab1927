"""Fixed-point log-table construction (r8 spike, SCALE.md §Expression-
engine lessons): the standing replacement for the micro-unit ``ln``
family's disclosed 1-ulp libm residual. Not adopted in the oracles (the
residual has never realized; adoption would churn 5 green queries), but
pinned HERE so a future boundary flip is a mechanical swap:

    ln(n)_nano = L[m - T] + (r * (L[m-T+1] - L[m-T])) // 2^k
                 + k * LN2_NANO
    with n = (m·2^k + r·2^k/T)/T, T = 4096, m = (n·T) >> k in [T, 2T),
    k = n.bit_length() - 1, L[i] = round(ln((T+i)/T)·1e9).

Every step is integer arithmetic on a PRECOMPUTED table, so Spark and
DuckDB produce bit-identical values by construction (both have bin()
for k). This test proves (a) the Spark expression rendering equals the
plain-Python replay bit-for-bit, and (b) the table form lands within
one micro-unit of libm on the realized corpus counts — i.e. the swap
changes nothing except removing the cross-engine residual."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.plans.indexing import (
    doc_terms,
)

T = 4096
LN2_NANO = round(math.log(2) * 1e9)
L = [round(math.log((T + i) / T) * 1e9) for i in range(T + 1)]

SF = "/root/testdata/sf0.001"


def _ln_nano_sql(n: str) -> str:
    p2 = f"(CAST(1 AS BIGINT) << (length(bin({n})) - 1))"
    m = f"((({n} * {T}) div {p2}) - {T} + 1)"
    lo = f"element_at(LTAB, CAST({m} AS INT))"
    hi = f"element_at(LTAB, CAST({m} + 1 AS INT))"
    r = f"(({n} * {T}) % {p2})"
    return (
        f"({lo} + ({r} * ({hi} - {lo})) div {p2}"
        f" + (length(bin({n})) - 1) * CAST({LN2_NANO} AS BIGINT))"
    )


def _py_ln_nano(n: int) -> int:
    k = n.bit_length() - 1
    nT = n * T
    m = nT >> k
    r = nT % (1 << k)
    return L[m - T] + (r * (L[m - T + 1] - L[m - T])) // (1 << k) + k * LN2_NANO


def test_table_ln_is_exact_and_within_one_micro_of_libm(spark):
    wc = (
        doc_terms(spark, SF, 1)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = wc.agg(F.sum("cnt").alias("tot"))
    got = (
        wc.crossJoin(F.broadcast(tot))
        .withColumn("LTAB", F.array(*[F.lit(x) for x in L]))
        .select(
            "term",
            "cnt",
            "tot",
            F.expr(
                f"CAST((({_ln_nano_sql('tot')}) - ({_ln_nano_sql('cnt')})"
                " + 500) div 1000 AS BIGINT)"
            ).alias("micro_fx"),
        )
        .collect()
    )
    assert got
    for r in got:
        cnt, tot_v = int(r["cnt"]), int(r["tot"])
        # (a) the Spark expression IS the integer recurrence, bit-exact
        want_fx = (_py_ln_nano(tot_v) - _py_ln_nano(cnt) + 500) // 1000
        assert r["micro_fx"] == want_fx, (cnt, tot_v)
        # (b) within one micro-unit of the libm rendering in use today
        libm = math.floor(-math.log(cnt / tot_v) * 1e6 + 0.5)
        assert abs(r["micro_fx"] - libm) <= 1, (cnt, tot_v)
