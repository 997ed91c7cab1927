"""One-off 10x scale rehearsal (r12 verdict #6): replicate the sf0.1
corpus ~10x with a per-replica letter rotation (a char bijection keeps
every length/token statistic and the WITHIN-replica near-dup structure
while making replicas' vocab/shingle spaces disjoint — no artificial
45x cross-replica dup explosion), then time the five slowest pipeline
ops at 1x and 10x in identical fresh-session order. Results land in
SCALE.md as the measured wall-vs-size curvature table.

Usage:
    python scale_rehearsal_r13.py build   # write /tmp/smse_scale10
    python scale_rehearsal_r13.py run SF_DIR
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/smse_scale10"
N_REP = 10
OFF = 1_000_000  # multiple of 10: doc_id % DOC_DELTA_MOD preserved


def build() -> None:
    from pyspark.sql import functions as F

    from simple_mapreduce_search_engine_information_retrieval__spark.session import (
        get_spark,
    )

    spark = get_spark("scale10-build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = []
    for r in range(N_REP):
        rot_l = lower[r:] + lower[:r]
        rot_u = upper[r:] + upper[:r]
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * OFF)).alias("doc_id"),
                # per-replica Caesar rotation: a letter bijection, so
                # token lengths, piece counts, within-replica dup/near-
                # dup structure and n_chars are all preserved; replicas'
                # token/shingle spaces are disjoint for r != 0
                F.translate("text", lower + upper, rot_l + rot_u).alias(
                    "text"
                ),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ereps = []
    for r in range(N_REP):
        ereps.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * OFF)).alias("vec_id"),
                "embedding",  # identical vectors per replica (disclosed)
                "label",
            )
        )
    eout = ereps[0]
    for r in ereps[1:]:
        eout = eout.unionByName(r)
    eout.repartition(8).write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet"
    )

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events",
    ):
        dst = f"{DST}/{t}.parquet"
        if os.path.exists(dst) or os.path.islink(dst):
            if os.path.isdir(dst) and not os.path.islink(dst):
                shutil.rmtree(dst)
            else:
                os.remove(dst)
        os.symlink(f"{SRC}/{t}.parquet", dst)
    print("built", DST)


def run(sf_dir: str) -> None:
    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.session import (
        get_spark,
    )

    import __spark_entry__ as e

    spark = get_spark("scale10-run")
    spark.sparkContext.setLogLevel("ERROR")
    registry = e.queries()
    # identical fresh-session order at both scales; dedup cold is the
    # bench's cold composition (caches cleared first)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm FS
    timings = {}

    from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
        minhash_near_dups,
    )

    caches.clear()
    t0 = time.perf_counter()
    minhash_near_dups(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["dedup_minhash_build_cold"] = round(time.perf_counter() - t0, 2)

    for name in (
        "text_bpe_export_hf_roundtrip",
        "pipeline_end_to_end",
        "knn_ivfpq_adc",
        "streaming_near_dup_pairs",
    ):
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings}))


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(sys.argv[2])
