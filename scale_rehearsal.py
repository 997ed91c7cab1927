"""Parameterized 10x scale rehearsal (r13 verdict optional #8 — the
one-off scale_rehearsal_r13.py retired into a reusable script).

Replicates the sf0.1 corpus N_REP x with a per-replica letter rotation
(a char bijection keeps every length/token statistic and the
WITHIN-replica near-dup structure while making replicas' vocab/shingle
spaces disjoint — no artificial cross-replica dup explosion), then
times selected probes at 1x and 10x in identical fresh-session order.
Results are appended (round-stamped, by hand) to SCALE.md's measured
wall-vs-size tables. Use per-scale MINIMA across repeats for A/B
comparisons — the drift-resistant estimator (SCALE.md r13 note).

Usage:
    python scale_rehearsal.py build [N_REP]      # write /tmp/smse_scale10
    python scale_rehearsal.py run SF_DIR         # r13 five-slowest set
    python scale_rehearsal.py stages SF_DIR      # per-stage capstone
    python scale_rehearsal.py index SF_DIR       # inv_postings_k1 MiB/s

`stages` answers r13 verdict #5 (which pipeline_end_to_end stage is
data-coupled): each gate/mix/fill/pack stage is materialized and timed
separately AFTER the shared tokenized-corpus cache is warm (the
capstone's own steady state — every stage reads that one cached scan),
so a stage's number is its marginal cost, not a re-tokenize.

`index` cold-times the registry's inv_postings_k1 (caches cleared
first — the bench's honesty rule: a warm postings cache substitutes
into an identical plan fragment and silently turns a build into a
serve) and reports MiB/s over the corpus's summed n_chars.
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
OFF = 1_000_000  # multiple of 10: doc_id % DOC_DELTA_MOD preserved

RUN_OPS = (
    "text_bpe_export_hf_roundtrip",
    "pipeline_end_to_end",
    "knn_ivfpq_adc",
    "streaming_near_dup_pairs",
)


def _spark(name: str):
    from simple_mapreduce_search_engine_information_retrieval__spark.session import (
        get_spark,
    )

    spark = get_spark(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build(n_rep: int = 10) -> None:
    from pyspark.sql import functions as F

    if not 1 <= n_rep <= 26:
        # the Caesar rotation wraps at 26: replicas 26.. would reuse
        # rotations 0.. and share vocab/shingle spaces — exactly the
        # cross-replica dup explosion the rotation exists to avoid
        raise SystemExit(f"n_rep must be 1..26 (got {n_rep})")
    spark = _spark("scale10-build")
    os.makedirs(DST, exist_ok=True)
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = []
    for r in range(n_rep):
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
    for r in range(n_rep):
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
    print("built", DST, f"n_rep={n_rep}")


def run(sf_dir: str) -> None:
    """The r13 five-slowest-ops set, identical fresh-session order at
    both scales; dedup cold is the bench's cold composition."""
    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
        minhash_near_dups,
    )

    import __spark_entry__ as e

    spark = _spark("scale10-run")
    registry = e.queries()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm FS
    timings = {}

    caches.clear()
    t0 = time.perf_counter()
    _noop(minhash_near_dups(spark, sf_dir))
    timings["dedup_minhash_build_cold"] = round(time.perf_counter() - t0, 2)

    for name in RUN_OPS:
        t0 = time.perf_counter()
        _noop(registry[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings}))


def stages(sf_dir: str) -> None:
    """pipeline_end_to_end decomposed: per-stage marginal wall time
    with the shared tokenized scan pre-warmed (the capstone's own
    steady state). Stage list mirrors _end_to_end_lens /
    _end_to_end_budget_lens / _pack_from_lens."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.corpus import (
        tokenized_docs,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
        decontaminate_overlaps,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.pipeline import (
        _end_to_end_budget_lens,
        _end_to_end_lens,
        _pack_from_lens,
        clean_corpus,
        doremi_mix,
        pipeline_end_to_end,
    )

    spark = _spark("scale10-stages")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm FS
    timings = {}

    t0 = time.perf_counter()
    tokenized_docs(spark, sf_dir).count()
    timings["tokenize_cache_fill"] = round(time.perf_counter() - t0, 2)

    for name, fn in (
        ("clean_corpus", lambda: clean_corpus(spark, sf_dir)),
        ("decontaminate", lambda: decontaminate_overlaps(spark, sf_dir)),
        ("doremi_mix", lambda: doremi_mix(spark, sf_dir)),
    ):
        t0 = time.perf_counter()
        _noop(fn())
        timings[name] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    gate = _end_to_end_lens(spark, sf_dir).localCheckpoint()
    timings["gate_join_ckpt"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    budget = _end_to_end_budget_lens(spark, sf_dir, gate).localCheckpoint()
    timings["budget_fill_ckpt"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    _noop(_pack_from_lens(budget))
    timings["pack"] = round(time.perf_counter() - t0, 2)

    # the composed capstone, same session, for cross-checking that the
    # stage sum ~= the one-query number (memoized stages now warm, so
    # this reads as the steady-state serve)
    t0 = time.perf_counter()
    _noop(pipeline_end_to_end(spark, sf_dir))
    timings["composed_warm"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"sf_dir": sf_dir, "stage_timings": timings}))


def index(sf_dir: str) -> None:
    """Cold inverted-index build MiB/s at the given corpus — the op
    BASELINE.md prices (reference: 0.45 MiB/s at its 22.8 MiB corpus)."""
    from pyspark.sql import functions as F

    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
    )

    import __spark_entry__ as e

    spark = _spark("scale10-index")
    registry = e.queries()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_bytes = docs.agg(F.sum("n_chars")).collect()[0][0]
    caches.clear()
    t0 = time.perf_counter()
    _noop(registry["inv_postings_k1"](spark, sf_dir))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "corpus_mib": round(corpus_bytes / (1024 * 1024), 2),
                "inv_postings_k1_sec": round(dt, 2),
                "mib_per_sec": round(corpus_bytes / (1024 * 1024) / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "build":
        build(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
    elif cmd == "run":
        run(sys.argv[2])
    elif cmd == "stages":
        stages(sys.argv[2])
    elif cmd == "index":
        index(sys.argv[2])
    else:
        raise SystemExit(f"unknown command {cmd!r}")
