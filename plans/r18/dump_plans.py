"""Dump explain('formatted') for the r18-touched queries.

Usage: python plans/r18/dump_plans.py <out_dir> <suffix>
Run from a checkout root (HEAD for _after, the pre-round commit's
worktree for _before). sf0.001 — plan shape is size-independent (the
PLAN_AUDIT precedent). Roundtrip queries execute their build side
effects; the dumped plan is the serve plan, as in PLAN_AUDIT.
"""

import os
import sys

sys.path.insert(0, os.getcwd())

TOUCHED = [
    # tokens_col expression change: representative consumers across the
    # families that re-tokenize inside the timed region
    "inv_postings_k1",
    "inv_postings_k2",
    "chargram_k3",
    "pipeline_pack_sequences",
    "text_lang_id",
    # rebalance exchange fix
    "knn_ivf_rebalanced_roundtrip",
    # capstone job-count work
    "pipeline_end_to_end",
    # store scalar-part fallback (serve path)
    "wildcard_indexed_roundtrip",
    "search_indexed_roundtrip",
    # streaming band-store params part rides the foreachBatch job; its
    # registered query's serve plan is the pairs-store read
    "streaming_near_dup_pairs",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    import __spark_entry__ as e
    from simple_mapreduce_search_engine_information_retrieval__spark.session import (
        get_spark,
    )

    reg = e.queries()
    spark = get_spark("smse-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in TOUCHED:
        try:
            df = reg[name](spark, "/root/testdata/sf0.001")
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print("dumped", name, flush=True)


if __name__ == "__main__":
    main()
