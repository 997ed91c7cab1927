"""Dump explain('formatted') for the r17-touched queries.

Usage: python plans/r17/dump_plans.py <out_dir> <suffix>
Run from a checkout root (HEAD for _after, the pre-round commit's
worktree for _before). sf0.001 — plan shape is size-independent (the
PLAN_AUDIT precedent). Roundtrip queries execute their build side
effects; the dumped plan is the serve plan, as in PLAN_AUDIT.
"""

import os
import sys

sys.path.insert(0, os.getcwd())

TOUCHED = [
    "search_mmr_rerank",
    "events_user_zscores_grouped",
    "multimodal_audio_features",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_stats",
    "multimodal_phash_clusters",
    "search_indexed_roundtrip",
    "search_phrase_indexed_roundtrip",
    "wildcard_indexed_roundtrip",
    "knn_ivf_store_roundtrip",
    "knn_ivfpq_store_roundtrip",
    "knn_ivf_rebalanced_roundtrip",
    "streaming_vector_ingest",
    "text_lang_id",
    "search_passages",
    "inv_postings_k1",
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
