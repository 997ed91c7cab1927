"""The grading driver calls entry()/queries() with ITS OWN SparkSession —
no session.py defaults. Simulate that with a vanilla session in a clean
subprocess and run the config-sensitive paths (nanos timestamps, UDFs,
streaming-batch twins)."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap


def test_canon_rejects_raw_array_columns(spark):
    """The round-3 regression class: the driver canon sorts RAW output
    columns before hashing, so a plain array<bigint> column hard-errors
    (factorize on unhashable lists). The local gate must reproduce that:
    the raw-array int8 rendering FAILS compare(), the csv rendering
    PASSES, and no registered query ships a top-level array/map column."""
    from simple_mapreduce_search_engine_information_retrieval__spark.oracle import (
        compare,
        duck_connect,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
        DUCK_INT8_QUANTIZE,
        int8_quantize,
        int8_quantize_rendered,
    )

    sf = "/root/testdata/sf0.001"
    con = duck_connect(sf)
    try:
        raw_sql = """
        SELECT vec_id, round(s, 6) AS scale,
               list_transform(embedding,
                              v -> CAST(floor(CAST(v AS DOUBLE) / s + 0.5) AS BIGINT)) AS qvec
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS s
              FROM embeddings)
        """
        raw = int8_quantize(spark, sf)
        issues = compare(raw, con, raw_sql)
        assert issues and "driver-canon sort failed" in issues[0], issues
        assert compare(int8_quantize_rendered(spark, sf), con, DUCK_INT8_QUANTIZE) == []
    finally:
        con.close()


def test_no_registered_query_outputs_raw_arrays(spark):
    """Schema-level guard over the whole registry: plan every query at
    sf0.001 and assert no top-level ArrayType/MapType output column —
    the driver canon cannot hash them (struct columns are fine: Rows are
    tuples)."""
    import io
    from contextlib import redirect_stdout, redirect_stderr

    from pyspark.sql.types import ArrayType, MapType

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in e.queries().items():
        sink = io.StringIO()
        with redirect_stdout(sink), redirect_stderr(sink):
            schema = fn(spark, sf).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


def test_changed_this_round_names_exist():
    """Every name in CHANGED_THIS_ROUND must be a registered query — a
    typo or a renamed query would silently drop the re-verify bump."""
    import __spark_entry__ as e

    registry = set(e.queries())
    missing = set(e.CHANGED_THIS_ROUND) - registry
    assert not missing, missing


def test_vanilla_session_runs_contract():
    code = textwrap.dedent(
        """
        import json, sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession

        # deliberately NO engine configs — mirrors the driver's session
        spark = (SparkSession.builder.master("local[4]")
                 .appName("driver-sim").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        import __spark_entry__ as e

        out = {}
        out["entry_rows"] = len(e.entry(spark).collect())
        q = e.queries()
        sf = "/root/testdata/sf0.001"
        for name in ["events_hourly", "streaming_sessionize_users",
                     "events_user_zscores", "search_two_term",
                     "text_quality_scores", "dedup_simhash",
                     # round-4 surfaces: warm-index BM25, shared
                     # tokenized scan, nanos week math, file-writing
                     # compaction, cached graph
                     "search_bm25", "pipeline_pack_sequences",
                     "events_retention_cohorts",
                     "index_compaction_roundtrip",
                     "graph_pagerank_terms"]:
            out[name] = q[name](spark, sf).count()
        print("RESULT:" + json.dumps(out))
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=420
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert lines, f"no result line; stderr tail: {proc.stderr[-2000:]}"
    out = json.loads(lines[0][len("RESULT:"):])
    assert out["entry_rows"] == 10
    assert all(v > 0 for v in out.values()), out


def test_bench_headline_line_fits_capture_window():
    """The driver parses the bench JSON from the LAST 2000 chars of
    stdout (BENCH_r01..r03 were all "parsed": null because the full
    per-query map overflowed it). The rendered line must fit the window
    for the REAL registry under worst-case timing widths."""
    import bench
    import __spark_entry__ as e

    names = list(e.queries()) + [
        "search_indexed_warm",
        "search_phrase_indexed_warm",
        "knn_ivf_store_warm",
        "knn_ivfpq_adc_warm",
        "knn_ivfpq_store_warm",
        "knn_ivf_trained_warm",
        "dedup_minhash_build_cold",
    ]
    # worst-case widths: the 25 LONGEST names are the slowest (they are
    # the ones the line will carry), 4-digit seconds, 3 decimals
    longest = set(sorted(names, key=len, reverse=True)[:25])
    timings = {n: (9999.999 if n in longest else 0.001) for n in names}
    scalars = {
        "sf": 0.1,
        "n_queries": len(timings),
        "metric": "headline_queries_total_wall",
        "value": 999999.999,
        "unit": "sec",
        "index_corpus_note": "cold build (memo caches cleared), "
        "fixture replicated to the reference's 22.8 MiB corpus "
        "size; raw_sf is the overhead-bound small-corpus rate",
        "index_mib_per_sec_raw_sf": 9999.999,
        "baseline_index_mib_per_sec": 0.45,
        "index_mib_per_sec": 9999.999,
        "box_cpu_sec": 9999.999,
        "box_job_overhead_sec": 9999.999,
    }
    line = bench.render_headline(timings, scalars)
    assert len(line) < bench.CAPTURE_WINDOW, len(line)
    import json as _json

    parsed = _json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert len(parsed["queries"]) == bench.N_SLOWEST
