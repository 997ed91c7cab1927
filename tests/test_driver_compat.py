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
