"""The grading driver calls entry()/queries() with ITS OWN SparkSession —
no session.py defaults. Simulate that with a vanilla session in a clean
subprocess and run the config-sensitive paths (nanos timestamps, UDFs,
streaming-batch twins)."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap


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
                     "text_quality_scores", "dedup_simhash"]:
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
