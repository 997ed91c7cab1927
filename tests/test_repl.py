"""REPL loop behavior (reference IntDocVectorsForwardIndex.java:243-322):
docid display via the J3 mapping join, the 3+-word guard (warn, don't
terminate — documented P4 divergence), and scriptable stdin driving."""

from __future__ import annotations

import io

from simple_mapreduce_search_engine_information_retrieval__spark import repl


def test_repl_session(spark, monkeypatch):
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("spark join\nthe spark is very fast\n\n")
    )
    out = io.StringIO()
    rc = repl.main(["/root/testdata/sf0.001"], out=out)
    assert rc == 0
    text = out.getvalue()
    # hits display rank, docno AND the J3 docid join
    assert " 1. doc " in text and "[" in text
    # 3+-word query warns but the loop continues (two prompts after it)
    assert "reference REPL constraint" in text
    assert text.count("blank to quit") == 3
