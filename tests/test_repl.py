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


def test_cli_search_and_docnos(spark, tmp_path, capsys=None):
    import io

    from simple_mapreduce_search_engine_information_retrieval__spark.__main__ import (
        main,
    )

    buf = io.StringIO()
    rc = main(
        ["search", "spark join", "--sf-dir", "/root/testdata/sf0.001"], out=buf
    )
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l and l != "(no hits)"]
    for ln in lines:
        rank, docno, score = ln.split("\t")
        assert int(rank) >= 1 and float(score) == float(score)

    buf = io.StringIO()
    out_dir = str(tmp_path / "docnos")
    rc = main(["docnos", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir], out=buf)
    assert rc == 0 and "docno mappings" in buf.getvalue()
    back = spark.read.option("sep", "\t").csv(out_dir)
    assert back.count() > 0


def test_cli_index_roundtrip(spark, tmp_path):
    import io

    from simple_mapreduce_search_engine_information_retrieval__spark.__main__ import (
        main,
    )

    buf = io.StringIO()
    rc = main(
        [
            "index", "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(tmp_path / "ix"), "--k", "1", "--buckets", "4",
        ],
        out=buf,
    )
    assert rc == 0 and "postings rows" in buf.getvalue()
