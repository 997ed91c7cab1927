"""TREC-XML ingestion roundtrip (reference S1/S2)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import table
from simple_mapreduce_search_engine_information_retrieval__spark.sources.trec import (
    read_trec,
    write_trec_fixture,
)


def test_trec_roundtrip(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        path = write_trec_fixture(spark, sf_dir, f"{tmp}/corpus.trec")
        got = read_trec(spark, path)
        want = table(spark, sf_dir, "documents")
        assert got.count() == want.count()
        joined = got.alias("g").join(
            want.select(F.col("doc_id").cast("string").alias("doc_id"), "text").alias("w"),
            "doc_id",
        )
        assert joined.count() == want.count()
        mismatched = joined.filter(F.col("g.text") != F.col("w.text")).count()
        assert mismatched == 0


def test_trec_multiline_and_missing_docno(spark):
    import os, tempfile

    content = (
        "<DOC>\n<DOCNO> A1 </DOCNO>\n<TEXT>\nline one\nline two\n</TEXT>\n</DOC>"
        "<DOC>\nno docno here\n</DOC>"
        "<DOC>\n<DOCNO>B2</DOCNO>\n<TEXT>body</TEXT>\n</DOC>"
    )
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "x.trec")
        open(p, "w").write(content)
        rows = {r.doc_id: r.text for r in read_trec(spark, p).collect()}
        # record without <DOCNO> dropped (reference would NPE-skip it)
        assert set(rows) == {"A1", "B2"}
        assert rows["A1"] == "line one\nline two"
        assert rows["B2"] == "body"


def test_trec_gzip_multidoc(spark, sf_dir):
    """S1's non-seekable path (XMLInputFormat.java:82-90 analogue):
    a gzipped multi-doc TREC file must parse record-for-record
    identically to its plain-text twin — Spark's text source treats the
    .gz as one unsplittable stream, which is exactly the reference's
    gzip fallback."""
    import gzip
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        plain = write_trec_fixture(spark, sf_dir, f"{tmp}/corpus.trec")
        gz = os.path.join(tmp, "corpus.trec.gz")
        with open(plain, "rb") as src, gzip.open(gz, "wb") as dst:
            dst.write(src.read())
        got = {r.doc_id: r.text for r in read_trec(spark, gz).collect()}
        want = {r.doc_id: r.text for r in read_trec(spark, plain).collect()}
        assert got == want
        assert len(got) == table(spark, sf_dir, "documents").count()


def test_jsonl_source_quarantines_corrupt_records(spark, tmp_path):
    """PERMISSIVE mode: malformed JSONL lines land in _corrupt_record
    instead of failing the 100 TB job; clean rows parse normally."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good row"}\n'
        "{broken json!!\n"
        '{"doc_id": 2, "text": "also good"}\n'
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # corrupt-record column requires a materialized referent
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    df.unpersist()
