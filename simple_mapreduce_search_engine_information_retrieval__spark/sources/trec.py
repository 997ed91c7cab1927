"""TREC-format XML ingestion — the reference's input path (S1/S2:
XMLInputFormat.java:54-199 + TrecDocumentInputFormat.java:38-115), done
the Spark way: ``spark.read.text`` with a record separator instead of a
hand-rolled byte-at-a-time tag matcher.

Split alignment note (the part the reference spends 160 lines on): Spark's
text source with a multi-char ``lineSep`` handles records spanning split
boundaries itself, and gzip falls back to a single-split stream exactly
like the reference's non-seekable path (XMLInputFormat.java:82-90). At
100 TB you shard the corpus into many .gz/.zst files and parallelism comes
from file count; plain text splits by range automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import WS_CHARS


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id string, text string) from concatenated
    <DOC><DOCNO>..</DOCNO>..body..</DOC> blocks.

    docid = trimmed contents of <DOCNO> (TrecDocument.java:76-89); text =
    the raw record contents (TrecDocument.java:94-96 returns raw XML; we
    strip only the DOC/DOCNO envelope)."""
    raw = spark.read.text(path, lineSep="</DOC>")
    rec = F.col("value")
    doc_id = F.trim(F.regexp_extract(rec, r"(?s)<DOCNO>(.*?)</DOCNO>", 1))
    # note: Spark's trim() strips only ' ' — use an explicit \s strip so
    # newlines around the body go too
    body = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(rec, r"(?s)^.*?<DOCNO>.*?</DOCNO>", ""),
            r"(?s)<DOC>|</DOC>|<TEXT>|</TEXT>",
            " ",
        ),
        f"(?s)^[{WS_CHARS}]+|[{WS_CHARS}]+$",
        "",
    )
    return (
        raw.filter(F.instr(rec, "<DOCNO>") > 0)
        .select(doc_id.alias("doc_id"), body.alias("text"))
    )


def write_trec_fixture(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Render the documents fixture as a TREC XML file (test/demo helper:
    FIXTURES.md 'trec_raw')."""
    from .tables import table

    docs = table(spark, sf_dir, "documents").orderBy("doc_id")
    rows = docs.select(
        F.concat(
            F.lit("<DOC>\n<DOCNO> "),
            F.col("doc_id").cast("string"),
            F.lit(" </DOCNO>\n<TEXT>\n"),
            F.col("text"),
            F.lit("\n</TEXT>\n</DOC>"),
        ).alias("rec")
    ).collect()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("".join(r.rec for r in rows))
    return out_path
