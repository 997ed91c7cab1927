"""S3/S4 parser queries — the TREC *text* and TREC *web* parsers run
over a TREC-shaped rendering of the documents fixture, oracle-checked.

The reference parses TREC records it reads off disk
(TrecTextParser.java:49-94, TrecWebParser.java:37-96). Here the record
string is CONSTRUCTED in-query from the fixture columns (both engines
build the identical string from the identical columns), then parsed
with the S3/S4 column expressions — which makes the full parse
pipeline oracle-checkable without a side file. The constructed records
include a non-whitelisted tag (<BYLINE>) that must NOT leak into the
parsed text, multi-tag content ordered by the whitelist, and a
scrub-needing URL (mixed case, :80 port, trailing slash).

Spark and DuckDB renderings are generated from the same tag whitelist
and regex constants so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parsers import TEXT_TAG_WHITELIST, dochdr_url, whitelisted_text
from ..functions.tokenize import WS_CHARS
from ..sources.tables import table
from . import QuerySpec

# record templates, as (literal, column, literal, ...) alternations;
# columns are rendered F.col() on the Spark side, raw names in SQL
_TEXT_RECORD = (
    "<DOC>\n<DOCNO> ", "doc_id", " </DOCNO>\n<BYLINE>not indexed</BYLINE>\n"
    "<HEADLINE>\n", "source", " bulletin\n</HEADLINE>\n<TEXT>\n", "text",
    "\n</TEXT>\n</DOC>",
)

_WEB_RECORD = (
    "<DOC>\n<DOCNO> ", "doc_id", " </DOCNO>\n<DOCHDR>\nHTTP://Example.COM:80/",
    "source", "/", "doc_id", "/ \nHTTP/1.1 200 OK\ncontent-type: text/html\n"
    "</DOCHDR>\n", "text", "\n</DOC>",
)

_COLUMNS = {"doc_id", "source", "text"}


def _spark_record(parts: tuple[str, ...]):
    return F.concat(
        *[
            F.col(p).cast("string") if p in _COLUMNS else F.lit(p)
            for p in parts
        ]
    )


def _duck_record(parts: tuple[str, ...]) -> str:
    rendered = [
        f"CAST({p} AS VARCHAR)" if p in _COLUMNS else "'" + p.replace("\n", "' || chr(10) || '") + "'"
        for p in parts
    ]
    return "(" + " || ".join(rendered) + ")"


def trec_text_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, parsed_text): whitelisted-tag extraction (S3) over the
    TREC-text rendering — <BYLINE> content must be absent, <TEXT> before
    <HEADLINE> per the whitelist order."""
    docs = table(spark, sf_dir, "documents")
    rec = _spark_record(_TEXT_RECORD)
    return docs.select("doc_id", whitelisted_text(rec).alias("parsed_text"))


def _duck_whitelisted_text(rec_sql: str) -> str:
    """DuckDB rendering of functions.parsers.whitelisted_text — same tag
    whitelist, same per-tag regex, same join+trim shape."""
    parts = ", ".join(
        f"array_to_string(regexp_extract_all({rec_sql}, '(?s)<{t}>(.*?)</{t}>', 1), ' ')"
        for t in TEXT_TAG_WHITELIST
    )
    joined = f"concat_ws(' ', {parts})"
    return (
        f"regexp_replace({joined}, "
        f"'(?s)^[{WS_CHARS}]+|[{WS_CHARS}]+$', '', 'g')"
    )


def duck_trec_text_parsed() -> str:
    rec = _duck_record(_TEXT_RECORD)
    return (
        f"SELECT doc_id, {_duck_whitelisted_text(rec)} AS parsed_text "
        f"FROM documents"
    )


def trec_web_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url): DOCHDR URL extraction + scrub (S4) over the
    TREC-web rendering — lowercased, :80 stripped, trailing slash
    stripped."""
    docs = table(spark, sf_dir, "documents")
    rec = _spark_record(_WEB_RECORD)
    return docs.select("doc_id", dochdr_url(rec).alias("url"))


def duck_trec_web_urls() -> str:
    rec = _duck_record(_WEB_RECORD)
    raw = (
        f"regexp_extract({rec}, "
        f"'(?s)<DOCHDR>[{WS_CHARS}]*([^{WS_CHARS}]+)', 1)"
    )
    u = f"lower(trim({raw}))"
    u = f"regexp_replace({u}, '#$', '')"
    u = f"regexp_replace({u}, ':80(/|$)', '\\1')"
    u = f"regexp_replace({u}, '/+$', '')"
    return f"SELECT doc_id, {u} AS url FROM documents"


QUERIES: dict[str, QuerySpec] = {
    "trec_text_parsed": QuerySpec(
        fn=trec_text_parsed,
        oracle=duck_trec_text_parsed(),
        note="S3 whitelist parser (TrecTextParser.java:49-94) over an "
        "in-query TREC-text rendering of the fixture",
    ),
    "trec_web_urls": QuerySpec(
        fn=trec_web_urls,
        oracle=duck_trec_web_urls(),
        note="S4 DOCHDR URL extract + scrub (TrecWebParser.java:37-96) "
        "over an in-query TREC-web rendering of the fixture",
    ),
}
