"""Secondary document parsers (reference S3/S4 — not on the index hot
path, provided for source parity).

- TREC *text* stream shape: content inside a whitelist of tags
  (TrecTextParser.java:49-94, whitelist :58-63);
- TREC *web* shape: <DOCHDR> URL extraction + scrubbing
  (TrecWebParser.java:65-96, scrub :37-53).

Both are pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenize import WS_CHARS

# TrecTextParser.java:58-63
TEXT_TAG_WHITELIST = (
    "TEXT", "HEADLINE", "TITLE", "HL", "HEAD",
    "TTL", "DD", "DATE", "LP", "LEADPARA",
)


def whitelisted_text(record: Column) -> Column:
    """Concatenate the contents of whitelisted tags, in document order of
    tag type (TEXT first, etc.), separated by single spaces."""
    parts = [
        F.array_join(
            F.regexp_extract_all(
                record, F.lit(f"(?s)<{t}>(.*?)</{t}>"), F.lit(1)
            ),
            " ",
        )
        for t in TEXT_TAG_WHITELIST
    ]
    joined = F.concat_ws(" ", *parts)
    return F.regexp_replace(joined, f"(?s)^[{WS_CHARS}]+|[{WS_CHARS}]+$", "")


def scrub_url(url: Column) -> Column:
    """Reference URL normalization (TrecWebParser.java:37-53): lowercase,
    strip a trailing '#', strip ':80' port, strip trailing slashes."""
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, r"#$", "")
    u = F.regexp_replace(u, r":80(/|$)", "$1")
    u = F.regexp_replace(u, r"/+$", "")
    return u


def dochdr_url(record: Column) -> Column:
    """First line of the <DOCHDR> block = the crawled URL
    (TrecWebParser.java:65-96)."""
    raw = F.regexp_extract(
        record, f"(?s)<DOCHDR>[{WS_CHARS}]*([^{WS_CHARS}]+)", 1
    )
    return scrub_url(raw)
