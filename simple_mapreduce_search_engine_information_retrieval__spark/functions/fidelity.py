"""Full-fidelity tokenizer — the reference pipeline F1-F7 (SURVEY.md §2.8)
as one Arrow-vectorized pandas UDF: the only non-built-in compute in the
engine, used for reference-parity scoring (stemmed index) rather than the
oracle-checked hot path.

Pipeline per the reference (GalagoTokenizer.java:139-183):
1. tag-aware cleanup (TagTokenizer.java:97-102,155-169,644-662): drop
   <script>/<style> contents, <!--comments-->, <?pis?>, <tags>; XML
   entities (&...;) break tokens;
2. split on whitespace/control chars and the split-char table
   (TagTokenizer.java:73-95) — '.' and '\'' are NOT split chars;
3. per-token fix-ups (TagTokenizer.java:399-429,479-559):
   - lowercase (ASCII), delete apostrophes (tokenSimpleFix :536-559)
   - tokens containing periods get acronym processing (:479-527):
     strip leading/trailing periods; if periods sit at every odd
     position (i.b.m) delete them; else split on periods keeping
     pieces of length > 1;
4. drop empty tokens and tokens >= 100 bytes UTF-8
   (TagTokenizer.java:439-453);
5. stopword filter on the lowercased token (GalagoTokenizer.java:152-156);
6. Porter2 stem (englishStemmer.java via functions/stemmer.py).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .stopwords import STOPWORD_SET
from .stemmer import stem

_TAG_NOISE = re.compile(
    r"<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
    r"|<!--.*?-->|<\?.*?\?>|<[^>]*>|&[a-zA-Z0-9#]+;",
    re.DOTALL | re.IGNORECASE,
)
# reference split chars EXCLUDING '.' and "'" (TagTokenizer.java:73-95)
_SPLIT = re.compile(r"[\x00-\x20;\"&/:!#?$%()@^*+,=><\[\]{}|`~_-]+")
# TagTokenizer.java:495-501 checks only that every ODD index is '.' —
# even indices are unchecked, so 'a...b' IS an acronym ('ab'). Post-strip
# the token ends on a non-period, so the shape is (any-char '.')+ any-char.
_ALL_PERIODS_ODD = re.compile(r"^(?:.\.)+.$")

MAX_TOKEN_BYTES = 100


def _acronym_process(tok: str) -> list[str]:
    tok = tok.strip(".")
    if not tok:
        return []
    if "." not in tok:
        return [tok]
    if _ALL_PERIODS_ODD.match(tok):
        return [tok.replace(".", "")]
    return [p for p in tok.split(".") if len(p) > 1]


def tokenize_text(text: str, *, stopword: bool = True, do_stem: bool = True) -> list[str]:
    """Reference-fidelity tokenization of one document."""
    if text is None:
        return []
    cleaned = _TAG_NOISE.sub(" ", text)
    out: list[str] = []
    for raw in _SPLIT.split(cleaned):
        if not raw:
            continue
        tok = raw.lower().replace("'", "")
        for piece in _acronym_process(tok):
            if not piece or len(piece.encode("utf-8")) >= MAX_TOKEN_BYTES:
                continue
            if stopword and piece in STOPWORD_SET:
                continue
            out.append(stem(piece) if do_stem else piece)
    return out


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched fidelity tokenizer: array<string> per document."""
    return texts.map(lambda t: tokenize_text(t))


@F.pandas_udf(ArrayType(StringType()))
def tokenize_nostem_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: tokenize_text(t, do_stem=False))
