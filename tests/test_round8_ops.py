"""Round-8 extension ops beyond the oracle gate: intra-doc repetition
scrub (Python ground-truth replay + invariants) and tokenizer fertility
(accounting consistency with the encoder)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
    bpe,
    textstats,
)
from simple_mapreduce_search_engine_information_retrieval__spark.plans.corpus import (
    tokenized_docs,
)
from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
    table,
)

SF = "/root/testdata/sf0.001"


def _py_scrub(toks: list[str], n: int) -> list[str]:
    """First-occurrence-wins repeated-n-gram span removal, independent
    of the query's set algebra: walk every gram occurrence, mark the
    spans of non-first occurrences, keep uncovered positions."""
    first: dict[tuple, int] = {}
    dropped: set[int] = set()
    grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    for i, g in enumerate(grams):
        if g not in first:
            first[g] = i
        elif i > first[g]:
            dropped.update(range(i, i + n))
    return [t for i, t in enumerate(toks) if i not in dropped]


def test_repetition_scrub_matches_python_replay(spark):
    docs = {
        r["doc_id"]: list(r["toks"])
        for r in tokenized_docs(spark, SF).select("doc_id", "toks").collect()
    }
    # replicate the seeded copy-paste tail (see textstats.SCRUB_SEED_MOD)
    for doc_id, toks in docs.items():
        if (
            doc_id % textstats.SCRUB_SEED_MOD == 0
            and len(toks) >= textstats.SCRUB_SEED_LEN
        ):
            docs[doc_id] = toks + toks[: textstats.SCRUB_SEED_LEN]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["kept_hash"])
        for r in textstats.repetition_scrub(spark, SF).collect()
    }
    assert set(got) == set(docs)
    any_scrubbed = False
    for doc_id, toks in docs.items():
        kept = _py_scrub(toks, textstats.SCRUB_N)
        want_hash = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert got[doc_id] == (len(toks), len(kept), want_hash), doc_id
        if len(kept) < len(toks):
            any_scrubbed = True
        # short docs pass through whole
        if len(toks) < textstats.SCRUB_N:
            assert len(kept) == len(toks)
    # the raw fixture prose has NO repeated 5-grams (why the seeded
    # copy-paste tails exist — see textstats.SCRUB_SEED_MOD); the
    # seeding must make the scrub arm do real work, not vacuously pass
    assert any_scrubbed


def test_tokenizer_fertility_accounting(spark):
    """Per-source totals must re-aggregate the encoder's per-doc rows
    exactly, and the ppm ratio must be the integer floor of the
    division of those totals."""
    enc = {
        r["doc_id"]: r["n_ids"]
        for r in bpe.tokenize_ids(spark, SF).select("doc_id", "n_ids").collect()
    }
    docs = (
        table(spark, SF, "documents")
        .select("doc_id", "source", F.octet_length("text").alias("nb"))
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in docs:
        if r["doc_id"] in enc:
            agg = want.setdefault(r["source"], [0, 0, 0])
            agg[0] += 1
            agg[1] += r["nb"]
            agg[2] += enc[r["doc_id"]]
    got = {
        r["source"]: (
            r["n_docs"],
            r["total_bytes"],
            r["total_ids"],
            r["bytes_per_id_ppm"],
        )
        for r in bpe.tokenizer_fertility(spark, SF).collect()
    }
    import math

    assert set(got) == set(want)
    for src, (nd, nb, ni) in want.items():
        # the query's divide-first double form, replayed exactly
        ppm = math.floor(nb / ni * 1_000_000.0 + 0.5)
        assert got[src] == (nd, nb, ni, ppm), src
