"""BPE merge learning + tokenize-to-ids properties beyond the oracle
parity gate: the merge table must equal a from-first-principles Python
BPE reference (independent of the SEP-wrap replace trick BOTH engine
renderings share), and encoding must round-trip (decode(encode(piece))
== piece for every distinct corpus piece)."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
    bpe,
)
from simple_mapreduce_search_engine_information_retrieval__spark.plans.textstats import (
    BPE_PATTERN,
)

SF = "/root/testdata/sf0.001"


def _python_reference_merges(pieces: Counter, n_merges: int) -> list[tuple]:
    """Plain-Python BPE (Sennrich 2016): per-iteration weighted adjacent
    pair counts over the piece vocabulary, argmax with (count DESC,
    lhs, rhs) tiebreak, greedy left-to-right one-pass application."""
    vocab = {p: (list(p), c) for p, c in pieces.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        assert counts, f"pair supply exhausted at merge {rank}"
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), n = best
        merges.append((rank, lhs, rhs, n))
        for piece, (syms, c) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[piece] = (out, c)
    return merges


@pytest.fixture(scope="module")
def corpus_pieces() -> Counter:
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    pat = re.compile(BPE_PATTERN)
    counts: Counter = Counter()
    for text in docs["text"]:
        # findall would return the capture GROUP (empty for
        # non-contraction pieces) — group(0) is the whole match
        for m in pat.finditer(text.lower()):
            piece = m.group(0)
            if bpe.SEP not in piece:
                counts[piece] += 1
    return counts


def test_merges_match_python_reference(spark, corpus_pieces):
    expected = _python_reference_merges(corpus_pieces, bpe.N_MERGES)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["n_occ"])
        for r in bpe.bpe_merges(spark, SF).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_merge_counts_nonincreasing(spark):
    """A merge's product pairs inherit occurrences from strictly fewer
    sites than the chosen max, so the chosen count can never rise."""
    ns = [
        r["n_occ"]
        for r in bpe.bpe_merges(spark, SF).orderBy("merge_rank").collect()
    ]
    assert len(ns) == bpe.N_MERGES
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert all(n > 0 for n in ns)


def test_tokenize_roundtrip_and_bounded_vocab(spark, corpus_pieces):
    """decode(encode(piece)) == piece for EVERY distinct corpus piece,
    via the same (symbols -> sorted ids) assignment the query uses; and
    the symbol vocabulary is bounded by alphabet + N_MERGES."""
    merges = bpe.learned_merges(spark, SF)
    # replay encoding in Python with the learned merges
    enc = {}
    for piece in corpus_pieces:
        syms = list(piece)
        for _rank, lhs, rhs, _n in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        enc[piece] = syms
    symbols = sorted({s for syms in enc.values() for s in syms})
    alphabet = {c for piece in corpus_pieces for c in piece}
    assert len(symbols) <= len(alphabet) + bpe.N_MERGES
    ids = {s: i for i, s in enumerate(symbols)}
    rev = {i: s for s, i in ids.items()}
    for piece, syms in enc.items():
        decoded = "".join(rev[ids[s]] for s in syms)
        assert decoded == piece


def test_doc_hash_matches_python_replay(spark, corpus_pieces):
    """End-to-end: one doc's ids_hash equals a full Python replay
    (pre-tokenize -> merge-apply -> id-assign -> csv -> md5)."""
    import hashlib

    merges = bpe.learned_merges(spark, SF)
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).head(5)
    pat = re.compile(BPE_PATTERN)

    def encode_piece(piece, memo={}):
        if piece not in memo:
            syms = list(piece)
            for _rank, lhs, rhs, _n in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == lhs
                        and syms[i + 1] == rhs
                    ):
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[piece] = syms
        return memo[piece]

    all_syms = sorted(
        {
            s
            for p in corpus_pieces
            for s in encode_piece(p)
        }
    )
    ids = {s: i for i, s in enumerate(all_syms)}
    got = {
        r["doc_id"]: (r["n_ids"], r["sum_ids"], r["ids_hash"])
        for r in bpe.tokenize_ids(spark, SF)
        .filter("doc_id in (%s)" % ",".join(str(d) for d in docs["doc_id"]))
        .collect()
    }
    for _, row in docs.iterrows():
        seq = [
            ids[s]
            for m in pat.finditer(row["text"].lower())
            if bpe.SEP not in m.group(0)
            for s in encode_piece(m.group(0))
        ]
        csv = ",".join(str(i) for i in seq)
        want = (
            len(seq),
            sum(seq),
            hashlib.md5(csv.encode()).hexdigest(),
        )
        assert got[int(row["doc_id"])] == want


def test_hostile_corpus_cross_engine(spark, tmp_path):
    """Crafted corpus with the divergence hazards the fixture lacks:
    contractions, digit and punctuation runs, a literal SEP byte (the
    framing guard must drop that piece in BOTH engines), Unicode line
    terminators U+2028/U+0085 (not \\s in Java or RE2 -- they land in
    punct pieces; the (?s) wrap must frame them identically), em-dash,
    quotes, repeated whitespace. Both BPE queries must match their
    DuckDB oracles on this corpus."""
    import duckdb
    import pandas as pd

    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
        oracle,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.bpe import (
        QUERIES,
    )

    texts = [
        "it's the engine's test \u2014 really, REALLY!! 123 456 tokens...",
        "line one\u2028line two\u0085line three   spaced    out",
        "bad\x1fbyte piece must drop identically; ok piece stays",
        "repeat me repeat me repeat me 'til the merges learn it",
        'quotes "inside" and commas, plus 9,001 numbers and #tags!!',
        "the the the the an an an of of to to to in in is is it's",
    ] * 4  # enough mass that 16 merges never exhaust the pair supply
    sf_dir = str(tmp_path / "hostile")
    (tmp_path / "hostile").mkdir()
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["seed"] * len(texts),
        }
    ).to_parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    try:
        for name in ("text_bpe_merges", "text_tokenize_ids"):
            spec = QUERIES[name]
            issues = oracle.compare(spec.fn(spark, sf_dir), con, spec.oracle)
            assert not issues, (name, issues)
    finally:
        con.close()
        caches.evict(sf_dir)
