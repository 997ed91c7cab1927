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
    punct pieces; the (?s) wrap must frame them identically), a
    vertical tab \\x0b (Java \\s contains it, RE2's does not -- the
    explicit whitespace class in BPE_PATTERN must make both engines
    read it as a piece SEPARATOR, r8 ADVICE), em-dash, quotes,
    repeated whitespace. Both BPE queries must match their DuckDB
    oracles on this corpus."""
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
        "vertical\x0btab splits\x0bpieces like a space, not punct!",
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
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.textstats import (
        QUERIES as TEXT_QUERIES,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.trec_parse import (
        QUERIES as TREC_QUERIES,
    )

    try:
        for name, spec in (
            ("text_bpe_merges", QUERIES["text_bpe_merges"]),
            ("text_tokenize_ids", QUERIES["text_tokenize_ids"]),
            # the frozen-encode path (base-learned merges, LEFT-JOIN/UNK
            # vocab) must survive the same hostile input
            (
                "text_tokenize_ids_incremental",
                QUERIES["text_tokenize_ids_incremental"],
            ),
            # frozen-encode OOV aggregate over the same hostile input
            # (the *4 repetition puts every delta text in the base too,
            # so the UNKs here are exactly the seeded chars — natural
            # char-level OOV is pinned by
            # test_frozen_vocab_oov_encodes_as_unk instead)
            ("text_tokenizer_oov_rate", QUERIES["text_tokenizer_oov_rate"]),
            # r9 review sweep: the OTHER dual-rendered whitespace
            # classes (ws-token split, TREC edge trim, DOCHDR \S) must
            # read the VT row identically too
            ("text_token_counts", TEXT_QUERIES["text_token_counts"]),
            ("trec_text_parsed", TREC_QUERIES["trec_text_parsed"]),
            ("trec_web_urls", TREC_QUERIES["trec_web_urls"]),
        ):
            issues = oracle.compare(spec.fn(spark, sf_dir), con, spec.oracle)
            assert not issues, (name, issues)
    finally:
        con.close()
        caches.evict(sf_dir)


# --- durable tokenizer store (round 9) -------------------------------------


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_ids"], r["sum_ids"], r["ids_hash"])
        for r in df.collect()
    )


def test_store_roundtrip_serves_session_encode(spark, tmp_path):
    """write_bpe_store(full corpus) read back == the in-session encode,
    row for row — and the persisted merge table equals the learned one."""
    out = str(tmp_path / "store")
    bpe.write_bpe_store(spark, SF, out)
    assert _rows(bpe.read_bpe_store(spark, out)) == _rows(
        bpe.tokenize_ids(spark, SF)
    )
    assert bpe.read_bpe_merges(spark, out) == bpe.learned_merges(spark, SF)


def test_incremental_append_matches_one_shot_and_replays(spark, tmp_path):
    """The maintenance contract: base build + delta appends (in two
    batches, one REPLAYED) equals the one-shot frozen encode of the
    whole corpus — the kill-resume discipline for the tokenizer store."""
    import pyspark.sql.functions as F

    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )

    docs = table(spark, SF, "documents")
    mod = bpe.DOC_DELTA_MOD
    base_where = F.col("doc_id") % mod != 0

    # one-shot under the SAME frozen artifact: base-built store, whole
    # corpus appended as a single batch over a fresh store
    ref = str(tmp_path / "oneshot")
    bpe.write_bpe_store(spark, SF, ref, where=base_where)
    bpe.append_bpe_store(
        spark, docs.filter(F.col("doc_id") % mod == 0), ref, batch_id=1
    )
    want = _rows(bpe.read_bpe_store(spark, ref))

    # incremental: two delta batches, the second one replayed
    out = str(tmp_path / "store")
    bpe.write_bpe_store(spark, SF, out, where=base_where)
    b1 = docs.filter((F.col("doc_id") % mod == 0) & (F.col("doc_id") % 20 == 0))
    b2 = docs.filter((F.col("doc_id") % mod == 0) & (F.col("doc_id") % 20 != 0))
    bpe.append_bpe_store(spark, b1, out, batch_id=1)
    bpe.append_bpe_store(spark, b2, out, batch_id=2)
    bpe.append_bpe_store(spark, b2, out, batch_id=2)  # "crash" replay
    assert _rows(bpe.read_bpe_store(spark, out)) == want

    with pytest.raises(ValueError):
        bpe.append_bpe_store(spark, b1, out, batch_id=0)


def test_append_never_rewrites_base_partition(spark, tmp_path):
    """The O(increment) claim made physical: appending a delta batch
    must leave every ingest=0 file byte-identical (same path, size,
    mtime) — dynamic partition overwrite only touches the batch's own
    ingest partition."""
    import os

    import pyspark.sql.functions as F

    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )

    out = str(tmp_path / "store")
    mod = bpe.DOC_DELTA_MOD
    bpe.write_bpe_store(
        spark, SF, out, where=F.col("doc_id") % mod != 0
    )

    import hashlib

    def snapshot(root):
        entries = {}
        for d, _dirs, files in os.walk(root):
            for f in files:
                path = os.path.join(d, f)
                st = os.stat(path)
                with open(path, "rb") as fh:
                    digest = hashlib.md5(fh.read()).hexdigest()
                entries[path] = (st.st_mtime_ns, st.st_size, digest)
        return entries

    base_dir = f"{out}/encoded/ingest=0"
    before = snapshot(base_dir)
    delta = table(spark, SF, "documents").filter(F.col("doc_id") % mod == 0)
    bpe.append_bpe_store(spark, delta, out, batch_id=1)
    assert snapshot(base_dir) == before
    assert os.path.isdir(f"{out}/encoded/ingest=1")


def test_oov_rate_counts_exactly_one_unk_per_delta_doc(spark):
    """The seeding contract: the fixture is ASCII and the base alphabet
    covers the delta, so the ONLY UNKs are the seeded OOV chars — one
    per delta doc, attributed to exactly the delta docs' sources."""
    got = {
        r["source"]: (r["total_ids"], r["n_unk"], r["unk_ppm"])
        for r in bpe.tokenizer_oov_rate(spark, SF).collect()
    }
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    )
    delta_per_source = (
        docs[docs.doc_id % bpe.DOC_DELTA_MOD == 0].groupby("source").size()
    )
    for source, (total_ids, n_unk, unk_ppm) in got.items():
        want_unk = int(delta_per_source.get(source, 0))
        assert n_unk == want_unk, source
        assert (unk_ppm > 0) == (want_unk > 0)
        assert total_ids > 0
    assert sum(u for _t, u, _p in got.values()) == int(delta_per_source.sum())


def test_strict_encode_raises_on_vocab_gap(spark):
    """The build path's unk=None lookup must fail LOUDLY on a symbol
    missing from the map (r9 review): element_at's NULL would otherwise
    be silently dropped by array_join and skipped by the sums — a
    plausible-looking but corrupt csv/ids_hash."""
    es = spark.createDataFrame(
        [("ab", ["a", "b"])], "piece STRING, syms ARRAY<STRING>"
    )
    pe = bpe._piece_encoding(es, [("a", 0)])  # 'b' deliberately absent
    with pytest.raises(Exception) as ei:
        pe.collect()
    assert "symbol outside vocab" in str(ei.value)


def test_frozen_vocab_oov_encodes_as_unk(spark, tmp_path):
    """A delta symbol absent from the frozen vocab encodes as UNK_ID in
    BOTH renderings: base corpus is letters-only, the delta doc is a
    digit run no base merge or symbol covers."""
    import hashlib

    import pandas as pd

    base_texts = [
        "repeat me repeat me repeat me 'til the merges learn it",
        "the quick brown fox jumps over the lazy dog again and again",
        "it's the engine's test and the engine keeps on testing it",
        "merge pairs merge pairs merge pairs until supply runs dry",
    ] * 8  # enough pair mass that 16 merges never exhaust
    texts = base_texts + ["999"]
    sf_dir = str(tmp_path / "oov")
    (tmp_path / "oov").mkdir()
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["seed"] * len(texts),
        }
    ).to_parquet(f"{sf_dir}/documents.parquet")
    delta_id = len(texts) - 1

    import pyspark.sql.functions as F

    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )

    out = str(tmp_path / "store")
    try:
        bpe.write_bpe_store(
            spark, sf_dir, out, where=F.col("doc_id") != delta_id
        )
        vocab = {
            r["sym"]
            for r in spark.read.parquet(f"{out}/vocab").collect()
        }
        assert "9" not in vocab  # the OOV premise holds
        delta = table(spark, sf_dir, "documents").filter(
            F.col("doc_id") == delta_id
        )
        bpe.append_bpe_store(spark, delta, out, batch_id=1)
        row = (
            bpe.read_bpe_store(spark, out)
            .filter(F.col("doc_id") == delta_id)
            .head()
        )
        # "999" is one piece -> syms ['9','9','9'], every id UNK_ID
        assert row["n_ids"] == 3
        assert row["sum_ids"] == 3 * bpe.UNK_ID
        csv = ",".join(str(bpe.UNK_ID) for _ in range(3))
        assert row["ids_hash"] == hashlib.md5(csv.encode()).hexdigest()
    finally:
        caches.evict(sf_dir)


# --- sidecar interchange + store UNK monitor (round 10) ---------------------


def test_sidecar_export_is_byte_stable_and_lossless(spark, tmp_path):
    """Two exports of the same store are byte-identical (the artifact a
    serving stack pins by checksum), the rendering is pure ASCII, and
    import returns exactly the store's merges (rank order, counts
    dropped to the zero-filled diagnostic slot) and vocab (id order)."""
    out = str(tmp_path / "store")
    bpe.write_bpe_store(spark, SF, out)
    p1 = bpe.export_bpe_json(spark, out, str(tmp_path / "a" / "tokenizer.json"))
    p2 = bpe.export_bpe_json(spark, out, str(tmp_path / "b" / "tokenizer.json"))
    with open(p1, "rb") as fh:
        b1 = fh.read()
    with open(p2, "rb") as fh:
        b2 = fh.read()
    assert b1 == b2
    b1.decode("ascii")  # raises on any non-ASCII byte
    merges, id_pairs = bpe.import_bpe_json(p1)
    assert merges == [
        (rank, lhs, rhs, 0)
        for rank, lhs, rhs, _n in bpe.read_bpe_merges(spark, out)
    ]
    vocab_rows = sorted(
        (int(r["id"]), r["sym"])
        for r in spark.read.parquet(f"{out}/vocab").collect()
    )
    assert id_pairs == [(sym, i) for i, sym in vocab_rows]


def test_sidecar_import_rejects_foreign_files(tmp_path):
    """EVERY malformed shape fails with the advertised ValueError (r10
    review: a non-dict top level or a header-only file used to escape
    as AttributeError/KeyError), and a bare-filename export target
    works (os.makedirs('') used to blow up before the write)."""
    bad = [
        '{"format":"other-tokenizer","version":1}',  # wrong format
        "[1,2,3]",  # non-dict top level
        '{"format":"bpe-tokenizer","version":1}',  # header only
        '{"format":"bpe-tokenizer","version":1,"merges":[]}',  # no vocab
        '{"format":"bpe-tokenizer","version":1,"merges":{},"vocab":[]}',
        # element-level malformation (r10 review pass 2: these used to
        # escape as TypeError from the unpack)
        '{"format":"bpe-tokenizer","version":1,"merges":[5],"vocab":[]}',
        '{"format":"bpe-tokenizer","version":1,"merges":[["a"]],"vocab":[]}',
        '{"format":"bpe-tokenizer","version":1,"merges":[["a",1]],"vocab":[]}',
        '{"format":"bpe-tokenizer","version":1,"merges":[],"vocab":[5]}',
        '{"format":"bpe-tokenizer","version":1,"merges":[],"vocab":[["a","b"]]}',
        '{"format":"bpe-tokenizer","version":1,"merges":[],"vocab":[["a",1.5]]}',
    ]
    for i, text in enumerate(bad):
        p = tmp_path / f"bad{i}.json"
        p.write_text(text)
        with pytest.raises(ValueError):
            bpe.import_bpe_json(str(p))


def test_sidecar_export_accepts_bare_filename(spark, tmp_path, monkeypatch):
    out = str(tmp_path / "store")
    bpe.write_bpe_store(spark, SF, out)
    monkeypatch.chdir(tmp_path)
    path = bpe.export_bpe_json(spark, out, "tokenizer.json")
    merges, id_pairs = bpe.import_bpe_json(path)
    assert merges and id_pairs


def test_store_unk_by_ingest_contract(spark):
    """The persisted-store OOV monitor's invariants: the strict base
    build carries identically-zero UNK counts at ingest 0, and the
    seeded delta batch at ingest 1 carries exactly one UNK per delta
    doc (the tokenizer_oov_rate seeding contract, now read off disk)."""
    rows = {
        int(r["ingest"]): r
        for r in bpe.bpe_store_unk_by_ingest(spark, SF).collect()
    }
    assert set(rows) == {0, 1}
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    n_delta = int((docs.doc_id % bpe.DOC_DELTA_MOD == 0).sum())
    assert rows[0]["n_unk"] == 0 and rows[0]["unk_ppm"] == 0
    assert rows[1]["n_docs"] == n_delta
    assert rows[1]["n_unk"] == n_delta  # one seeded UNK per delta doc
    assert rows[1]["unk_ppm"] > 0
    assert rows[1]["total_ids"] > rows[1]["n_unk"]
