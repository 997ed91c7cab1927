"""BPE merge learning + corpus tokenization to token ids.

Closes the last capability gap in the LLM-data-pipeline catalog (r7
verdict, Next-round #1): ``text_bpe_vocab`` (plans/textstats.py) builds
the pre-tokenizer piece vocabulary; this module LEARNS the BPE merge
table from it and ENCODES the corpus to token ids — the artifact a
training-data pipeline actually ships.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units", public ACL): merges are learned over the
piece VOCABULARY weighted by corpus counts, not the raw token stream,
so after the one corpus-sized piece-count aggregate every iteration is
vocabulary-sized work. Each of the N_MERGES iterations is one
pair-count aggregate + a deterministic argmax (integer counts,
(count DESC, lhs, rhs) lexicographic tiebreak — the
``graph_pagerank_terms`` fixed-iteration-with-exact-oracle pattern).
The winning pair is a bounded 1-row driver round trip per iteration
(the k-means/codebook-probe discipline, see plans/similarity.py) —
never a corpus collect.

Symbolization is a SEP-wrapped string — every symbol wrapped as
SEP+sym+SEP, wraps concatenated — because one greedy merge pass is then
exactly ONE literal string replace in both engines::

    replace(repr, SEP+l+SEP + SEP+r+SEP, SEP+l+r+SEP)

Both Spark's ``replace`` and DuckDB's ``replace`` substitute
non-overlapping occurrences scanning the SOURCE left-to-right, which IS
greedy one-pass BPE application ("aaaa" under merge (a,a) -> [aa, aa];
"aaa" -> [aa, a]). Adjacent wraps share no characters, so consecutive
matches cannot consume each other's boundary (a single shared separator
fails exactly there: ",a,a,a,a," yields [aa,a,a] instead of [aa,aa]).
A merged product is strictly longer than its left side, so a pass can
never re-merge its own output — the fold-free framing is exact.

SEP is U+001F (unit separator). A piece containing SEP would break the
wrap framing, so both engines drop such pieces identically before
learning AND encoding (the documents fixture contains none — this is a
framing guard, not a semantic choice; disclosed).

Scale shape: piece counting is the only corpus pass in learning; the
N_MERGES pair-count aggregates shuffle vocabulary-sized data. Encoding
applies the merges once per DISTINCT piece (vocabulary-sized work),
then joins the corpus piece stream to that encoded dictionary on the
Zipf-skewed piece key — deliberately UNHINTED under the AQE skew-join
posture (the token x vocab canon; tests/test_round7_ops.py) — and
reassembles per doc with one aggregate. The symbol vocabulary is
bounded by construction (<= base alphabet + N_MERGES merge products:
every post-merge symbol is either a single character or the product of
some learned merge), so the id table is a collected literal map, the
same class as top-k lists and codebook probes.

Reference parity note: the reference engine (Hadoop-era Java, see
SURVEY.md §2) has no subword tokenizer — this is a first-class
extension operator of the training-data catalog, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..caches import register_cache
from ..sources.tables import table
from . import QuerySpec
from .textstats import _BPE_SQL_LIT, BPE_PATTERN

SEP = "\x1f"  # U+001F unit separator — the wrap framing character
N_MERGES = 16  # fixed-iteration budget (unrolled in the oracle)

_bpe_cache: dict = register_cache({})


def _pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus piece stream with per-doc position: (doc_id, pos, piece).
    Same pre-tokenizer as text_bpe_vocab; SEP-bearing pieces dropped
    (framing guard, mirrored in every oracle below)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(BPE_PATTERN), F.lit(0)
            )
        ).alias("pos", "piece"),
    ).filter(~F.col("piece").contains(SEP))


def _wrap(piece_col) -> F.Column:
    """piece -> SEP-wrapped char symbolization: 'ab' -> ␟a␟␟b␟.
    (?s) because a piece can legally contain Unicode line terminators
    (U+0085/U+2028/U+2029 are not \\s in Java or RE2, so BPE_PATTERN
    admits them into punctuation runs) and a bare '.' skips them —
    Java and RE2 would then frame DIFFERENT symbol sets (r8 review)."""
    return F.regexp_replace(piece_col, "(?s)(.)", SEP + "$1" + SEP)


def _syms(repr_col) -> F.Column:
    """SEP-wrapped repr -> array of symbols."""
    body = repr_col.substr(F.lit(2), F.length(repr_col) - 2)
    return F.split(body, SEP + SEP)


def _apply_merge(repr_col, lhs: str, rhs: str) -> F.Column:
    """One greedy merge pass as a literal replace (see module doc)."""
    return F.replace(
        repr_col,
        F.lit(SEP + lhs + SEP + SEP + rhs + SEP),
        F.lit(SEP + lhs + rhs + SEP),
    )


def _pair_counts(vdf: DataFrame) -> DataFrame:
    """(lhs, rhs, n_occ): adjacent-symbol pair counts weighted by the
    piece's corpus count. Explicit size>=2 filter: Spark's sequence(1, 0)
    would generate a DESCENDING [1, 0], not an empty array."""
    syms = vdf.select(_syms(F.col("r")).alias("syms"), "cnt").filter(
        F.size("syms") >= 2
    )
    pairs = syms.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("lhs"),
                    F.element_at(F.col("syms"), i + 1).alias("rhs"),
                ),
            )
        ).alias("pr"),
        "cnt",
    )
    return pairs.groupBy(
        F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs")
    ).agg(F.sum("cnt").cast("long").alias("n_occ"))


def learned_merges(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """[(merge_rank, lhs, rhs, n_occ)] — the learned merge table,
    memoized per (session, corpus) so text_bpe_merges and
    text_tokenize_ids share one learning run."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _bpe_cache:
        # The merge loop is N_MERGES sequential driver-synchronized
        # barriers over a vocabulary-sized relation, so per-stage task
        # COUNT is the latency knob, not per-task width: coalescing the
        # cached vocab to a handful of fuller partitions halved the
        # cold learning run at sf0.1 (9.0 -> 4.0 s; warm ~3.5 s either
        # way). Scaled off defaultParallelism so a cluster still gets
        # map-side width proportional to its size.
        n_parts = max(4, spark.sparkContext.defaultParallelism // 8)
        v0 = (
            _pieces(spark, sf_dir)
            .groupBy("piece")
            .agg(F.count("*").alias("cnt"))
            .select(_wrap(F.col("piece")).alias("r"), "cnt")
            .coalesce(n_parts)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        merges: list[tuple] = []
        cur = v0
        for rank in range(1, N_MERGES + 1):
            top = (
                _pair_counts(cur)
                .orderBy(F.desc("n_occ"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not top:
                # below-fixture-scale corpora only; surfacing loudly beats
                # silently diverging from the N-merge oracle
                raise RuntimeError(f"BPE pair supply exhausted at merge {rank}")
            lhs, rhs, n = top[0]["lhs"], top[0]["rhs"], top[0]["n_occ"]
            merges.append((rank, lhs, rhs, int(n)))
            cur = cur.select(_apply_merge(F.col("r"), lhs, rhs).alias("r"), "cnt")
        _bpe_cache[key] = (merges, v0)
    return _bpe_cache[key][0]


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(merge_rank, lhs, rhs, n_occ): the N_MERGES-row learned merge
    table. The output relation is definitionally bounded (N rows), so
    materializing it driver-side is the codebook-probe pattern, not a
    corpus collect — the learning itself ran distributed."""
    rows = [
        (int(r), lhs, rhs, int(n)) for r, lhs, rhs, n in learned_merges(spark, sf_dir)
    ]
    return spark.createDataFrame(
        rows, schema="merge_rank BIGINT, lhs STRING, rhs STRING, n_occ BIGINT"
    )


# Encoded-corpus memo: the per-doc encoding feeds BOTH text_tokenize_ids
# and text_tokenizer_fertility — cache it per (session, corpus) so the
# corpus piece scan + Zipf join + reassembly aggregate run once (the
# warm-index build/serve-split discipline; the relation is corpus-
# cardinality but narrow — doc_id + two longs + one md5).
_enc_cache: dict = register_cache({})


def encoded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _enc_cache:
        _enc_cache[key] = _encode_corpus(spark, sf_dir).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    return _enc_cache[key]


def tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_ids, sum_ids, ids_hash): the corpus encoded to token
    ids under the learned merges. ids_hash = md5 over the comma-joined
    id sequence in document order (no-raw-lists canon); n_ids/sum_ids
    give order-insensitive integrity signals. Ids are assigned by
    lexicographic rank over the (bounded) final symbol vocabulary —
    deterministic in both engines. Served from the encoded-corpus memo."""
    return encoded_docs(spark, sf_dir)


def _encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = learned_merges(spark, sf_dir)
    pp = _pieces(spark, sf_dir)
    dp = pp.select("piece").distinct()
    r = _wrap(F.col("piece"))
    for _rank, lhs, rhs, _n in merges:
        r = _apply_merge(r, lhs, rhs)
    # localCheckpoint: es feeds BOTH the driver-side vocab collect and
    # the pe encode below — without it the distinct-piece scan and the
    # 16-replace chain evaluate twice per execution (r8 review)
    es = dp.select("piece", _syms(r).alias("syms")).localCheckpoint()
    # bounded vocabulary (<= alphabet + N_MERGES, see module doc) —
    # collected and compiled to a literal map, the codebook discipline
    symbols = sorted(
        row["sym"]
        for row in es.select(F.explode("syms").alias("sym")).distinct().collect()
    )
    id_map = F.create_map(
        *[c for i, s in enumerate(symbols) for c in (F.lit(s), F.lit(i))]
    )
    ids = F.transform(F.col("syms"), lambda s: F.element_at(id_map, s))
    pe = es.select(
        "piece",
        F.size("syms").cast("long").alias("n_sym"),
        F.aggregate(
            ids, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_sym"),
        F.array_join(F.transform(ids, lambda x: x.cast("string")), ",").alias(
            "csv"
        ),
    )
    # Zipf-skewed piece key: unhinted, AQE skew posture (token x vocab canon)
    return (
        pp.join(pe, "piece")
        .groupBy("doc_id")
        .agg(
            F.sum("n_sym").cast("long").alias("n_ids"),
            F.sum("sum_sym").cast("long").alias("sum_ids"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "csv"))),
                        lambda x: x["csv"],
                    ),
                    ",",
                )
            ).alias("ids_hash"),
        )
    )


# --- DuckDB oracles -------------------------------------------------------
# The merge loop unrolls to a WITH chain (v0 -> c1 -> m1 -> v1 -> ...).
# Every v_i / m_i is MATERIALIZED: v_i is referenced by both c_{i+1} and
# v_{i+1}, so an unmaterialized chain re-evaluates exponentially.


def _duck_piece_counts() -> str:
    return (
        "SELECT piece, count(*) AS cnt FROM ("
        f"SELECT unnest(regexp_extract_all(lower(text), '{_BPE_SQL_LIT}')) AS piece "
        "FROM documents) "
        f"WHERE piece NOT LIKE '%{SEP}%' GROUP BY piece"
    )


def _duck_merge_chain(n: int) -> list[str]:
    s = SEP
    ctes = [
        f"p AS MATERIALIZED ({_duck_piece_counts()})",
        "v0 AS MATERIALIZED (SELECT "
        f"regexp_replace(piece, '(?s)(.)', '{s}\\1{s}', 'g') AS r, cnt FROM p)",
    ]
    for i in range(1, n + 1):
        prev = f"v{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT pr[1] AS lhs, pr[2] AS rhs, "
            "CAST(sum(cnt) AS BIGINT) AS n_occ FROM ("
            "SELECT unnest(list_transform(generate_series(1, len(syms) - 1), "
            "j -> [syms[j], syms[j + 1]])) AS pr, cnt FROM ("
            f"SELECT string_split(substring(r, 2, length(r) - 2), '{s}{s}') AS syms, "
            f"cnt FROM {prev})) GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT lhs, rhs, n_occ FROM c{i} "
            "ORDER BY n_occ DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"v{i} AS MATERIALIZED (SELECT "
            f"replace(r, '{s}' || lhs || '{s}{s}' || rhs || '{s}', "
            f"'{s}' || lhs || rhs || '{s}') AS r, cnt "
            f"FROM {prev} CROSS JOIN m{i})"
        )
    return ctes


def _duck_bpe_merges() -> str:
    chain = ",\n".join(_duck_merge_chain(N_MERGES))
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, lhs, rhs, n_occ FROM m{i}"
        for i in range(1, N_MERGES + 1)
    )
    return f"WITH {chain}\n{union}"


def _duck_tokenize_ids() -> str:
    s = SEP
    chain = _duck_merge_chain(N_MERGES)
    chain.append(
        "pp AS MATERIALIZED (SELECT doc_id, u.i AS pos, u.p AS piece FROM ("
        "SELECT doc_id, unnest(list_transform("
        f"regexp_extract_all(lower(text), '{_BPE_SQL_LIT}'), "
        "(p, j) -> {'i': j, 'p': p})) AS u FROM documents) "
        f"WHERE u.p NOT LIKE '%{s}%')"
    )
    chain.append("dp AS MATERIALIZED (SELECT DISTINCT piece FROM pp)")
    chain.append(
        "e0 AS (SELECT piece, "
        f"regexp_replace(piece, '(?s)(.)', '{s}\\1{s}', 'g') AS r FROM dp)"
    )
    for i in range(1, N_MERGES + 1):
        chain.append(
            f"e{i} AS (SELECT piece, "
            f"replace(r, '{s}' || lhs || '{s}{s}' || rhs || '{s}', "
            f"'{s}' || lhs || rhs || '{s}') AS r "
            f"FROM e{i - 1} CROSS JOIN m{i})"
        )
    chain.append(
        "es AS MATERIALIZED (SELECT piece, "
        f"string_split(substring(r, 2, length(r) - 2), '{s}{s}') AS syms "
        f"FROM e{N_MERGES})"
    )
    chain.append(
        "vocab AS MATERIALIZED (SELECT sym, "
        "CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS id "
        "FROM (SELECT DISTINCT unnest(syms) AS sym FROM es))"
    )
    chain.append(
        "ps AS (SELECT piece, u.i AS spos, u.s AS sym FROM ("
        "SELECT piece, unnest(list_transform(syms, (t, j) -> {'i': j, 's': t})) "
        "AS u FROM es))"
    )
    chain.append(
        "pe AS MATERIALIZED (SELECT piece, CAST(count(*) AS BIGINT) AS n_sym, "
        "CAST(sum(id) AS BIGINT) AS sum_sym, "
        "string_agg(CAST(id AS VARCHAR), ',' ORDER BY spos) AS csv "
        "FROM ps JOIN vocab USING (sym) GROUP BY piece)"
    )
    return (
        "WITH " + ",\n".join(chain) + "\n"
        "SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_ids, "
        "CAST(sum(sum_sym) AS BIGINT) AS sum_ids, "
        "md5(string_agg(csv, ',' ORDER BY pos)) AS ids_hash "
        "FROM pp JOIN pe USING (piece) GROUP BY doc_id"
    )


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, total_bytes, total_ids, bytes_per_id_ppm): the
    tokenizer-eval dashboard per feed — compression rate (UTF-8 bytes
    per emitted token id) under the learned merges. A source whose
    ratio drifts is either a content change or a tokenizer mismatch
    (non-English feed under an English-trained vocab reads LOW here);
    this is the per-feed monitor a tokenizer rollout watches. Derives
    from the MEMOIZED per-doc encoding (one aggregate on top — the
    encode pass runs once per session/corpus, shared with
    text_tokenize_ids), byte length measured with octet_length/strlen so
    multibyte text counts bytes, not chars. Docs with zero pieces drop
    out of the encoding in BOTH engines (inner join, same convention
    as the encoder itself)."""
    ids = encoded_docs(spark, sf_dir).select("doc_id", "n_ids")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.octet_length("text").cast("long").alias("nb")
    )
    return (
        docs.join(ids, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.sum("n_ids").cast("long").alias("total_ids"),
            # divide-FIRST ppm discipline (pipeline.py precedent): a
            # long sum(nb)*1e6 product overflows int64 past ~9.2 TB of
            # text per source — exactly the design point. Both engines
            # run the identical double divide-then-multiply, and the
            # byte/id sums stay exact in double far past 100 TB (<2^53).
            F.floor(
                F.sum("nb").cast("double") / F.sum("n_ids") * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("bytes_per_id_ppm"),
        )
    )


def _duck_tokenizer_fertility() -> str:
    return f"""
WITH enc AS MATERIALIZED ({_duck_tokenize_ids()})
SELECT d.source, count(*) AS n_docs,
       CAST(sum(strlen(d.text)) AS BIGINT) AS total_bytes,
       CAST(sum(enc.n_ids) AS BIGINT) AS total_ids,
       CAST(floor(CAST(sum(strlen(d.text)) AS DOUBLE) / sum(enc.n_ids)
                  * 1000000.0 + 0.5)
            AS BIGINT) AS bytes_per_id_ppm
FROM documents d JOIN enc ON enc.doc_id = d.doc_id
GROUP BY d.source
"""


QUERIES: dict[str, QuerySpec] = {
    "text_tokenizer_fertility": QuerySpec(
        fn=tokenizer_fertility,
        oracle=_duck_tokenizer_fertility(),
        note="per-source tokenizer compression dashboard (UTF-8 bytes "
        "per token id under the learned merges) — the per-feed monitor "
        "a tokenizer rollout watches; one aggregate over the shared "
        "encode pass",
    ),
    "text_bpe_merges": QuerySpec(
        fn=bpe_merges,
        oracle=_duck_bpe_merges(),
        note="BPE merge learning (Sennrich 2016) over the piece "
        "vocabulary: N_MERGES fixed iterations, each one vocab-sized "
        "pair-count aggregate + deterministic argmax; greedy pass = one "
        "literal replace over the SEP-wrapped symbolization; fully "
        "unrolled DuckDB value oracle",
    ),
    "text_tokenize_ids": QuerySpec(
        fn=tokenize_ids,
        oracle=_duck_tokenize_ids(),
        note="corpus encoded to token ids under the learned merges: "
        "merges applied once per DISTINCT piece, Zipf piece-key join "
        "unhinted (AQE skew posture), bounded symbol vocab as literal "
        "map; md5 id-sequence hash per the no-raw-lists canon",
    ),
}
