"""Text-analysis operators for a training-data pipeline (north star):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All expression-only (JVM-side at scale) with DuckDB
oracles rendered from the same tokenizer constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stopwords import sql_not_in_stopwords
from ..functions.tokenize import (
    WS_CHARS,
    duck_kgrams,
    duck_tokens_list,
    filter_stopwords,
    kgrams_col,
    tokens_col,
)
from ..sources.tables import table
from . import QuerySpec


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token accounting: raw whitespace tokens, engine tokens
    (split-char tokenizer, pre-stopword), kept tokens (post-stopword),
    distinct terms."""
    docs = table(spark, sf_dir, "documents")
    # project tokens once, then derive (see indexing.doc_terms: repeated
    # references re-evaluate the tokenizer otherwise)
    # tokenize ONCE; the kept stream is a cheap array filter over it
    # (tokens_col twice would re-run the full regex tokenizer per stream)
    staged = docs.select(
        "doc_id",
        "text",
        tokens_col(F.col("text"), stopworded=False).alias("all_toks"),
    ).withColumn("kept", filter_stopwords(F.col("all_toks")))
    return staged.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), f"[{WS_CHARS}]+")).cast("long").alias("n_ws_tokens"),
        F.size("all_toks").cast("long").alias("n_tokens"),
        F.size("kept").cast("long").alias("n_kept"),
        F.size(F.array_distinct(F.col("kept"))).cast("long").alias("n_distinct"),
    )


DUCK_TOKEN_COUNTS = f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '[{WS_CHARS}]+')) AS n_ws_tokens,
       len({duck_tokens_list('text', stopworded=False)}) AS n_tokens,
       len({duck_tokens_list('text', stopworded=True)})  AS n_kept,
       len(list_distinct({duck_tokens_list('text', stopworded=True)})) AS n_distinct
FROM documents
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals: char length, mean token length,
    stopword ratio, digit ratio, punctuation ratio. Heuristics like
    these gate corpus inclusion at pipeline scale; all pure expressions."""
    # n_stop = n_tokens - n_kept: both tokenizer variants compile the
    # stopword list to an INSET hash probe, vs O(733) array_contains scans
    # per token if filtered against a literal array (measured ~3x slower)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        tokens_col(F.col("text"), stopworded=False).alias("toks"),
    ).withColumn("kept", filter_stopwords(F.col("toks")))
    toks = F.col("toks")
    n_tok = F.size(toks)
    n_stop = n_tok - F.size(F.col("kept"))
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    digits = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^!-/:-@\[-`{-~]", ""))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)).cast("double"), 4).alias("stopword_ratio"),
        F.round(digits / F.length("text").cast("double"), 4).alias("digit_ratio"),
        F.round(punct / F.length("text").cast("double"), 4).alias("punct_ratio"),
    )


def _duck_quality() -> str:
    toks = duck_tokens_list("text", stopworded=False)
    return f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(toks)    AS n_tokens,
       round(list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1), 4) AS mean_token_len,
       round(len(list_filter(toks, t -> NOT ({sql_not_in_stopwords('t')}))) / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS stopword_ratio,
       round(length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS digit_ratio,
       round(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio
FROM (SELECT doc_id, text, {toks} AS toks FROM documents)
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language-ID heuristic: share of tokens that are
    English function words (the stopword list). Deterministic and
    oracle-checkable; a real pipeline would swap in a char-n-gram model
    behind the same (doc_id, pred_lang, en_ratio) contract."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        tokens_col(F.col("text"), stopworded=False).alias("toks"),
    ).withColumn("kept", filter_stopwords(F.col("toks")))
    n = F.size(F.col("toks"))
    n_en = n - F.size(F.col("kept"))
    ratio = F.round(n_en / F.greatest(n, F.lit(1)).cast("double"), 4)
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.1, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
        ratio.alias("en_ratio"),
    )


def _duck_lang_id() -> str:
    toks = duck_tokens_list("text", stopworded=False)
    return f"""
SELECT doc_id,
       CASE WHEN ratio >= 0.1 THEN 'en' ELSE 'other' END AS pred_lang,
       ratio AS en_ratio
FROM (
  SELECT doc_id,
         round(len(list_filter(toks, t -> NOT ({sql_not_in_stopwords('t')})))
               / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS ratio
  FROM (SELECT doc_id, {toks} AS toks FROM documents)
)
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 over the normalized token
    stream (tokenizer output joined by single spaces) — robust to
    whitespace/markup differences, exact-content sensitive."""
    docs = table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"), stopworded=False)
    return docs.select(
        "doc_id", F.md5(F.array_join(toks, " ")).alias("fingerprint")
    )


DUCK_FINGERPRINTS = f"""
SELECT doc_id,
       md5(array_to_string({duck_tokens_list('text', stopworded=False)}, ' ')) AS fingerprint
FROM documents
"""


# --- rolling-hash fingerprint -------------------------------------------
# Polynomial rolling hash over the normalized token stream (the classic
# Rabin-Karp shape): per-token code from the first three codepoints +
# length, folded left-to-right as h = (h*B + code) mod M. Order-
# SENSITIVE (unlike the md5 fingerprint, token swaps change it) and
# incrementally maintainable — the property a chunk-level dedup pipeline
# wants. Exact integer arithmetic, identical in both engines; the fold
# stays within BIGINT (h < M = 2^31-1, so h*B + code < 2^52).
_RH_B = 1_000_003
_RH_M = 2_147_483_647


def _rh_code_spark(t):
    a = lambda i: F.ascii(F.substring(t, i, 1))  # noqa: E731  (0 for past-end)
    return ((a(1) * 31 + a(2)) * 31 + a(3)) * 31 + F.length(t)


def rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"), stopworded=False)
    codes = F.transform(toks, lambda t: _rh_code_spark(t).cast("long"))
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _RH_B + c) % _RH_M,
    )
    return docs.select("doc_id", h.alias("rhash"))


_RH_CODE_SQL = (
    "((ascii(t[1:1]) * 31 + ascii(t[2:2])) * 31 + ascii(t[3:3])) * 31 + length(t)"
)

DUCK_ROLLING_FPS = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({duck_tokens_list('text', stopworded=False)},
                          t -> CAST({_RH_CODE_SQL} AS BIGINT))),
         (acc, c) -> (acc * {_RH_B} + c) % {_RH_M}) AS rhash
FROM documents
"""


def term_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram over the kept-token stream — a cheap
    corpus-health profile (tokenizer drift shows up here first)."""
    docs = table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    return (
        docs.select(F.explode(toks).alias("term"))
        .groupBy(F.length("term").cast("long").alias("term_len"))
        .agg(F.count("*").alias("n"))
    )


DUCK_TERM_LENGTH_HIST = f"""
SELECT length(term) AS term_len, count(*) AS n
FROM (SELECT unnest({duck_tokens_list('text')}) AS term FROM documents)
GROUP BY 1
"""


# GPT-2-style pre-tokenizer pattern, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): no
# lookahead (RE2 has none), explicit ASCII classes instead of \p{L},
# and an EXPLICIT whitespace class instead of \s — Java's \s is
# [ \t\n\x0B\f\r] but RE2's omits \x0B (vertical tab), so a bare \s
# makes the engines frame VT-bearing text differently (r8 ADVICE;
# Python re's \s is wider still — the explicit class aligns all three,
# pinned by the \x0b row of tests/test_bpe.py's hostile corpus).
# Pieces: contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs.
BPE_PATTERN = (
    "'(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9" + WS_CHARS + "']+"
)


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization vocabulary over the corpus:
    (piece, n_occ, n_docs). The piece inventory a tokenizer-training
    pipeline feeds into BPE merge learning — pieces keep their leading
    space (the GPT-2 convention), counting is a plain two-level
    aggregate, output is vocabulary-sized."""
    docs = table(spark, sf_dir, "documents")
    pieces = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(BPE_PATTERN), F.lit(0)
            )
        ).alias("piece"),
    )
    return pieces.groupBy("piece").agg(
        F.count("*").alias("n_occ"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


_BPE_SQL_LIT = BPE_PATTERN.replace("'", "''")
DUCK_BPE_VOCAB = f"""
SELECT piece, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{_BPE_SQL_LIT}')) AS piece
      FROM documents)
GROUP BY piece
"""


def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean unigram surprisal -ln p(token), with the corpus
    itself as the language model (p = corpus count / total occurrences)
    — the CCNet-style LM-perplexity quality gate: boilerplate scores
    low, token salad scores high. One count aggregate + one term-keyed
    join (vocabulary-cardinality — deliberately NO broadcast hint) +
    one per-doc aggregate; the 1-row total is the only broadcast.
    Cross-engine float: each per-token surprisal is floored to integer
    micro-units BEFORE aggregation, the integers sum associatively,
    and one final floor(sum/n + 0.5) renders the mean — fold order
    cannot flip a rounding boundary (the DSIR lesson applied; see
    importance_weights for the honest <=1-ulp-per-ln residual-risk
    statement, which applies here too)."""
    from .indexing import doc_terms

    dt = doc_terms(spark, sf_dir, 1)
    # tf compression (r7): identical per-token surprisal within a
    # (doc, term) pair — floor once, weight by tf; the skewed term join
    # carries doc x distinct-term rows, not raw occurrences (see
    # importance_weights for the full argument; oracle unchanged)
    tfs = dt.groupBy("docno", "term").agg(F.count("*").alias("tf"))
    wc = tfs.groupBy("term").agg(F.sum("tf").alias("cnt"))
    tot = wc.agg(F.sum("cnt").cast("double").alias("tot"))
    micro = F.floor(
        -F.log(F.col("cnt") / F.col("tot")) * 1e6 + F.lit(0.5)
    ).cast("long")
    return (
        tfs.join(wc, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("docno")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.floor(F.sum(F.col("tf") * micro) / F.sum("tf") + F.lit(0.5))
            .cast("long")
            .alias("mean_surprisal_ppm"),
        )
        .select(
            F.col("docno").alias("doc_id"), "n_tokens", "mean_surprisal_ppm"
        )
    )


BIGRAM_ALPHA = 0.5  # add-alpha smoothing for the conditional bigram LM


def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean conditional bigram surprisal -ln p(w2|w1) under an
    add-α corpus bigram model: p = (c(w1 w2)+α) / (c(w1)+α·V). The
    second-order companion to text_unigram_surprisal — token salad that
    sneaks past the unigram gate (real words, wrong order) scores high
    here. Shape: bigram + unigram count aggregates off one tokenized
    scan, two vocabulary-cardinality joins (deliberately unhinted —
    Heaps' law makes both sides big at corpus scale), 1-row V broadcast,
    per-doc mean. Docs with <2 tokens have no bigrams and drop out
    (same convention in both engines)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text"), stopworded=False).alias("toks")
    )
    db = docs.select(
        "doc_id", F.explode(kgrams_col(F.col("toks"), 2)).alias("g")
    )
    # tf compression (r7): per-(doc, bigram) surprisal is identical
    # across repeats — floor once, weight by tf (see importance_weights)
    dbt = db.groupBy("doc_id", "g").agg(F.count("*").alias("tf"))
    wc = (
        docs.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    bc = dbt.groupBy("g").agg(F.sum("tf").alias("cg"))
    v = wc.agg(F.count("*").cast("double").alias("nv"))
    micro = F.floor(
        -F.log(
            (F.col("cg") + BIGRAM_ALPHA)
            / (F.col("cw") + BIGRAM_ALPHA * F.col("nv"))
        )
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    return (
        dbt.withColumn("w1", F.split(F.col("g"), " ").getItem(0))
        .join(bc, "g")
        .join(wc.select(F.col("w").alias("w1"), "cw"), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.floor(
                F.sum(F.col("tf") * micro) / F.sum("tf") + F.lit(0.5)
            )
            .cast("long")
            .alias("mean_surprisal_ppm"),
        )
    )


def _duck_bigram_surprisal() -> str:
    lst = duck_tokens_list("text", stopworded=False)
    return f"""
WITH t AS MATERIALIZED (SELECT doc_id, {lst} AS toks FROM documents),
     db AS MATERIALIZED (
       SELECT doc_id, unnest({duck_kgrams('toks', 2)}) AS g FROM t),
     wc AS (SELECT w, count(*) AS cw
            FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
     bc AS (SELECT g, count(*) AS cg FROM db GROUP BY g),
     v AS (SELECT CAST(count(*) AS DOUBLE) AS nv FROM wc)
SELECT db.doc_id, count(*) AS n_bigrams,
       CAST(floor(
         sum(CAST(floor(-ln((bc.cg + {BIGRAM_ALPHA})
                            / (wc.cw + {BIGRAM_ALPHA} * v.nv)) * 1e6 + 0.5)
             AS BIGINT))
         / count(*) + 0.5) AS BIGINT) AS mean_surprisal_ppm
FROM db JOIN bc USING (g)
        JOIN wc ON wc.w = string_split(db.g, ' ')[1]
        CROSS JOIN v
GROUP BY db.doc_id
"""


# --- Stupid Backoff held-out LM scoring ----------------------------------
# Brants et al. 2007 ("Large Language Models in Machine Translation",
# public EMNLP): score(w2|w1) = c(w1 w2)/c(w1) when the bigram was seen
# in training, else ALPHA·(c(w2)+1)/(N+V) (backoff to the +1-smoothed
# unigram). Unlike the surprisal gates — whose LM is the scored corpus
# itself, so every bigram is "seen" and backoff would be dead code —
# this trains on the even-doc_id half and scores the odd half, the
# held-out shape a perplexity filter actually runs (train the cheap LM
# on trusted data, score the incoming corpus). All counts integer, the
# per-bigram log-score floors to micro-units before the associative sum.
SB_ALPHA = 0.4


def backoff_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, mean_logscore_ppm) for odd-doc_id docs under
    the even-doc_id-trained Stupid Backoff bigram LM. Higher (closer to
    0) = more train-like. Shape at scale: two count aggregates off the
    train slice, then the eval bigram stream joins bigram counts (LEFT
    — misses take the backoff arm) and unigram counts on Zipf-skewed
    keys: both deliberately unhinted, AQE skew-split posture (the
    DSIR/surprisal family contract); the (N, V) totals are the only
    broadcast."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text"), stopworded=False).alias("toks")
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)
    ev = docs.filter(F.col("doc_id") % 2 == 1)
    wc = (
        train.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    bc = (
        train.select(F.explode(kgrams_col(F.col("toks"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cg"))
    )
    tot = wc.agg(
        F.sum("cw").cast("double").alias("n"),
        F.count("*").cast("double").alias("v"),
    )
    # tf compression (r7): per-(doc, bigram) score is identical across
    # repeats — floor once, weight by tf (see importance_weights)
    eb = (
        ev.select(
            "doc_id", F.explode(kgrams_col(F.col("toks"), 2)).alias("g")
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
        .select(
            "doc_id",
            "g",
            "tf",
            F.split(F.col("g"), " ").getItem(0).alias("w1"),
            F.split(F.col("g"), " ").getItem(1).alias("w2"),
        )
    )
    score = F.when(
        F.col("cg").isNotNull(),
        F.col("cg") / F.col("c1"),
    ).otherwise(
        F.lit(SB_ALPHA)
        * (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
        / (F.col("n") + F.col("v"))
    )
    micro = F.floor(F.log(score) * 1e6 + F.lit(0.5)).cast("long")
    return (
        eb.join(bc, "g", "left")
        .join(wc.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1", "left")
        .join(wc.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2", "left")
        .crossJoin(F.broadcast(tot))  # bounded: 1-row totals
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.floor(F.sum(F.col("tf") * micro) / F.sum("tf") + F.lit(0.5))
            .cast("long")
            .alias("mean_logscore_ppm"),
        )
    )


def _duck_backoff_lm() -> str:
    lst = duck_tokens_list("text", stopworded=False)
    return f"""
WITH t AS MATERIALIZED (SELECT doc_id, {lst} AS toks FROM documents),
     wc AS (SELECT w, count(*) AS cw
            FROM (SELECT unnest(toks) AS w FROM t WHERE doc_id % 2 = 0)
            GROUP BY w),
     bc AS (SELECT g, count(*) AS cg
            FROM (SELECT unnest({duck_kgrams('toks', 2)}) AS g
                  FROM t WHERE doc_id % 2 = 0)
            GROUP BY g),
     tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS n,
                    CAST(count(*) AS DOUBLE) AS v FROM wc),
     eb AS (SELECT doc_id, g,
                   string_split(g, ' ')[1] AS w1,
                   string_split(g, ' ')[2] AS w2
            FROM (SELECT doc_id, unnest({duck_kgrams('toks', 2)}) AS g
                  FROM t WHERE doc_id % 2 = 1))
SELECT eb.doc_id, count(*) AS n_bigrams,
       CAST(floor(
         sum(CAST(floor(ln(
           CASE WHEN bc.cg IS NOT NULL THEN bc.cg / w1c.cw
                ELSE {SB_ALPHA} * (coalesce(w2c.cw, 0) + 1.0)
                     / (tot.n + tot.v) END
         ) * 1e6 + 0.5) AS BIGINT))
         / count(*) + 0.5) AS BIGINT) AS mean_logscore_ppm
FROM eb
LEFT JOIN bc USING (g)
LEFT JOIN wc w1c ON w1c.w = eb.w1
LEFT JOIN wc w2c ON w2c.w = eb.w2
CROSS JOIN tot
GROUP BY eb.doc_id
"""


def _duck_surprisal() -> str:
    from .indexing import duck_doc_terms

    return f"""
WITH dt AS MATERIALIZED ({duck_doc_terms(1)}),
     wc AS (SELECT term, count(*) AS cnt FROM dt GROUP BY term),
     tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM wc)
SELECT dt.docno AS doc_id,
       count(*) AS n_tokens,
       CAST(floor(
         sum(CAST(floor(-ln(wc.cnt / tot.tot) * 1e6 + 0.5) AS BIGINT))
         / count(*) + 0.5) AS BIGINT) AS mean_surprisal_ppm
FROM dt JOIN wc USING (term) CROSS JOIN tot
GROUP BY dt.docno
"""


# Vocabulary drift between the first and second corpus half (by doc_id)
# — the tokenizer/scraper regression detector a feed-health dashboard
# watches: a term whose frequency shifts hard between halves flags a
# source change. Laplace +1 smoothing keeps absent terms finite; ranking
# rounds first and tiebreaks on term so the top-k cut is deterministic.
DRIFT_MIN_COUNT = 20
DRIFT_TOP_K = 40


def vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .indexing import doc_terms

    dt = doc_terms(spark, sf_dir, 1)
    # integer floor div (`div` / `//`): float division + cast would
    # truncate in Spark but round in DuckDB on odd doc counts
    half = dt.agg(F.max("docno").alias("mx")).select(
        F.expr("(mx + 1) div 2").cast("long").alias("h")
    )
    counts = (
        dt.crossJoin(F.broadcast(half))
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("docno") < F.col("h"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_a"),
            F.sum(F.when(F.col("docno") >= F.col("h"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_b"),
        )
        .filter(F.col("cnt_a") + F.col("cnt_b") >= DRIFT_MIN_COUNT)
    )
    log_ratio = F.round(
        F.log((F.col("cnt_a") + 1.0) / (F.col("cnt_b") + 1.0)), 4
    )
    return (
        counts.select("term", "cnt_a", "cnt_b", log_ratio.alias("log_ratio"))
        .orderBy(F.abs(F.col("log_ratio")).desc(), F.asc("term"))
        .limit(DRIFT_TOP_K)
    )


def _duck_vocab_drift() -> str:
    from .indexing import duck_doc_terms

    return f"""
WITH dt AS MATERIALIZED ({duck_doc_terms(1)}),
     half AS (SELECT CAST((max(docno) + 1) // 2 AS BIGINT) AS h FROM dt),
     counts AS (
       SELECT term,
              CAST(sum(CASE WHEN docno < h THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
              CAST(sum(CASE WHEN docno >= h THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
       FROM dt CROSS JOIN half
       GROUP BY term
       HAVING sum(1) >= {DRIFT_MIN_COUNT}
     )
SELECT term, cnt_a, cnt_b,
       round(ln((cnt_a + 1e0) / (cnt_b + 1e0)), 4) AS log_ratio
FROM counts
ORDER BY abs(round(ln((cnt_a + 1e0) / (cnt_b + 1e0)), 4)) DESC, term
LIMIT {DRIFT_TOP_K}
"""


# Heaps-law vocabulary growth: vocab size after the first N docs, in
# STEP-doc increments. One first-occurrence aggregate (per term:
# min docno) + a STEP-bucket histogram + a ~|corpus|/STEP-row running
# sum — NO per-prefix distinct recomputation (the naive formulation is
# quadratic in prefix count). Over the word-3-GRAM vocabulary: the
# fixture's 31-word 1-gram pool saturates inside the first bucket,
# while the 3-gram vocabulary keeps growing corpus-wide.
VOCAB_GROWTH_STEP = 50
_VOCAB_GRAM = 3


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .indexing import doc_terms

    first = (
        doc_terms(spark, sf_dir, _VOCAB_GRAM)
        .groupBy("term")
        .agg(F.min("docno").alias("fd"))
    )
    buckets = first.groupBy(
        F.floor(F.col("fd") / VOCAB_GROWTH_STEP).cast("long").alias("b")
    ).agg(F.count("*").alias("c"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        ((F.col("b") + 1) * VOCAB_GROWTH_STEP).cast("long").alias("prefix_docs"),
        F.sum("c").over(w).cast("long").alias("vocab_size"),
    )


def _duck_vocab_growth() -> str:
    from .indexing import duck_doc_terms

    return f"""
WITH first AS (
  SELECT term, min(docno) AS fd
  FROM ({duck_doc_terms(_VOCAB_GRAM)}) GROUP BY term
),
b AS (SELECT fd // {VOCAB_GROWTH_STEP} AS b, count(*) AS c FROM first GROUP BY 1)
SELECT CAST((b + 1) * {VOCAB_GROWTH_STEP} AS BIGINT) AS prefix_docs,
       CAST(sum(c) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM b
"""


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality signals per document:
    top_word_frac (share of occurrences held by the most frequent
    token), top_bigram_frac, dup_5gram_frac (share of 5-gram
    occurrences whose gram appears more than once). High values flag
    boilerplate/spam for corpus filtering; docs too short for an n-gram
    order report 0.0.

    Single-pass shape: ONE scan + ONE explode of (n, gram)-tagged rows →
    (doc, n, gram) partial-aggregated counts → (doc, n) stats →
    conditional-agg pivot to one row per doc. Three narrowing shuffles
    total (vs six for per-n subplans) — the shape that survives 100 TB."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text"), stopworded=False).alias("toks")
    )
    return repetition_from_toks(docs)


def repetition_from_toks(docs: DataFrame) -> DataFrame:
    """repetition_signals over a PRE-TOKENIZED (doc_id, toks) relation —
    lets the cleaning pipeline derive the signals from its shared
    tokenized scan instead of re-tokenizing the corpus."""
    tag = lambda arr, n: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
    )
    tagged = docs.select(
        "doc_id",
        F.explode(
            F.concat(
                tag(F.col("toks"), 1),
                tag(kgrams_col(F.col("toks"), 2), 2),
                tag(kgrams_col(F.col("toks"), 5), 5),
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.n").alias("n"), F.col("x.g").alias("g"))
    per_n = (
        tagged.groupBy("doc_id", "n", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n")
        .agg(
            (F.max("c") / F.sum("c").cast("double")).alias("topf"),
            (
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
                / F.sum("c").cast("double")
            ).alias("dupf"),
        )
    )
    pick = lambda n, col: F.round(  # noqa: E731
        F.coalesce(F.max(F.when(F.col("n") == n, F.col(col))), F.lit(0.0)), 4
    )
    sig = per_n.groupBy("doc_id").agg(
        pick(1, "topf").alias("top_word_frac"),
        pick(2, "topf").alias("top_bigram_frac"),
        pick(5, "dupf").alias("dup_5gram_frac"),
    )
    return (
        docs.select("doc_id")
        .join(sig, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_word_frac", F.lit(0.0)).alias("top_word_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_5gram_frac", F.lit(0.0)).alias("dup_5gram_frac"),
        )
    )


def _duck_repetition() -> str:
    toks = duck_tokens_list("text", stopworded=False)
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, unnest(toks) AS g FROM d),
wc AS (SELECT doc_id, g, count(*) AS c FROM w GROUP BY doc_id, g),
ws AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_word_frac
       FROM wc GROUP BY doc_id),
b AS (SELECT doc_id, unnest({duck_kgrams('toks', 2)}) AS g FROM d),
bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY doc_id, g),
bs AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_bigram_frac
       FROM bc GROUP BY doc_id),
f AS (SELECT doc_id, unnest({duck_kgrams('toks', 5)}) AS g FROM d),
fc AS (SELECT doc_id, g, count(*) AS c FROM f GROUP BY doc_id, g),
fs AS (SELECT doc_id,
              round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE), 4)
                AS dup_5gram_frac
       FROM fc GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(ws.top_word_frac, 0.0)   AS top_word_frac,
       coalesce(bs.top_bigram_frac, 0.0) AS top_bigram_frac,
       coalesce(fs.dup_5gram_frac, 0.0)  AS dup_5gram_frac
FROM d
LEFT JOIN ws USING (doc_id)
LEFT JOIN bs USING (doc_id)
LEFT JOIN fs USING (doc_id)
"""


# --- intra-doc repetition SCRUB ------------------------------------------
# text_repetition_signals DETECTS boilerplate; this TRANSFORMS it away —
# the C4/Gopher-style cleaning step that removes repeated spans inside a
# document (log spam, templated headers, copy-paste loops) while keeping
# the first occurrence. Contract: over the full token stream, every
# NON-FIRST occurrence of a SCRUB_N-gram marks its SCRUB_N token
# positions dropped; kept tokens reassemble in order. Deterministic set
# algebra on integer positions — no scoring, no floats — so the oracle
# is exact. Scale shape: per-doc aggregates only (first-occurrence min
# per (doc, gram), span explode to <=SCRUB_N rows per repeat, one
# anti-join on (doc, pos), one per-doc reassembly aggregate) — nothing
# windows over the corpus, and the span->position explode keeps the
# coverage test LINEAR in repeats instead of a token x span range join.
SCRUB_N = 5
# Fixture honesty (the pii_scrub/SRP-clone precedent): the synthetic
# prose contains NO repeated 5-gram, so the scrub arm would be dead
# code on the raw fixture. Every SCRUB_SEED_MOD-th doc therefore gets
# its own first SCRUB_SEED_LEN tokens re-appended — the copy-paste-loop
# shape the operator exists for — constructed identically in both
# engines, so the oracle verifies real span removal, not a no-op.
SCRUB_SEED_MOD = 7
SCRUB_SEED_LEN = 8


def repetition_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_kept, kept_hash): the corpus after
    first-occurrence-wins repeated-{SCRUB_N}-gram span removal.
    kept_hash = md5 over the space-joined kept stream (no-raw-lists
    canon); docs shorter than SCRUB_N tokens pass through unchanged."""
    from .corpus import tokenized_docs

    seeded = F.when(
        (F.col("doc_id") % SCRUB_SEED_MOD == 0)
        & (F.size("toks") >= SCRUB_SEED_LEN),
        F.concat(F.col("toks"), F.slice(F.col("toks"), 1, SCRUB_SEED_LEN)),
    ).otherwise(F.col("toks"))
    t = tokenized_docs(spark, sf_dir).select(
        "doc_id", seeded.alias("toks")
    )
    gr = t.select(
        "doc_id",
        F.posexplode(kgrams_col(F.col("toks"), SCRUB_N)).alias("gpos", "g"),
    )
    first = gr.groupBy("doc_id", "g").agg(F.min("gpos").alias("g0"))
    dropped = (
        gr.join(first, ["doc_id", "g"])
        .filter(F.col("gpos") > F.col("g0"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + (SCRUB_N - 1))
            ).alias("p"),
        )
        .distinct()
    )
    tokpos = t.select("doc_id", F.posexplode("toks").alias("p", "tok"))
    kept = tokpos.join(dropped, ["doc_id", "p"], "left_anti")
    out = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("kept_hash"),
    )
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"  # md5('') — all-dropped/empty docs
    return (
        t.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("kept_hash"), F.lit(empty_md5)).alias("kept_hash"),
        )
    )


def _duck_repetition_scrub() -> str:
    lst = duck_tokens_list("text", stopworded=False)
    n = SCRUB_N
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN doc_id % {SCRUB_SEED_MOD} = 0
                   AND len(toks0) >= {SCRUB_SEED_LEN}
              THEN toks0 || toks0[1:{SCRUB_SEED_LEN}] ELSE toks0 END AS toks
  FROM (SELECT doc_id, {lst} AS toks0 FROM documents)),
gr AS MATERIALIZED (
  SELECT doc_id, (u.i - 1) AS gpos, u.g FROM (
    SELECT doc_id, unnest(list_transform({duck_kgrams('toks', n)},
                                         (g, i) -> {{'i': i, 'g': g}})) AS u
    FROM t)),
first AS (SELECT doc_id, g, min(gpos) AS g0 FROM gr GROUP BY doc_id, g),
dropped AS (
  SELECT DISTINCT doc_id, unnest(generate_series(gpos, gpos + {n - 1})) AS p
  FROM gr JOIN first USING (doc_id, g) WHERE gpos > g0),
tokpos AS (
  SELECT doc_id, (u.i - 1) AS p, u.t AS tok FROM (
    SELECT doc_id, unnest(list_transform(toks, (t, i) -> {{'i': i, 't': t}})) AS u
    FROM t)),
kept AS (
  SELECT tokpos.* FROM tokpos
  LEFT JOIN dropped USING (doc_id, p) WHERE dropped.p IS NULL),
outp AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY p)) AS kept_hash
  FROM kept GROUP BY doc_id)
SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       coalesce(outp.n_kept, 0) AS n_kept,
       coalesce(outp.kept_hash, md5('')) AS kept_hash
FROM t LEFT JOIN outp USING (doc_id)
"""


def quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health profile: the dashboard aggregate a
    pipeline watches to catch one feed going bad (ratio drift = tokenizer
    or scraper regression in that source).

    NO join at all: `source` lives on the same documents row the quality
    signals derive from, so the signals are computed inline and the only
    wide op is the source-keyed aggregate (ONE Exchange, source-sized).
    Round 3 shipped this as signals-join-documents with a corpus-sized
    broadcast hint; round 4 first dropped the hint (verdict #4), then
    dropped the join — a doc_id shuffle of both corpus-sized sides that
    never needed to exist. Signal expressions replicate quality_scores
    exactly (incl. the per-doc 4dp rounding) so the oracle SQL — still
    the composed quality-scores-join form — is value-identical."""
    docs = table(spark, sf_dir, "documents").select(
        "source",
        "text",
        tokens_col(F.col("text"), stopworded=False).alias("toks"),
    ).withColumn("kept", filter_stopwords(F.col("toks")))
    n_tok = F.size("toks")
    per_doc = docs.select(
        "source",
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            (n_tok - F.size("kept")) / F.greatest(n_tok, F.lit(1)).cast("double"),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
            / F.length("text").cast("double"),
            4,
        ).alias("digit_ratio"),
    )
    # Ratio means use the integer micro-unit fold (the DSIR lesson):
    # each per-doc 4-dp ratio agrees across engines, so its *1e4 integer
    # recovers exactly; integer sums are associative, one final floor
    # renders ppm. The denominator counts the COLUMN, not *, preserving
    # avg()'s NULL-exclusion semantics (digit_ratio is NULL for an
    # empty text — r7 code review). avg(n_tokens) stays a float avg:
    # integer summands are exact in double, so any fold order agrees.
    e4 = lambda c: F.floor(F.col(c) * 1e4 + F.lit(0.5)).cast("long")  # noqa: E731
    ppm = lambda c: (  # noqa: E731
        F.floor(
            F.sum(e4(c)) * 100 / F.count(F.col(c)) + F.lit(0.5)
        ).cast("long")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        ppm("stopword_ratio").alias("avg_stopword_ratio_ppm"),
        ppm("digit_ratio").alias("avg_digit_ratio_ppm"),
    )


def _duck_quality_by_source() -> str:
    ppm = (
        "CAST(floor(sum(CAST(floor(q.{c} * 1e4 + 0.5) AS BIGINT)) * 100"
        " / count(q.{c}) + 0.5) AS BIGINT)"
    )
    return f"""
SELECT d.source,
       count(*) AS n_docs,
       round(avg(q.n_tokens), 4) AS avg_tokens,
       {ppm.format(c='stopword_ratio')} AS avg_stopword_ratio_ppm,
       {ppm.format(c='digit_ratio')} AS avg_digit_ratio_ppm
FROM ({_duck_quality()}) q
JOIN documents d USING (doc_id)
GROUP BY d.source
"""


# --- collocations (PMI) -------------------------------------------------
# Pointwise mutual information over corpus bigrams: the collocation
# detector (multi-word expressions) a tokenizer/vocab pipeline runs
# before merge learning. Counts are exact; the log arithmetic is the
# same double expression in both engines; ranking rounds first and
# tie-breaks on the gram so the top-k cut is deterministic.
PMI_MIN_COUNT = 20
PMI_TOP_K = 50


def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        tokens_col(F.col("text"), stopworded=False).alias("toks")
    )
    words = docs.select(F.explode("toks").alias("w"))
    bigrams = docs.select(
        F.explode(kgrams_col(F.col("toks"), 2)).alias("g")
    )
    # totals derive from the aggregated tables (sum of counts), NOT from
    # separate .count() jobs — one scan for words, one for bigrams
    wc = words.groupBy("w").agg(F.count("*").alias("cw"))
    bc_all = bigrams.groupBy("g").agg(F.count("*").alias("cg"))
    n1df = wc.agg(F.sum("cw").cast("double").alias("n1"))
    n2df = bc_all.agg(F.sum("cg").cast("double").alias("n2"))
    bc = bc_all.filter(F.col("cg") >= PMI_MIN_COUNT)
    w1 = F.split(F.col("g"), " ").getItem(0)
    w2 = F.split(F.col("g"), " ").getItem(1)
    joined = (
        bc.withColumn("w1", w1)
        .withColumn("w2", w2)
        # unigram counts are vocabulary-cardinality (Heaps' law: huge at
        # corpus scale) — no broadcast hint; the 1-row totals below are
        # the only safe broadcasts here
        .join(wc.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1")
        .join(wc.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2")
        .crossJoin(F.broadcast(n1df))
        .crossJoin(F.broadcast(n2df))
    )
    pmi = F.round(
        F.log(
            (F.col("cg") / F.col("n2"))
            / ((F.col("c1") / F.col("n1")) * (F.col("c2") / F.col("n1")))
        ),
        6,
    )
    return (
        joined.select("g", F.col("cg").alias("n_occ"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("g"))
        .limit(PMI_TOP_K)
    )


def _duck_pmi() -> str:
    toks = duck_tokens_list("text", stopworded=False)
    return f"""
WITH d AS MATERIALIZED (SELECT {toks} AS toks FROM documents),
w AS (SELECT unnest(toks) AS w FROM d),
b AS (SELECT unnest({duck_kgrams('toks', 2)}) AS g FROM d),
wc AS (SELECT w, count(*) AS cw FROM w GROUP BY w),
n1 AS (SELECT count(*) AS n FROM w),
n2 AS (SELECT count(*) AS n FROM b),
bc AS (SELECT g, count(*) AS cg FROM b GROUP BY g HAVING count(*) >= {PMI_MIN_COUNT})
SELECT bc.g, bc.cg AS n_occ,
       round(ln((bc.cg / CAST(n2.n AS DOUBLE))
                / ((w1.cw / CAST(n1.n AS DOUBLE))
                   * (w2.cw / CAST(n1.n AS DOUBLE)))), 6) AS pmi
FROM bc
JOIN wc w1 ON w1.w = string_split(bc.g, ' ')[1]
JOIN wc w2 ON w2.w = string_split(bc.g, ' ')[2]
CROSS JOIN n1 CROSS JOIN n2
ORDER BY pmi DESC, g
LIMIT {PMI_TOP_K}
"""


# --- reproducible corpus splitting --------------------------------------
# Deterministic train/val/test assignment: first hex digit of
# md5(doc_id-as-string). Lowercase hex is lexicographically ordered, so
# string range comparisons give exact 12/2/2-sixteenths buckets with NO
# engine-specific hashing — md5 of the same string is identical
# everywhere, which is what makes the split reproducible across engines,
# re-runs and cluster sizes (the property a training pipeline needs so a
# doc never migrates between train and eval).


def _split_expr_spark():
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        F.when(h < "c", F.lit("train"))
        .when(h < "e", F.lit("val"))
        .otherwise(F.lit("test"))
    )


_SPLIT_SQL = (
    "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train' "
    "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val' "
    "ELSE 'test' END"
)


def split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split): the per-document split label (75/12.5/12.5)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", _split_expr_spark().alias("split"))


DUCK_SPLIT_ASSIGNMENT = f"SELECT doc_id, {_SPLIT_SQL} AS split FROM documents"


def split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split doc/char totals — the sanity profile run after any
    split change (ratios drift ⇒ the hash input changed)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(_split_expr_spark().alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


DUCK_SPLIT_SUMMARY = f"""
SELECT {_SPLIT_SQL} AS split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


# --- PII / identifier scrubbing -------------------------------------
# The redaction pass every training-data pipeline runs before text
# reaches a model. The synthetic documents fixture contains no free-text
# PII (no digits or @ at all), so the operator is exercised over a
# log-shaped text ASSEMBLED IN-QUERY from relational data (a per-
# customer order log — the realistic "identifiers leak into free text"
# case); both engines assemble the identical string, so the oracle is
# fair. The machinery under test is the real thing: pattern-priority
# redaction (specific entity pattern before the generic digit-run
# catch-all), per-row match accounting, and a post-scrub content hash.
# Scale: one groupBy over orders + a key join to customer; regexes are
# JVM-side (whole-stage codegen), never per-row Python.
_CUST_RE = "Customer#[0-9]+"
_NUM_RE = "[0-9]+"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, n_cust_ids, n_numbers, scrub_hash): redaction
    accounting over a per-customer order-log line."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    logline = orders.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("keys_csv")
    )
    lines = cust.join(
        logline, cust["c_custkey"] == logline["o_custkey"]
    ).select(
        "c_custkey",
        F.concat(
            F.col("c_name"), F.lit(" placed orders: "), F.col("keys_csv")
        ).alias("line"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("line"), _CUST_RE, "[CUST]"), _NUM_RE, "[NUM]"
    )
    return lines.select(
        "c_custkey",
        F.size(F.regexp_extract_all(F.col("line"), F.lit(_CUST_RE), F.lit(0)))
        .cast("long")
        .alias("n_cust_ids"),
        F.size(F.regexp_extract_all(F.col("line"), F.lit(_NUM_RE), F.lit(0)))
        .cast("long")
        .alias("n_numbers"),
        F.md5(scrubbed).alias("scrub_hash"),
    )


def _duck_pii_scrub() -> str:
    return f"""
WITH logline AS (
       SELECT o_custkey,
              string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
                AS keys_csv
       FROM orders GROUP BY o_custkey),
     lines AS (
       SELECT c_custkey,
              c_name || ' placed orders: ' || keys_csv AS line
       FROM customer JOIN logline ON c_custkey = o_custkey)
SELECT c_custkey,
       CAST(len(regexp_extract_all(line, '{_CUST_RE}')) AS BIGINT) AS n_cust_ids,
       CAST(len(regexp_extract_all(line, '{_NUM_RE}')) AS BIGINT) AS n_numbers,
       md5(regexp_replace(regexp_replace(line, '{_CUST_RE}', '[CUST]', 'g'),
                          '{_NUM_RE}', '[NUM]', 'g')) AS scrub_hash
FROM lines
"""


# RAG/embedding chunk preparation: split every document's token stream
# into fixed-size overlapping windows — the operator that feeds an
# embedding model (each chunk becomes one vector) or a context-window
# retriever. Stride < window gives the standard overlap so no phrase is
# cut at every boundary. The chunk count is exact integer math
# (1 + ceil(max(n-W,0)/S)) so the last window always reaches the end of
# the doc and no start position is emitted past it — both engines derive
# the same chunk set by construction. Plan shape: one pass over the
# shared tokenized scan, a per-row posexplode (narrow), NO shuffle at
# all — the ideal 100 TB transform.
CHUNK_WINDOW = 64  # tokens per chunk
CHUNK_STRIDE = 48  # overlap = WINDOW - STRIDE = 16 tokens


def chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tok, chunk_text): overlapping
    fixed-stride token windows over the FULL token stream (stopwords
    kept — chunks feed an embedding model, not the index)."""
    from .corpus import tokenized_docs

    W, S = CHUNK_WINDOW, CHUNK_STRIDE
    t = (
        tokenized_docs(spark, sf_dir)
        .select("doc_id", "toks", F.size("toks").alias("n"))
        .filter(F.col("n") > 0)
        .withColumn(
            "nc", 1 + F.expr(f"(greatest(n - {W}, 0) + {S - 1}) div {S}")
        )
    )
    return (
        t.select(
            "doc_id",
            "toks",
            "n",
            F.posexplode(F.expr(f"sequence(0, (nc - 1) * {S}, {S})")).alias(
                "chunk_id", "start_tok"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long"),
            "start_tok",
            (F.least(F.col("start_tok") + W, F.col("n")) - F.col("start_tok"))
            .alias("n_tok"),
            F.array_join(F.expr(f"slice(toks, start_tok + 1, {W})"), " ").alias(
                "chunk_text"
            ),
        )
    )


def _duck_chunk_windows() -> str:
    W, S = CHUNK_WINDOW, CHUNK_STRIDE
    toks = duck_tokens_list("text", stopworded=False)
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks, len({toks}) AS n FROM documents
), s AS (
  SELECT doc_id, toks, n,
         1 + (greatest(n - {W}, 0) + {S - 1}) // {S} AS nc
  FROM t WHERE n > 0
), e AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, CAST((nc - 1) * {S} AS BIGINT), {S}))
           AS start_tok
  FROM s
)
SELECT doc_id,
       CAST(start_tok // {S} AS BIGINT) AS chunk_id,
       start_tok,
       least(start_tok + {W}, n) - start_tok AS n_tok,
       array_to_string(toks[start_tok + 1 : least(start_tok + {W}, n)], ' ')
         AS chunk_text
FROM e
"""


def distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_bigrams, n_distinct, diversity_ppm): distinct-n
    generation-diversity profile per source — the share of bigram
    occurrences that are distinct bigrams (distinct-2 in the Li et al.
    diversity-metric family). Low diversity flags template/boilerplate
    feeds; the repetition_signals query scores the same hazard per-doc,
    this one monitors it per-FEED. Shape at scale: the SHARED cached
    tokenized scan (plans/corpus.py — no second tokenize pass; r6 code
    review) joined to the narrow (doc_id, source) projection, bigram
    explode, then a two-phase distinct aggregate — Spark plans
    count(DISTINCT g) as a partial (source, g) pre-aggregate before the
    final per-source rollup, so the shuffle carries distinct bigrams,
    never the raw occurrence stream."""
    from .corpus import tokenized_docs

    docs = (
        tokenized_docs(spark, sf_dir)
        .select("doc_id", "toks")
        .join(table(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id")
    )
    bg = docs.select("source", F.explode(kgrams_col(F.col("toks"), 2)).alias("g"))
    return (
        bg.groupBy("source")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.countDistinct("g").alias("n_distinct"),
        )
        .select(
            "source",
            "n_bigrams",
            "n_distinct",
            F.floor(
                F.col("n_distinct") / F.col("n_bigrams") * 1e6 + F.lit(0.5)
            )
            .cast("long")
            .alias("diversity_ppm"),
        )
    )


def _duck_distinct_ngrams() -> str:
    lst = duck_tokens_list("text", stopworded=False)
    return f"""
WITH t AS (SELECT source, {lst} AS toks FROM documents),
     bg AS (SELECT source, unnest({duck_kgrams('toks', 2)}) AS g FROM t)
SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       CAST(floor(count(DISTINCT g) / count(*) * 1e6 + 0.5) AS BIGINT)
         AS diversity_ppm
FROM bg GROUP BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "text_distinct_ngrams": QuerySpec(
        fn=distinct_ngrams,
        oracle=_duck_distinct_ngrams(),
        note="per-source distinct-bigram diversity share (distinct-n "
        "boilerplate monitor), two-phase distinct aggregate",
    ),
    "text_chunk_windows": QuerySpec(
        fn=chunk_windows,
        oracle=_duck_chunk_windows(),
        note="RAG chunk preparation: fixed-stride overlapping token "
        "windows (W=64, S=48) — shuffle-free narrow transform over the "
        "shared tokenized scan",
    ),
    "text_pii_scrub": QuerySpec(
        fn=pii_scrub,
        oracle=_duck_pii_scrub(),
        note="identifier/PII redaction machinery (pattern-priority "
        "replace, match accounting, post-scrub hash) over a log-shaped "
        "text assembled in-query — the documents fixture has no "
        "free-text PII, disclosed",
    ),
    "text_token_counts": QuerySpec(fn=token_counts, oracle=DUCK_TOKEN_COUNTS),
    "corpus_split_assignment": QuerySpec(
        fn=split_assignment,
        oracle=DUCK_SPLIT_ASSIGNMENT,
        note="reproducible train/val/test assignment via portable "
        "md5-hex range bucketing",
    ),
    "corpus_split_summary": QuerySpec(
        fn=split_summary,
        oracle=DUCK_SPLIT_SUMMARY,
        note="per-split doc/char profile of the reproducible split",
    ),
    "text_repetition_scrub": QuerySpec(
        fn=repetition_scrub,
        oracle=_duck_repetition_scrub(),
        note="C4/Gopher-style intra-doc repetition REMOVAL (first "
        "occurrence of a repeated 5-gram wins, its later spans "
        "dropped) — the content transform behind the repetition "
        "signals; exact integer position algebra, linear span "
        "explode instead of a token x span range join",
    ),
    "text_repetition_signals": QuerySpec(
        fn=repetition_signals,
        oracle=_duck_repetition(),
        note="Gopher/C4-style repetition quality signals (top-word / "
        "top-bigram / duplicate-5-gram occurrence shares)",
    ),
    "text_quality_scores": QuerySpec(fn=quality_scores, oracle=_duck_quality()),
    "text_lang_id": QuerySpec(fn=lang_id, oracle=_duck_lang_id()),
    "text_fingerprints": QuerySpec(fn=fingerprints, oracle=DUCK_FINGERPRINTS),
    "text_quality_by_source": QuerySpec(
        fn=quality_by_source,
        oracle=_duck_quality_by_source(),
        note="per-source corpus health profile (feed-regression monitor)",
    ),
    "text_collocations_pmi": QuerySpec(
        fn=collocations_pmi,
        oracle=_duck_pmi(),
        note="top-k PMI collocations (multi-word-expression detector; "
        "deterministic rounded-then-tiebroken ranking)",
    ),
    "text_rolling_fingerprints": QuerySpec(
        fn=rolling_fingerprints,
        oracle=DUCK_ROLLING_FPS,
        note="Rabin-Karp-style polynomial rolling hash over the token "
        "stream (order-sensitive, incrementally maintainable)",
    ),
    "text_term_length_hist": QuerySpec(fn=term_length_hist, oracle=DUCK_TERM_LENGTH_HIST),
    "text_vocab_drift": QuerySpec(
        fn=vocab_drift,
        oracle=_duck_vocab_drift(),
        note="unigram frequency drift between corpus halves (feed-health "
        "regression detector), Laplace-smoothed log-ratio ranking",
    ),
    "text_unigram_surprisal": QuerySpec(
        fn=unigram_surprisal,
        oracle=_duck_surprisal(),
        note="CCNet-style per-doc LM-surprisal quality signal (corpus "
        "unigram model), vocabulary join unhinted",
    ),
    "text_bigram_surprisal": QuerySpec(
        fn=bigram_surprisal,
        oracle=_duck_bigram_surprisal(),
        note="conditional bigram-LM surprisal (add-α smoothed) — the "
        "word-order quality gate the unigram model cannot see",
    ),
    "text_backoff_lm_score": QuerySpec(
        fn=backoff_lm_score,
        oracle=_duck_backoff_lm(),
        note="Stupid Backoff (Brants 2007) held-out LM scoring: train "
        "on the even-doc_id half, score the odd half — backoff "
        "genuinely fires on unseen bigrams (dead code in self-trained "
        "LMs); integer micro-unit fold, unhinted Zipf-key joins under "
        "the AQE skew posture",
    ),
    "text_vocab_growth": QuerySpec(
        fn=vocab_growth,
        oracle=_duck_vocab_growth(),
        note="Heaps-law vocabulary growth curve via first-occurrence "
        "histogram + running sum (no per-prefix distinct recompute)",
    ),
    "text_bpe_vocab": QuerySpec(
        fn=bpe_vocab,
        oracle=DUCK_BPE_VOCAB,
        note="GPT-2-style pre-tokenizer piece vocabulary (regex "
        "restricted to the Java-regex/RE2 common subset)",
    ),
}
