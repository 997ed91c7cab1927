"""Graph analytics over the term co-occurrence graph.

PageRank with FIXED-POINT integer arithmetic: every probability is a
scaled BIGINT (units of 1e-12) and every operation is integer add /
multiply / floor-divide — associative and identical in Spark and DuckDB,
so an iterative float-free PageRank carries a full value oracle (the
same trick class as the decimal-accumulated k-means: make the iterative
math exact, then cross-engine determinism is free).

Graph: nodes = the 1-gram vocabulary; edges = term co-occurrence within
a document (both directions, deduplicated). The fixture vocabulary is
dictionary-sized, but the plan is corpus-scale: the edge build is a
docno self-join of the distinct (docno, term) stream (bounded by
per-doc vocabulary, the classic co-occurrence shape), and each
iteration is one join + one partial-aggregated sum over edges — the
standard distributed PageRank step.

Scale notes: node count n is read driver-side at plan time (one count
of a dictionary-sized relation — same discipline as the ANN probe
planning); rank updates shuffle on dst with map-side combine; the
damping redistribution is a constant, not a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from .indexing import duck_doc_terms

PR_SCALE = 10**12  # fixed-point unit: 1e-12 probability
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact ratio
PR_ITERS = 2  # unrolled below; every round is the same one-join step


def _edges_outdeg_nodes(spark: SparkSession, sf_dir: str):
    # per-doc DISTINCT terms from the shared tokenized scan (one corpus
    # pass, cached) — the co-occurrence self-join then runs over the
    # small (docno, term) stream
    from .corpus import tokenized_docs

    dt = tokenized_docs(spark, sf_dir).select(
        F.col("doc_id").alias("docno"),
        F.explode(F.array_distinct(F.col("kept"))).alias("term"),
    )
    a = dt.select(F.col("term").alias("src"), "docno")
    b = dt.select(F.col("term").alias("dst"), "docno")
    # edges/outdeg/nodes are dictionary-sized and referenced by both
    # unrolled iterations — cache so the co-occurrence join runs once
    edges = (
        a.join(b, "docno")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .cache()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg")).cache()
    nodes = dt.select(F.col("term").alias("node")).distinct().cache()
    return edges, outdeg, nodes


def pagerank_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, pr_scaled): two unrolled PageRank rounds in scaled-BIGINT
    arithmetic — p'(v) = (15*SCALE)//(100*n) + (85 * Σ_u p(u)//deg(u))//100."""
    edges, outdeg, nodes = _edges_outdeg_nodes(spark, sf_dir)
    n = nodes.count()  # dictionary-sized; plan-time constant
    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // (PR_D_DEN * n)
    p0 = PR_SCALE // n

    def step(p_df: DataFrame | None) -> DataFrame:
        if p_df is None:  # uniform p0: share is a per-src constant
            shares = edges.join(outdeg, "src").select(
                "dst", F.expr(f"{p0} div deg").alias("share")
            )
        else:
            shares = (
                edges.join(p_df.withColumnRenamed("node", "src"), "src")
                .join(outdeg, "src")
                .select("dst", F.expr("p div deg").alias("share"))
            )
        s = shares.groupBy("dst").agg(F.sum("share").alias("s"))
        return nodes.join(
            s, nodes["node"] == s["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{PR_D_NUM} * coalesce(s, 0) div {PR_D_DEN}")
            ).cast("long").alias("p"),
        )

    p = step(step(None))
    return p.select(F.col("node").alias("term"), F.col("p").alias("pr_scaled"))


def _duck_pagerank() -> str:
    base = f"({PR_D_DEN - PR_D_NUM} * {PR_SCALE}) // ({PR_D_DEN} * n.n)"
    return f"""
WITH dt AS MATERIALIZED (SELECT DISTINCT docno, term FROM ({duck_doc_terms(1)})),
     edges AS MATERIALIZED (
       SELECT DISTINCT a.term AS src, b.term AS dst
       FROM dt a JOIN dt b USING (docno) WHERE a.term != b.term),
     outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
     nodes AS (SELECT DISTINCT term AS node FROM dt),
     n AS (SELECT count(*) AS n FROM nodes),
     s1 AS (SELECT e.dst, sum(({PR_SCALE} // n.n) // o.deg) AS s
            FROM edges e JOIN outdeg o ON o.src = e.src CROSS JOIN n
            GROUP BY e.dst),
     p1 AS (SELECT node, {base} + ({PR_D_NUM} * coalesce(s1.s, 0)) // {PR_D_DEN} AS p
            FROM nodes CROSS JOIN n LEFT JOIN s1 ON s1.dst = node),
     s2 AS (SELECT e.dst, sum(p1.p // o.deg) AS s
            FROM edges e JOIN p1 ON p1.node = e.src
            JOIN outdeg o ON o.src = e.src
            GROUP BY e.dst),
     p2 AS (SELECT node, {base} + ({PR_D_NUM} * coalesce(s2.s, 0)) // {PR_D_DEN} AS p
            FROM nodes CROSS JOIN n LEFT JOIN s2 ON s2.dst = node)
SELECT node AS term, CAST(p AS BIGINT) AS pr_scaled FROM p2
"""


# HITS (Kleinberg hubs & authorities) over the doc↔term BIPARTITE graph
# — the second classic link-analysis fixpoint next to PageRank, and a
# different graph shape: docs are hubs, terms are authorities, edges are
# the distinct (docno, term) incidence stream (no co-occurrence
# self-join needed). Float HITS normalizes by L2; the cross-engine-exact
# variant normalizes by the MAX score instead — max/sum/floor-div are
# integer-associative, so one-and-a-half mutual-reinforcement rounds
# (a₁ = df → h₁ = Σ a₁ₙ → a₂ = Σ h₁ₙ) carry a full value oracle.
# HITS_SCALE=1e6 keeps every intermediate < 2^63 up to ~1e6-doc corpora
# (a₂·SCALE ≤ n_docs·SCALE² = 1e18); beyond that, renormalize each
# partial sum by its running max before scaling (same trick, one extra
# tiny aggregate) — noted rather than implemented because the fixture
# contract pins this exact arithmetic.
HITS_SCALE = 10**6


def hits_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, auth_scaled): max-normalized integer HITS authorities
    after doc-hubs=1 → authorities → hubs → authorities."""
    from .corpus import tokenized_docs

    dt = (
        tokenized_docs(spark, sf_dir)
        .select(
            F.col("doc_id").alias("docno"),
            F.explode(F.array_distinct(F.col("kept"))).alias("term"),
        )
        .cache()
    )
    a1 = dt.groupBy("term").agg(F.count("*").alias("a"))  # h0 = 1 ⇒ a1 = df
    m1 = a1.agg(F.max("a").alias("m"))
    a1n = a1.crossJoin(F.broadcast(m1)).select(
        "term", F.expr(f"a * {HITS_SCALE} div m").alias("an")
    )
    h1 = dt.join(a1n, "term").groupBy("docno").agg(F.sum("an").alias("h"))
    m2 = h1.agg(F.max("h").alias("m"))
    h1n = h1.crossJoin(F.broadcast(m2)).select(
        "docno", F.expr(f"h * {HITS_SCALE} div m").alias("hn")
    )
    a2 = dt.join(h1n, "docno").groupBy("term").agg(F.sum("hn").alias("a2"))
    m3 = a2.agg(F.max("a2").alias("m"))
    return a2.crossJoin(F.broadcast(m3)).select(
        "term",
        F.expr(f"a2 * {HITS_SCALE} div m").cast("long").alias("auth_scaled"),
    )


def _duck_hits() -> str:
    s = HITS_SCALE
    return f"""
WITH dt AS MATERIALIZED (SELECT DISTINCT docno, term FROM ({duck_doc_terms(1)})),
     a1 AS (SELECT term, count(*) AS a FROM dt GROUP BY term),
     m1 AS (SELECT max(a) AS m FROM a1),
     a1n AS (SELECT term, (a * {s}) // m1.m AS an FROM a1 CROSS JOIN m1),
     h1 AS (SELECT dt.docno, sum(a1n.an) AS h
            FROM dt JOIN a1n USING (term) GROUP BY dt.docno),
     m2 AS (SELECT max(h) AS m FROM h1),
     h1n AS (SELECT docno, (h * {s}) // m2.m AS hn FROM h1 CROSS JOIN m2),
     a2 AS (SELECT dt.term, sum(h1n.hn) AS a2
            FROM dt JOIN h1n USING (docno) GROUP BY dt.term),
     m3 AS (SELECT max(a2) AS m FROM a2)
SELECT term, CAST((a2 * {s}) // m3.m AS BIGINT) AS auth_scaled
FROM a2 CROSS JOIN m3
"""


QUERIES: dict[str, QuerySpec] = {
    "graph_pagerank_terms": QuerySpec(
        fn=pagerank_terms,
        oracle=_duck_pagerank(),
        note="fixed-point integer PageRank (2 unrolled rounds) over the "
        "term co-occurrence graph — iterative algorithm with exact "
        "cross-engine arithmetic, full value oracle",
    ),
    "graph_hits_terms": QuerySpec(
        fn=hits_terms,
        oracle=_duck_hits(),
        note="max-normalized integer HITS authorities over the doc-term "
        "bipartite graph — second link-analysis fixpoint, no "
        "co-occurrence self-join, exact cross-engine arithmetic",
    ),
}
