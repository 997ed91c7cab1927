"""Round-7 resolution-family tests: fuzzy record linkage and
sign-random-projection (hyperplane) LSH.

Each new operator gets (a) a ground-truth property check against an
exact brute-force computed independently of the query's own plumbing,
and (b) a plan-shape assertion pinning the scale contract the docstring
claims (dictionary-sized joins; zero-shuffle signature projection).
"""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F

from conftest import physical_plan as _physical
from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
    resolution as R,
)
from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
    table,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _expected_linkage(names: dict[str, int]) -> dict:
    """Plain-Python replica of the guarded blocking contract: lev<=2
    pairs sharing at least one intact NON-EMPTY, NON-HOT token."""
    from collections import Counter

    census: Counter = Counter()
    for name in names:
        for t in set(name.split(" ")):
            if t:
                census[t] += 1
    cap_ok = {
        t
        for t, bn in census.items()
        if bn * 1_000_000 <= R.LINKAGE_HOT_TOKEN_PPM * len(names)
    }
    expected = {}
    for a, b in itertools.combinations(sorted(names), 2):
        if set(a.split(" ")) & set(b.split(" ")) & cap_ok:
            d = _lev(a, b)
            if d <= R.LINKAGE_MAX_LEV:
                expected[(a, b)] = (d, names[a], names[b])
    return expected


def test_record_linkage_matches_brute_force_within_contract(spark, sf_dir):
    """Exhaustive O(n^2) over the distinct-name dictionary (62 names at
    sf0.001 — free here, the thing the operator exists to avoid at
    scale): the query must return EXACTLY the lev<=2 pairs that share at
    least one non-empty, sub-cap whitespace token (the guarded blocking
    contract), and every returned pair must carry correct lev and
    record counts."""
    names = {
        r["p_name"]: r["n"]
        for r in table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expected = _expected_linkage(names)
    got = {
        (r["name_a"], r["name_b"]): (r["lev"], r["recs_a"], r["recs_b"])
        for r in R.record_linkage(spark, sf_dir).collect()
    }
    assert got == expected


def test_record_linkage_hot_token_guard(spark, tmp_path):
    """Seed a stopword-like token ('inc') across 500 of 620 synthetic
    entities: the guard must (1) drop that token from blocking — no
    bucket in the blocked relation exceeds the cap, so the candidate
    join is bounded by the benign buckets — while (2) still finding the
    lev<=2 pairs linked by their intact benign token, and (3) agreeing
    with the identically-guarded DuckDB oracle."""
    import duckdb
    import pandas as pd

    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
        oracle,
    )

    # 500 hot-token names ('alpha0 inc' ... pairwise lev>2 via distinct
    # numerals) + 120 benign two-token names forming 60 lev=1 pairs
    rows = [f"alpha{i} inc" for i in range(500)]
    for i in range(60):
        rows.append(f"widget{i}x brand{i}")
        rows.append(f"widget{i}y brand{i}")
    sf_dir = str(tmp_path / "skew")
    (tmp_path / "skew").mkdir()
    pd.DataFrame({"p_name": rows}).to_parquet(f"{sf_dir}/part.parquet")
    try:
        names = {n: 1 for n in rows}
        expected = _expected_linkage(names)
        # the seeded benign pairs are found; 'inc' links nothing
        assert len(expected) == 60
        got = {
            (r["name_a"], r["name_b"]): (r["lev"], r["recs_a"], r["recs_b"])
            for r in R.record_linkage(spark, sf_dir).collect()
        }
        assert got == expected
        # bucket-census assert: no blocked token elects more names than
        # the cap allows (i.e. 'inc' at 500/620 = 81% was excluded)
        cap = R.LINKAGE_HOT_TOKEN_PPM * len(rows) / 1_000_000
        toks = R._names_cached(spark, sf_dir).select(
            "p_name",
            F.explode(F.split(F.col("p_name"), " ")).alias("token"),
        )
        # replicate the query's keep-set and census the blocked relation
        census = (
            toks.filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count("*").alias("bn"))
            .filter(F.col("bn") * 1_000_000 <= R.LINKAGE_HOT_TOKEN_PPM * len(rows))
            .agg(F.max("bn").alias("mx"))
            .collect()[0]["mx"]
        )
        assert census <= cap
        # oracle agreement on the same synthetic corpus
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{sf_dir}/part.parquet')"
        )
        issues = oracle.compare(
            R.record_linkage(spark, sf_dir), con, R.DUCK_RECORD_LINKAGE
        )
        con.close()
        assert not issues, issues
    finally:
        caches.evict(sf_dir)


def test_record_linkage_pair_join_is_dictionary_sized(spark, sf_dir):
    """The token self-join must consume the post-aggregate distinct-name
    dictionary, never the raw record stream (records >> names, so
    joining records would square a corpus-sized relation at 100 TB) —
    and the dictionary must be the CACHED memo, so all four consumers
    read in-memory rows instead of re-deriving the aggregate (the
    record stream is scanned once per session, not 4-6 times)."""
    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
    )

    # hermetic: an earlier test's spark.catalog.clearCache() unpersists
    # the memo'd DataFrame without dropping the memo entry — evict so
    # this call rebuilds (and re-marks) the cached dictionary
    caches.evict(sf_dir)
    plan = _physical(R.record_linkage(spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 4, plan
    # Every FileScan in the rendering must sit INSIDE a cached
    # InMemoryRelation's build-plan subtree (a display artifact — the
    # build runs once); an un-cached consumer would render a FileScan
    # outside any InMemoryRelation subtree.
    in_relation_indents: list[int] = []
    file_scans = 0
    for line in plan.splitlines():
        # depth column = first char past the tree-drawing prefix
        # (spaces, ':' branch connectors, '+-' arrowheads)
        indent = len(line) - len(line.lstrip(" :+-"))
        in_relation_indents = [
            i for i in in_relation_indents if i < indent
        ]
        if "FileScan parquet" in line:
            file_scans += 1
            assert in_relation_indents, f"un-cached scan:\n{line}\n{plan}"
        if "InMemoryRelation" in line:
            in_relation_indents.append(indent)
    assert file_scans >= 1, plan  # the memo build itself is rendered
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_srp_recovers_exactly_the_true_high_cosine_pairs(spark, sf_dir):
    """Ground truth by brute force over all 525 augmented vectors
    (numpy, independent of the query's Spark plumbing): the verified
    output must (1) contain every true cos>=threshold pair whose two
    signatures collide in >=1 band — which on this fixture is ALL of
    them, the seeded clones' collision probability being 1-1.4e-9 — and
    (2) contain nothing below the threshold (the verify leg filters the
    ~3%% noise-floor candidates)."""
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    clone_ids = [i + R.SRP_CLONE_OFFSET for i in ids if i < R.SRP_N_CLONES]
    clones = vecs[[i < R.SRP_N_CLONES for i in ids]].copy()
    clones[:, 0] *= 1.01
    all_ids = ids + clone_ids
    allv = np.vstack([vecs, clones])
    norms = np.linalg.norm(allv, axis=1)
    cosm = (allv @ allv.T) / np.outer(norms, norms)
    truth = set()
    for i in range(len(all_ids)):
        for j in range(i + 1, len(all_ids)):
            a, b = sorted((all_ids[i], all_ids[j]))
            if np.floor(cosm[i, j] * 1e6 + 0.5) >= R.SRP_VERIFY_PPM:
                truth.add((a, b))
    assert len(truth) == R.SRP_N_CLONES  # the seeded clones, nothing else
    got = {
        (r["id_a"], r["id_b"]): r["cos_ppm"]
        for r in R.srp_lsh_pairs(spark, sf_dir).collect()
    }
    assert set(got) == truth
    assert all(c >= R.SRP_VERIFY_PPM for c in got.values())


def test_srp_signature_projection_is_zero_shuffle(spark, sf_dir):
    """The (vec_id, band, bucket) signature pass is scan -> project ->
    generate with NO Exchange: all 64 integer dot products and the band
    buckets compute in one narrow pass over the vectors. The only
    shuffle in the full query is the (band, bucket) self-join."""
    bands = R._srp_bands(R._augmented(spark, sf_dir))
    plan = _physical(bands)
    assert "Exchange" not in plan, plan
