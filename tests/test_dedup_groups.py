from __future__ import annotations

from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
    minhash_near_dups,
    near_dup_groups,
)


def test_transitive_groups_match_union_find(spark, sf_dir):
    pairs = [(r.doc_a, r.doc_b) for r in minhash_near_dups(spark, sf_dir).collect()]
    assert pairs, "expected planted near-dup pairs in fixture"

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    want = {x: find(x) for x in parent}

    got = {r.doc_id: r.group_id for r in near_dup_groups(spark, sf_dir).collect()}
    assert got == want
