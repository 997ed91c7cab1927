"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the
``simple_mapreduce_search_engine_information_retrieval__spark`` package;
each plans-module exposes ``QUERIES: dict[str, QuerySpec]`` pairing the
Spark callable with its DuckDB oracle SQL (generated from the same
constants so the two renderings cannot drift).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)


def _registry():
    from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
        indexing,
        search,
    )

    modules = [indexing, search]
    for name in (
        "relational",
        "textstats",
        "dedup",
        "similarity",
        "streaming_batch",
        "trec_parse",
        "multimodal_queries",
        "sketches_queries",
        "pipeline",
        "sinks_sources",
        "graph",
        "merge",
        "layout",
        "resolution",
        "mining",
        "bpe",
    ):
        try:
            mod = __import__(
                "simple_mapreduce_search_engine_information_retrieval__spark.plans."
                + name,
                fromlist=[name],
            )
            modules.append(mod)
        except ImportError:
            pass
    out = {}
    for mod in modules:
        for qname, spec in mod.QUERIES.items():
            assert qname not in out, f"duplicate query name {qname}"
            out[qname] = spec
    # The driver's correctness pass is budgeted (~50 queries/round, taken in
    # registry order), so the order decides which queries accumulate
    # evidence. Derive it from the CORRECTNESS_r*.json files the driver
    # ships back into the repo — latest-verdict FAILs first, never-checked
    # next, then greens stalest-verdict-first — so no round repeats the
    # round-2 blind spot where fixed-but-failed queries were never re-run.
    ordered = sorted(out, key=_check_priority(out))
    return {name: out[name] for name in ordered}


def _latest_verdicts() -> dict[str, tuple[int, bool]]:
    """name -> (round, passed) from the newest CORRECTNESS_r*.json row
    mentioning the query. A row passes when nothing in it failed; a
    missing hash_match (rows-only check for non-SQL-expressible ops)
    does not count as a failure."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, ok)
    return latest


# Queries whose IMPLEMENTATION changed this round: their latest green
# verdict (if any) describes the OLD code, so bump them into the
# never-checked bucket to force same-round re-verification (advisor r3 —
# the stalest-first scheme alone cannot detect rewrites). Refresh this
# list each round.
CHANGED_THIS_ROUND = frozenset(
    {
        # r17 (r16 verdict #1): the persisted-store ANN serves grew the
        # empty/wrong-dim qvec guard in probe_cells — the ONE
        # probe-planning definition all three serving paths share
        # (plans/similarity.py; query_ivfpq_store's duplicated inline
        # probe was folded into it). All oracled callers pass
        # correct-dimension vectors, so values are provably unchanged
        # (tri-scale re-verified locally), but the executed serve path
        # was rewritten — listed per the r9 precedent. 4 of the 3-5
        # slots the r16 verdict pre-scoped for this fix; knn_ivf_filtered
        # is in-session (no probe_cells) and stays out. The strict
        # write-arm assignment guard (r16 verdict #7) rides
        # streaming_vector_ingest's slot (same query), and the
        # PQ-geometry introspection (r17 coupling audit: the ADC serve
        # reads the subspace count off the codes part instead of PQ_M)
        # rides knn_ivfpq_store_roundtrip's slot. No new queries —
        # every spare slot goes to r12/r13-stale rows (r16 verdict #2/#3).
        "knn_ivf_store_roundtrip",
        "knn_ivfpq_store_roundtrip",
        "knn_ivf_rebalanced_roundtrip",
        "streaming_vector_ingest",
        # r17 (r16 verdict #6, optional): build_index(chargrams=True)
        # now persists the gram k in a 1-row gramk part and
        # wildcard_indexed probes at the persisted k instead of the
        # CHARGRAM_K constant — the build/serve coupling is eliminated.
        # Values unchanged (the part is written at the same constant),
        # but the roundtrip's executed build+serve path changed. 5th
        # slot, inside the verdict's pre-scoped budget.
        "wildcard_indexed_roundtrip",
    }
)


def _check_priority(registry):
    latest = _latest_verdicts()
    insertion = {name: i for i, name in enumerate(registry)}

    def key(name):
        if name in latest and not latest[name][1]:
            bucket, rnd = 0, latest[name][0]  # latest verdict is FAIL
        elif name not in latest:
            bucket, rnd = 1, 0  # never checked: zero evidence anywhere
        elif name in CHANGED_THIS_ROUND:
            # changed implementation, but a past green exists and the
            # local oracle re-verified the rewrite — after the
            # zero-evidence queries when the budget is tight
            bucket, rnd = 2, 0
        else:
            bucket, rnd = 3, latest[name][0]  # green; stalest first
        return (bucket, rnd, insertion[name])

    return key


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    interactive-search shape — tokenize → postings lookup → tf-idf
    score → top-10 (SURVEY.md §3.3)."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        search,
    )

    return search(spark, "/root/testdata/sf0.001", "spark join")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
