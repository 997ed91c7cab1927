"""Round-10 ops: DoReMi-style domain weights (plans/pipeline.py).

Beyond the oracle-parity gate, pin the properties that make the weights
USEFUL: harder domains (higher excess surprisal) get more weight, easy
domains fall to the smoothing floor, and the weights are a distribution
(sum ~= 1e6 ppm up to per-domain flooring)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
    pipeline,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def weights(spark):
    return {
        r["source"]: r.asDict()
        for r in pipeline.doremi_weights(spark, SF).collect()
    }


def test_doremi_weights_are_a_distribution(weights):
    total = sum(w["weight_ppm"] for w in weights.values())
    # each domain's floor can shave <1 ppm; K domains bound the drift
    assert abs(total - 1_000_000) <= len(weights)


def test_doremi_floor_and_monotonicity(weights):
    k = len(weights)
    # zero-excess domains sit exactly at the smoothing-floor weight:
    # (1-c) * e0/den + c/K with e0 = 1e6 (exp(0) micro-units)
    zero = [w for w in weights.values() if w["excess_ppm"] == 0]
    assert zero, "fixture should contain at-or-below-average domains"
    assert len({w["weight_ppm"] for w in zero}) == 1
    floor_w = zero[0]["weight_ppm"]
    assert all(w["weight_ppm"] >= floor_w for w in weights.values())
    assert floor_w >= pipeline.DOREMI_SMOOTH_PPM // k
    # weight is monotone in excess
    by_excess = sorted(
        weights.values(), key=lambda w: (w["excess_ppm"], w["source"])
    )
    ws = [w["weight_ppm"] for w in by_excess]
    assert ws == sorted(ws)


def test_class_safe_guard_rejects_cross_engine_hazards():
    """The WS_CHARS import-time guard must reject every char whose
    meaning inside [...] differs across Java regex / RE2 / SQL
    literals — including '&' (Java-only class intersection: '[a&&b]'
    intersects in Java, stays literal in RE2/Python; r10 review)."""
    from simple_mapreduce_search_engine_information_retrieval__spark.functions.tokenize import (
        _class_safe,
    )

    assert _class_safe("\\t\\n\\x0b\\f\\r ") == "\\t\\n\\x0b\\f\\r "
    for bad in ["a]b", "a^b", "a-b", "a&&b", "a&b", "a'b", 'a"b',
                "a\\b", "\\x0B", "\\s"]:
        with pytest.raises(ValueError):
            _class_safe(bad)


def test_doremi_build_stage_skew_posture(spark):
    """The corpus-pass stage joins the (source, term) tf relation to
    vocabulary counts on the Zipf-skewed word key — the DSIR/surprisal
    family contract (test_round7_ops pins the family): NO broadcast
    hint on any grouped (vocabulary-sized) relation, 1-row totals only.
    Asserted on the UNcheckpointed helper because doremi_weights'
    localCheckpoint hides the build stage from the final plan."""
    lines = (
        pipeline._doremi_per_source(spark, SF)
        ._jdf.queryExecution()
        .logical()
        .toString()
        .splitlines()
    )
    hints = [i for i, l in enumerate(lines) if "ResolvedHint" in l]
    assert hints, "expected the 1-row totals broadcast hint"
    for i in hints:
        # guarded lookahead (r10 ADVICE): a hint printing as the plan's
        # final line must fail with the diagnostic assert, not IndexError
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "Aggregate [" in child and "], [" not in child, (
            "non-1-row relation under a broadcast hint:\n"
            + "\n".join(lines[i : i + 3])
        )


def test_doremi_mix_verdict_join_is_broadcast(spark):
    """The per-document verdict must never shuffle the corpus: the
    |sources|-row rate plan joins the doc scan as a BroadcastHashJoin,
    and no corpus-keyed Exchange appears after the (checkpointed)
    weights stage. SortMergeJoin anywhere in the verdict plan would
    mean the doc scan shuffled on source — the regression this pins."""
    from conftest import physical_plan

    plan = physical_plan(pipeline.doremi_mix(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_doremi_upweights_a_crafted_hard_domain(spark, tmp_path):
    """Two synthetic domains: 'easy' is one sentence repeated (low
    surprisal under the corpus LM), 'hard' is all-distinct vocabulary
    (every token rare). The hard domain must carry more weight, and
    with eta=1 the gap must be material (not smoothing noise)."""
    from simple_mapreduce_search_engine_information_retrieval__spark import (
        caches,
    )

    easy = ["the quick brown fox jumps over the lazy dog"] * 20
    hard = [
        " ".join(f"tok{i}x{j}" for j in range(9)) for i in range(20)
    ]
    texts = easy + hard
    sf_dir = str(tmp_path / "doremi")
    (tmp_path / "doremi").mkdir()
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["easy"] * len(easy) + ["hard"] * len(hard),
        }
    ).to_parquet(f"{sf_dir}/documents.parquet")
    try:
        got = {
            r["source"]: r.asDict()
            for r in pipeline.doremi_weights(spark, sf_dir).collect()
        }
        assert got["hard"]["excess_ppm"] > 0
        assert got["easy"]["excess_ppm"] == 0
        assert got["hard"]["weight_ppm"] > got["easy"]["weight_ppm"] + 50_000
        assert (
            abs(got["hard"]["weight_ppm"] + got["easy"]["weight_ppm"] - 1_000_000)
            <= 2
        )
        # the mix verdict makes the weights actionable: the
        # most-boosted domain keeps EVERYTHING (rate = max-boost/max-
        # boost = 1, and the dyadic u is strictly < 1), the easy
        # domain downsamples, and the draw is deterministic
        mix = (
            pipeline.doremi_mix(spark, sf_dir)
            .groupBy("source")
            .agg(F.count("*").alias("n"), F.sum("kept").alias("kept"))
        )
        m = {r["source"]: (r["n"], r["kept"]) for r in mix.collect()}
        assert m["hard"][1] == m["hard"][0]  # rate 1.0 keeps all
        assert m["easy"][1] < m["easy"][0]
        m2 = {
            r["source"]: (r["n"], r["kept"])
            for r in pipeline.doremi_mix(spark, sf_dir)
            .groupBy("source")
            .agg(F.count("*").alias("n"), F.sum("kept").alias("kept"))
            .collect()
        }
        assert m2 == m  # reproducible draw
    finally:
        caches.evict(sf_dir)
