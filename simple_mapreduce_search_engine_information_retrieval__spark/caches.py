"""Registry + eviction for session-lifetime memo caches.

Several plans memoize expensive intermediates (warm postings, shingle
sets, verified near-dup pairs) keyed by ``(applicationId, sf_dir, ...)``.
In the test/driver harness the session is short-lived and the memos are
harmless; in a long-lived driver serving many scale factors they would
grow without bound and pin cached DataFrames in executor memory. Modules
register their memo dicts here; ``evict(sf_dir)`` unpersists and drops
every entry for that corpus, ``clear()`` drops everything.
"""

from __future__ import annotations

from typing import Any

_REGISTRY: list[dict] = []


from contextlib import contextmanager


@contextmanager
def pinned_cache_partitioning(spark):
    """Pin AQE's cached-plan output re-partitioning OFF while a memo
    cache whose partitioning is a MEASURED latency choice (not a
    byte-sizing problem) is compiled and materialized (r17): the
    session-wide canChangeCachedPlanOutputPartitioning=true (session.py)
    is a broad win for scan-light cache consumers, but it coalesces a
    small cache to one byte-sized partition — which serializes
    compute-heavy-per-byte consumers (the BPE census barriers, the
    tokenized-corpus gate expressions). The conf is consulted when the
    cached plan compiles at its first action, so the pin must span the
    fill's materializing action."""
    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    old = spark.conf.get(key, "false")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def register_cache(memo: dict) -> dict:
    """Register a memo dict (keys are tuples whose second element is
    sf_dir) and return it, so modules can write
    ``_warm = register_cache({})``."""
    _REGISTRY.append(memo)
    return memo


def _unpersist(value: Any) -> None:
    from pyspark.sql import DataFrame

    if isinstance(value, DataFrame):
        try:
            value.unpersist()
            # A localCheckpoint()ed DataFrame pins its blocks on the
            # plan's SOURCE RDD, which DataFrame.unpersist() does not
            # touch (r11 ADVICE: evicting a doremi memo left the
            # checkpoint blocks on executors until ContextCleaner GC).
            # When the analyzed plan IS a checkpoint scan (LogicalRDD),
            # unpersist that RDD too; plain cached frames no-op here.
            # Guarded on isLocallyCheckpointed (r12 ADVICE): a LogicalRDD
            # can also wrap an RDD the caller built via
            # spark.createDataFrame(rdd) and may share outside the memo —
            # only an RDD that localCheckpoint() itself marked is ours to
            # release.
            plan = value._jdf.queryExecution().analyzed()
            if (
                plan.getClass().getSimpleName() == "LogicalRDD"
                and plan.rdd().isLocallyCheckpointed()
            ):
                plan.rdd().unpersist(False)
        except Exception:  # session already stopped — nothing to release
            pass
    elif isinstance(value, (tuple, list)):
        for item in value:
            _unpersist(item)


def evict(sf_dir: str | None = None) -> int:
    """Unpersist + drop every registered memo entry for ``sf_dir`` (all
    entries when None). Returns the number of entries dropped."""
    dropped = 0
    for memo in _REGISTRY:
        for key in list(memo):
            if sf_dir is None or (
                isinstance(key, tuple) and len(key) > 1 and key[1] == sf_dir
            ):
                _unpersist(memo.pop(key))
                dropped += 1
    return dropped


def clear() -> int:
    return evict(None)
