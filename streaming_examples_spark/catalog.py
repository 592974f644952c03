"""Query catalog: named queries + DuckDB oracle SQL.

This is the single registry behind ``__spark_entry__.queries()`` /
``oracle_sql()``. Each entry maps to a SURVEY.md §2 inventory row (or
a training-data-pipeline operator) and pairs a Spark callable
``(spark, sf_dir) -> DataFrame`` with an equivalent ANSI-SQL oracle
string DuckDB runs over the same parquet tables.

Conventions (driver contract):
  * every computed column aliased identically on both sides;
  * doubles rounded (sum-order differences between engines otherwise
    flip low bits);
  * timestamps emitted as epoch-micros BIGINT where they appear in
    output (identical truncation on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_examples_spark.tables import load_table


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs rows-only check
    survey_ref: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}

#: plan cache — the engine's prepared-statement layer. Catalog queries
#: are pure functions of (session, sf_dir) over immutable parquet
#: inputs, so the DataFrame (an immutable logical plan) is reused on
#: repeat invocation instead of re-running Python plan construction,
#: analysis registration, and any construction-time driver work (e.g.
#: the CC fixpoint loop inside dedup_groups).
#:
#: Lifecycle: cached DataFrames hold a strong ref to their session, so
#: weak keying alone cannot evict (the values pin the keys). Instead
#: EVERY public entry point (cached lookups, ``entries``, ``release``)
#: lazily purges entries whose session has been STOPPED (the JVM-side
#: state is gone then anyway), and ``release`` lets a long-lived
#: session drop entries — and unpersist any frames the query pinned —
#: without a global ``clearCache()``. Long-lived multi-session
#: processes should still call ``release(spark)`` BEFORE stopping a
#: session: that unpersists its pinned frames promptly instead of
#: waiting for the next catalog call to purge the stopped session.
#: Bounded either way at ~#entries × #sf_dirs per live session.
_PLAN_CACHE: dict[int, tuple[SparkSession, dict[tuple[str, str], DataFrame]]] = {}


def _is_stopped(spark: SparkSession) -> bool:
    try:
        sc = spark.sparkContext
        return sc._jsc is None or sc._jsc.sc().isStopped()
    except Exception:
        return True


def _purge_stopped() -> None:
    for sid in [sid for sid, (s, _) in _PLAN_CACHE.items() if _is_stopped(s)]:
        del _PLAN_CACHE[sid]


def release(spark: SparkSession, name: str | None = None, sf_dir: str | None = None) -> int:
    """Drop plan-cache entries for ``spark`` (all, or those matching
    ``name``/``sf_dir``), unpersisting any frames the query registered
    as pinned (``df._sg_pinned`` — e.g. tx_denormalize's emit/touched
    gates). localCheckpoint blocks held by dropped entries free on GC.
    Returns the number of entries released."""
    _purge_stopped()  # stopped sessions drop here too, not only on lookups
    slot = _PLAN_CACHE.get(id(spark))
    if slot is None:
        return 0
    if slot[0] is not spark:
        # id() recycling: the slot belongs to a dead session that shared
        # this address — stale state, not this caller's entries
        del _PLAN_CACHE[id(spark)]
        return 0
    _, per_session = slot
    victims = [
        k
        for k in per_session
        if (name is None or k[0] == name) and (sf_dir is None or k[1] == sf_dir)
    ]
    df = pinned = None
    for k in victims:
        df = per_session.pop(k)
        for pinned in getattr(df, "_sg_pinned", ()) or ():
            try:
                pinned.unpersist()
            except Exception:
                pass
    # drop the loop refs BEFORE the GC below: a surviving local keeps
    # the last victim's py4j handle attached, which keeps its JVM-side
    # RDD reachable and defeats the cleanup this block exists for
    df = pinned = None
    if not per_session:
        _PLAN_CACHE.pop(id(spark), None)
    if victims:
        # localCheckpoint blocks (and shuffle files) held by the dropped
        # plans free only when the JVM-side RDDs are garbage-collected
        # and ContextCleaner's reference queue fires. Left to chance,
        # orphaned blocks from released queries pile up in executor
        # storage for the rest of the session and degrade later queries
        # (measured r12: a sequential 50-entry sweep in one JVM inflated
        # late entries 2-4x — multimodal_meta warm 7.3 s vs 1.9 s
        # isolated; the bench's trailing multimodal extras' cold 8-9.5 s
        # vs 1-2 s in r8). Collect the Python refs (detaches the py4j
        # objects) and ask the JVM for a GC so cleanup happens NOW,
        # off the timed path — release() runs between queries, never
        # inside one. SPARK_GRAFT_RELEASE_GC=0 disables (A/B escape
        # hatch; also for callers that release inside a latency-bound
        # loop and prefer lazy cleanup).
        import gc
        import os as _os
        import time as _time

        if _os.environ.get("SPARK_GRAFT_RELEASE_GC", "1") != "0":
            gc.collect()
            try:
                sc = spark.sparkContext
                # py4j (ClientServer mode) sends MEMORY_DEL detach
                # commands from a daemon FinalizerWorker draining a
                # deque — the Python GC above only ENQUEUES them. Wait
                # (bounded: the worker sleeps 1 s when idle) until the
                # queue drains so the JVM-side refs are actually gone
                # before asking the JVM to collect; measured: without
                # the drain + second GC the blocks survive System.gc()
                # indefinitely, with them they free in < 1 s.
                try:
                    dq = sc._gateway._gateway_client.finalizer_deque
                    deadline = _time.monotonic() + 2.0
                    while len(dq) > 0 and _time.monotonic() < deadline:
                        _time.sleep(0.05)
                except AttributeError:
                    pass  # non-ClientServer gateway: detach is synchronous
                sc._jvm.System.gc()
                _time.sleep(0.2)
                sc._jvm.System.gc()
            except Exception:
                pass
    return len(victims)


def register(name: str, oracle: str | None, survey_ref: str = ""):
    def deco(fn):
        def cached(spark: SparkSession, sf_dir: str, _fn=fn, _name=name) -> DataFrame:
            _purge_stopped()
            slot = _PLAN_CACHE.get(id(spark))
            if slot is None or slot[0] is not spark:
                # id() recycling: a different live object under a stale
                # id gets a fresh slot (the stale one was purged above)
                slot = _PLAN_CACHE[id(spark)] = (spark, {})
            per_session = slot[1]
            key = (_name, sf_dir)
            df = per_session.get(key)
            if df is None:
                df = per_session[key] = _fn(spark, sf_dir)
            return df

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        cached.__wrapped__ = fn
        _REGISTRY[name] = CatalogEntry(name, cached, oracle, survey_ref)
        return fn

    return deco


def entries() -> dict[str, CatalogEntry]:
    # import side-effect registration
    from streaming_examples_spark import catalog_relational  # noqa: F401
    from streaming_examples_spark import catalog_cdc  # noqa: F401
    from streaming_examples_spark import catalog_datapipe  # noqa: F401

    # every public entry point purges stopped sessions' cached plans, so
    # a long-lived multi-session process that never calls release()
    # still can't accumulate dead sessions' pinned frames indefinitely
    _purge_stopped()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.fn for name, e in entries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in entries().items() if e.oracle is not None}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def t_wide(
    spark: SparkSession, sf_dir: str, name: str, key: str | None = None
) -> DataFrame:
    """load_table + rebalance to the core count.

    The test fixtures are single-row-group parquet files: the scan
    plans ONE task regardless of maxPartitionBytes (parquet can only
    split at row-group boundaries), so any expression-heavy pipeline
    downstream — shingling, md5 minhash permutations, hyperplane dot
    products — serializes on one core. One tiny shuffle of the raw
    rows buys full-core parallelism for everything after it.

    ``key``: hash-partition the balance shuffle by this column instead
    of round-robin. When the entry's downstream aggregations/joins are
    keyed by it (doc_id/vec_id grain), they reuse THIS exchange's
    partitioning instead of adding their own (guide §2.4 — two
    operations keyed the same way share one exchange; measured r12:
    dedup_groups 0.59 s → 0.30 s, multimodal_meta 2.5 s → 1.75 s,
    curated_corpus 0.78 s → 0.52 s warm at sf0.1, outputs identical).
    Row-id cardinality ≫ partitions, so the hash spreads like
    round-robin for any non-degenerate input.

    At corpus scale the scan is already wide (row groups sized to
    maxPartitionBytes) and this shuffle would be a pure waste — use
    ``t`` there. Catalog entries wire this ONLY because they run on
    the fixtures; the operators themselves never repartition input.
    """
    df = t(spark, sf_dir, name)
    n = spark.sparkContext.defaultParallelism
    if key is not None:
        return df.repartition(n, F.col(key))
    return df.repartition(n)
