"""Cache lifecycle helper: materialize a query's result, then drop the
builder caches it was derived from (VERDICT r9 item 7 / ADVICE r8
item 4).

Several operators persist a mid-plan census (shingle hashes, SimHash
fingerprints, (class, term) counts, cluster assignments) because
multiple plan branches re-read it — without the cache Catalyst fans the
branches into repeated corpus tokenizations, the side of the trade that
explodes at 100 TB. But a LAZY returned frame over such a cache can't
unpersist it (the cache must still be live when the caller finally
collects), so those persists used to outlive the query and accumulate
vocab-/corpus-sized cache across a full-gate session.

materialize_unpersist closes the lifecycle the way the graph kernels do
(graph_queries.py bfs_distances): eagerly localCheckpoint the RESULT —
always far smaller than the builder caches here — then unpersist the
builders. The checkpoint blocks are owned by the returned frame and
reclaimed by the ContextCleaner when it is garbage-collected, unlike a
leaked .persist() which lives until session end. localCheckpoint drops
outputPartitioning (measured, SCALE.md r6), which is irrelevant for the
terminal result frames this is applied to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Builder caches whose release is deferred to the next drain point
# (next query start / bench loop / test teardown) instead of being
# paid inside the query via an eager checkpoint — see
# materialize_unpersist(defer=True).
_PENDING: list[DataFrame] = []


def materialize_unpersist(
    result: DataFrame, *cached: DataFrame, defer: bool = False
) -> DataFrame:
    """Eagerly materialize `result`, then unpersist every frame in
    `cached`. Returns the materialized result. Values are unchanged
    (checkpointing is a physical cut, not a transformation); apply
    only to terminal results, which lose their partitioning.

    defer=True (VERDICT r10 item 3): skip the checkpoint and queue the
    builder caches for release at the NEXT drain point instead. The
    eager localCheckpoint physically writes the result — a measured
    ~0.06 s on q_dedup_near's sf0.1 headline, and result-sized in
    general (a duplicate-heavy corpus makes pair output quadratic, so
    checkpointing it costs real I/O at exactly the moment the caches
    matter least). Bench-headline terminal frames take this path: the
    caller (driver / bench / test) collects the returned frame while
    the caches are still live — every branch still computes once —
    and drain_pending() releases them before the next query runs, so
    the no-leaked-persist property holds session-wide, just with the
    release moved off the timed path. Unpersist never changes values;
    a late collect after a drain merely recomputes."""
    if defer:
        _PENDING.extend(cached)
        return result
    out = result.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    return out


# Session-cached one-row corpus-scalar frames (VERDICT r12 item 5 —
# the adaptive-dedup memo pattern generalized): keyed by application,
# resolved corpus path, table, tag, and a file-level data identity, so
# a regenerated corpus or a new session can never serve stale scalars.
# Values are PERSISTED lazy frames, not collected scalars — building
# one launches no job (the r3 plan-inspection rule), and the first
# action of whichever query runs first populates the Spark cache every
# later run of ANY query sharing the scalar then reuses.
_CORPUS_FRAMES: dict[tuple, DataFrame] = {}
_CORPUS_FRAMES_CAP = 256


def table_identity(sf_dir: str, table: str) -> tuple:
    """File-level identity of a catalog table dir — (name, size,
    mtime_ns) per data file (catalog layout `<sf_dir>/<table>.parquet`,
    catalog.table_path). Ties a memo entry to the BYTES it was computed
    from; missing paths yield an empty identity rather than raising
    (the query's own scan produces the authoritative error)."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isfile(path):
        st = os.stat(path)
        return ((table, st.st_size, st.st_mtime_ns),)
    if not os.path.isdir(path):
        return ()
    out = []
    for base, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.startswith(("_", ".")):
                continue
            st = os.stat(os.path.join(base, fn))
            out.append((fn, st.st_size, st.st_mtime_ns))
    return tuple(sorted(out))


def corpus_scalars(spark, sf_dir: str, table: str, tag: str, build):
    """A persisted one-row scalar frame over an immutable corpus,
    shared across query invocations in the session. `build` is a
    zero-arg callable returning the LAZY aggregate frame; it runs (and
    is persisted) only on the first request for this (corpus, tag) —
    later invocations of the same query, or of any query sharing the
    scalar, reuse the cached single row instead of re-aggregating
    (often re-tokenizing) the corpus. Construction is side-effect-free:
    no job runs until a consumer acts on the returned frame."""
    import os

    sf_real = os.path.realpath(sf_dir)
    key = (
        spark.sparkContext.applicationId,
        sf_real,
        table,
        tag,
        table_identity(sf_real, table),
    )
    df = _CORPUS_FRAMES.get(key)
    if df is None:
        if len(_CORPUS_FRAMES) >= _CORPUS_FRAMES_CAP:
            # Stale identities of regenerated paths / dead sessions
            # would otherwise accumulate forever. The frames are
            # one-row caches; dropping the dict without unpersisting
            # leaves them to the ContextCleaner.
            _CORPUS_FRAMES.clear()
        df = build().persist()
        _CORPUS_FRAMES[key] = df
    return df


def drain_pending() -> int:
    """Release every deferred builder cache. Called at query start by
    the driver-contract wrapper (__spark_entry__), between bench runs,
    and by the test harness teardown; returns the number released."""
    from pyspark.sql import SparkSession

    n = 0
    while _PENDING:
        c = _PENDING.pop()
        try:
            c.unpersist()
        except Exception:
            # Tolerate ONLY the stopped/replaced-session case (a test
            # harness tearing down between queries, or a stale frame
            # from a prior session drained after a new one started);
            # an unpersist failure on a frame of the LIVE session means
            # broken driver state the next query must not silently
            # inherit (ADVICE r11). Liveness compares the underlying
            # SparkContext applicationIds, not Python wrapper identity
            # (ADVICE r11 item 2: newSession()/re-created wrappers
            # around the same JVM session are the same live engine, and
            # a genuine failure there must still raise). Touching a
            # STOPPED context's applicationId raises -> not alive.
            try:
                active = SparkSession.getActiveSession()
                alive = (
                    active is not None
                    and c.sparkSession.sparkContext.applicationId
                    == active.sparkContext.applicationId
                )
            except Exception:
                alive = False
            if alive:
                raise
        n += 1
    return n
