"""Streaming declared queries (rows-only checks — SURVEY.md §5.2.3).

Each runs a real Structured Streaming query to completion over a staged
multi-file copy of `events` (n files -> n micro-batches, the twin of
the reference's poll loop, AbstractFirehose.java:113-142) and returns a
batch DataFrame of the outcome. No oracle SQL: DuckDB has no streaming
semantics; the driver records the weaker rows-only check by design.
"""

from __future__ import annotations

import contextlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .pipeline import (
    file_event_stream,
    latest_value_stream,
    stage_event_files,
    windowed_counts_stream,
)
from .sinks import to_prometheus_text
from .state import ttl_latest_value

_N_FILES = 4

# One staged events dir per sf_dir, shared by every streaming query in
# the process (VERDICT r1 item 1: per-query re-staging dominated the
# driver's smoke budget). The staged files are read-only inputs; each
# query still gets its own checkpoint dir, so sharing is safe.
_STAGED: dict[str, str] = {}


def _workdir() -> str:
    return tempfile.mkdtemp(prefix="firehose_stream_")


@contextlib.contextmanager
def _few_partitions(spark: SparkSession, n: int = 8):
    """Stateful streaming ops pay per-micro-batch state-store + Python
    exchange overhead PER shuffle partition; the smoke's ~750 series
    don't need 32. Scoped to the query (fresh checkpoints each run, so
    repartitioning state is safe); on a cluster the session default
    stands."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _staged_events(spark: SparkSession, sf_dir: str, root: str) -> DataFrame:
    events_dir = _STAGED.get(sf_dir)
    if events_dir is None:
        events_dir = os.path.join(
            tempfile.mkdtemp(prefix="firehose_staged_"), "events"
        )
        stage_event_files(spark, sf_dir, events_dir, _N_FILES)
        _STAGED[sf_dir] = events_dir
    return file_event_stream(spark, events_dir)


def _run_to_memory(df: DataFrame, root: str, mode: str) -> DataFrame:
    """Start -> drain all staged files (availableNow) -> stop; return
    the memory sink's table (the scrapeable registry twin)."""
    name = "t" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    return spark.table(name)


@register("q_microbatch_flush", oracle=None)
def q_microbatch_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch boundary + flush hook (operator #9,
    AbstractFirehose.java:107-108,115-131): foreachBatch IS endOfSet()
    — one callback per poll batch, checkpoint commit after (≙
    commitAsync). Emits one row per epoch: (epoch_id, n_rows)."""
    root = _workdir()
    stream = _staged_events(spark, sf_dir, root)
    epochs: list[tuple[int, int]] = []

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        epochs.append((epoch_id, batch_df.count()))

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    schema = T.StructType(
        [
            T.StructField("epoch_id", T.LongType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(int(e), int(n)) for e, n in sorted(epochs)], schema
    )


@register("q_sink_push", oracle=None)
def q_sink_push(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Push sink (operator #10, PrometheusPusher.java:47-67): per-epoch
    the latest-value state delta is rendered to Prometheus text
    exposition format and handed to the pusher. Emits (epoch_id,
    n_series, payload_chars) per push."""
    root = _workdir()
    pushes: list[tuple[int, int, int]] = []

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        text = to_prometheus_text(batch_df)
        n_series = max(0, len(text.splitlines()) - 2)  # minus HELP/TYPE
        pushes.append((epoch_id, n_series, len(text)))

    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)
        agg = latest_value_stream(stream)
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(per_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    schema = T.StructType(
        [
            T.StructField("epoch_id", T.LongType()),
            T.StructField("n_series", T.LongType()),
            T.StructField("payload_chars", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(int(e), int(s), int(c)) for e, s, c in sorted(pushes)], schema
    )


@register("q_sink_pull", oracle=None)
def q_sink_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pull sink (operator #11, PrometheusPuller.java:50-65): the
    latest-value state lands in an in-memory queryable table — the
    scrape registry. Returns the final registry contents (one row per
    live series)."""
    root = _workdir()
    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)
        agg = latest_value_stream(stream)
        out = _run_to_memory(agg, root, "complete")
    return out.orderBy("user_id", "event_type")


@register("q_watermark", oracle=None)
def q_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation: produces the 60 s
    windows the reference consumes pre-computed (FirehoseMetric.java:
    26-46), with a 10-minute late-data bound; closed-window state is
    dropped once the watermark passes (bounded state at 100 TB)."""
    root = _workdir()
    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)
        win = windowed_counts_stream(stream)
        out = _run_to_memory(win, root, "update")
    # Per-epoch updates may repeat a window; keep the final value.
    return (
        out.groupBy("w_start", "event_type")
        .agg(F.max("n").alias("n"), F.max("sum_value").alias("sum_value"))
        .orderBy("w_start", "event_type")
    )


@register("q_dedup_stream", oracle=None)
def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state:
    dropDuplicatesWithinWatermark on (user_id, event_type) — keeps the
    first arrival per key within the watermark horizon, then DROPS the
    key's dedup state once the watermark passes (the only way streaming
    dedup survives 100 TB: state is bounded by the lateness window, not
    the key cardinality of all time)."""
    root = _workdir()
    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["user_id", "event_type"]
        )
        out = _run_to_memory(deduped, root, "append")
    return (
        out.groupBy("event_type")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("event_type")
    )


@register("q_stateful_ttl", oracle=None)
def q_stateful_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed state with idle-TTL eviction (operator #7, the Guava
    gauge cache, AbstractPrometheusFirehose.java:20-30):
    applyInPandasWithState + ProcessingTimeTimeout. A tiny TTL makes
    series idle across micro-batches expire mid-stream, emitting
    tombstones (the removal-listener twin). Returns the per-batch
    state rows; `evicted=true` rows are the expirations."""
    import time

    root = _workdir()
    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)
        state = ttl_latest_value(stream, ttl_ms=2000)
        name = "t" + uuid.uuid4().hex[:12]
        q = (
            state.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        # availableNow + ProcessingTimeTimeout would keep scheduling
        # timeout-drain batches; instead run continuous micro-batches
        # and stop once evictions appear (or a hard deadline passes).
        # The loop exits early on success, so the generous deadline
        # only costs time on a genuinely stuck run (ADVICE r2: 25 s
        # flaked on loaded boxes — 2 s TTL + timeout-drain batches can
        # take longer to surface).
        deadline = time.time() + int(
            os.environ.get("FIREHOSE_TTL_SMOKE_DEADLINE_S", "60")
        )
        while time.time() < deadline:
            n_evicted = (
                spark.table(name).filter(F.col("evicted")).limit(1).count()
            )
            if n_evicted > 0 and not q.status["isDataAvailable"]:
                break
            time.sleep(1)
        q.stop()
        q.awaitTermination()
        out = spark.table(name)
    return (
        out.groupBy("user_id", "event_type", "evicted")
        .agg(
            F.max("last_ts").alias("last_ts"),
            F.sum("n_events").alias("n_events_total"),
        )
        .orderBy("user_id", "event_type", "evicted")
    )


@register("q_stream_join", oracle=None)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks on BOTH sides — the
    streaming twin of the enrichment join when the dimension is itself
    a stream. Clicks join purchases by the same user within 1 hour
    after the click; the time-interval condition plus the two
    watermarks is what lets Spark DROP buffered rows once they can no
    longer match (bounded join state — the only way a stream-stream
    join survives unbounded input)."""
    root = _workdir()
    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)
        out = _stream_join_run(stream, root)
    return (
        out.groupBy("c_user")
        .agg(
            F.count("*").alias("n_attributed"),
            F.round(F.sum("p_value"), 6).alias("attributed_value"),
        )
        .orderBy("c_user")
    )


def _stream_join_run(stream: DataFrame, root: str) -> DataFrame:
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return _run_to_memory(joined, root, "append")


@register("q_window_session_stream", oracle=None)
def q_window_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows (the batch twin is oracle-checked as
    q_window_session): per-user sessions with a 30-minute gap, merged
    incrementally across micro-batches; the watermark finalizes and
    emits a session once no more events can extend it, then drops its
    state — session count stays bounded by the active window, not
    history."""
    root = _workdir()
    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)
        out = _session_stream_run(stream, root)
    return out.orderBy("user_id", "session_start")


def _session_stream_run(stream: DataFrame, root: str) -> DataFrame:
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.col("user_id"),
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n",
            "sum_value",
        )
    )
    return _run_to_memory(sessions, root, "append")


@register("q_stream_static_enrich", oracle=None)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join — the TRUE streaming twin of the
    reference's LookupMapper enrichment (LookupMapper.java:20-29 via
    AbstractPrometheusFirehose.java:48): each micro-batch of the event
    stream joins the static customer dimension; Spark re-plans the
    static side per batch, so a dim refresh is picked up between
    batches (the singleton-reload twin). Broadcast keeps the stream
    side shuffle-free — the same plan q_lookup_enrich pins for batch.
    Emits per-segment counts over the drained stream."""
    from ..catalog import load_table

    root = _workdir()
    stream = _staged_events(spark, sf_dir, root)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey"), F.col("c_mktsegment")
        )
    )
    enriched = (
        stream.join(dim, stream["user_id"] == dim["c_custkey"], "left")
        .withColumn("segment", F.coalesce("c_mktsegment", F.lit("UNKNOWN")))
        .groupBy("segment")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_memory(enriched, root, "complete")
    return out.orderBy("segment")


@register("q_sink_push_http", oracle=None)
def q_sink_push_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE push path end-to-end in one streaming run: staged
    events -> latest-value state -> per-epoch exposition render -> real
    HTTP POST (gateway_push_fn) against an in-process recording server
    — the full PrometheusPusher loop (AbstractFirehose.java:113-131 +
    PrometheusPusher.java:61-67) with no stand-ins. Emits one row per
    received push: (push_seq, n_lines, parseable)."""
    import http.server
    import threading

    from .sinks import gateway_push_fn, push_sink

    received: list[str] = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self) -> None:  # noqa: N802 (http.server API)
            n = int(self.headers.get("Content-Length", 0))
            received.append(self.rfile.read(n).decode("utf-8"))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *args: object) -> None:
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        root = _workdir()
        with _few_partitions(spark):
            stream = _staged_events(spark, sf_dir, root)
            agg = latest_value_stream(stream)
            host, port = server.server_address[:2]
            push = gateway_push_fn(f"{host}:{port}", "firehose-smoke")
            q = (
                agg.writeStream.outputMode("update")
                .foreachBatch(
                    lambda batch_df, epoch_id: push(
                        to_prometheus_text(batch_df), epoch_id
                    )
                )
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        server.shutdown()
        server.server_close()
    schema = T.StructType(
        [
            T.StructField("push_seq", T.LongType()),
            T.StructField("n_lines", T.LongType()),
            T.StructField("parseable", T.BooleanType()),
        ]
    )
    rows = []
    for i, body in enumerate(received):
        samples = [
            ln for ln in body.strip().splitlines() if not ln.startswith("#")
        ]
        ok = all(len(ln.rsplit(" ", 1)) == 2 for ln in samples)
        rows.append((i, len(body.splitlines()), ok))
    return spark.createDataFrame(rows, schema)


@register(
    "q_sink_foreachbatch",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_id
    FROM events
    GROUP BY event_type
    """,
)
def q_sink_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent foreachBatch parquet sink — the exactly-once custom
    sink pattern: each micro-batch writes to its own batch_id=N
    directory with mode('overwrite'), so a replayed batch (restart
    between write and commit) rewrites the SAME directory instead of
    duplicating rows. After the drain, the directory tree is read back
    and aggregated; the hash match against the ORIGINAL events table
    proves no batch was lost or double-counted across the whole
    stream->sink->rescan loop.

    Scale shape: per-batch writes are append-partition-granular (the
    Delta/Iceberg MERGE-free idempotency baseline); the re-scan prunes
    nothing here deliberately — it must see every batch exactly once."""
    root = _workdir()
    out = os.path.join(root, "sink")
    with _few_partitions(spark):
        stream = _staged_events(spark, sf_dir, root)

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"batch_id={batch_id}")
            )

        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    back = spark.read.option("basePath", out).parquet(out + "/batch_id=*")
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("event_id").alias("sum_id"),
    )
