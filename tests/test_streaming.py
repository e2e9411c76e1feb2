"""Streaming layer smoke at sf0.001: micro-batch boundaries, the
latest-value registry, and the Prometheus text renderer."""

from __future__ import annotations

from confluent_example_firehose_spark.registry import query_fns
from confluent_example_firehose_spark.streaming.sinks import to_prometheus_text


def test_microbatch_flush_epochs(spark, sf_dir):
    out = query_fns()["q_microbatch_flush"](spark, sf_dir).collect()
    # 4 staged files with maxFilesPerTrigger=1 -> 4 micro-batches,
    # epoch ids contiguous from 0, every batch non-empty
    assert [r["epoch_id"] for r in out] == [0, 1, 2, 3]
    assert all(r["n_rows"] > 0 for r in out)


def test_pull_sink_registry_matches_batch(spark, sf_dir):
    from confluent_example_firehose_spark.catalog import load_table
    from pyspark.sql import functions as F

    out = query_fns()["q_sink_pull"](spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    batch = events.groupBy("user_id", "event_type").agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("last_value")
    )
    stream_rows = {
        (r["user_id"], r["event_type"]): r["last_value"] for r in out.collect()
    }
    batch_rows = {
        (r["user_id"], r["event_type"]): r["last_value"]
        for r in batch.collect()
    }
    # the streaming registry converges to exactly the batch answer
    assert stream_rows == batch_rows


def test_prometheus_text_format(spark):
    df = spark.createDataFrame(
        [(1, "click", 2.5), (0, "view", 1.0)],
        ["user_id", "event_type", "last_value"],
    )
    text = to_prometheus_text(df)
    lines = text.strip().splitlines()
    assert lines[0].startswith("# HELP") and lines[1].startswith("# TYPE")
    # sorted by key, label-formatted
    assert lines[2] == 'firehose_last_value{user_id="0",event_type="view"} 1.0'
    assert lines[3] == 'firehose_last_value{user_id="1",event_type="click"} 2.5'
