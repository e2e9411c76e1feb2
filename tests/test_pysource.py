"""Custom Python DataSource queries: exactly-once delivery totals for
the streaming generator, partition-parallel fidelity for the batch
generator (the DuckDB hash oracle covers the batch values; these pin
the protocol behavior)."""

from __future__ import annotations

from confluent_example_firehose_spark.sources.pysource import (
    GEN_N,
    GEN_PARTS,
    STREAM_BATCH,
    STREAM_N,
    q_pysource_metrics,
    q_pysource_stream,
)


def test_batch_source_partitioned_and_complete(spark, sf_dir):
    df = q_pysource_metrics(spark, sf_dir)
    rows = df.collect()
    assert sum(r["n"] for r in rows) == GEN_N
    # contiguous index space, no partition lost or duplicated
    assert min(r["min_id"] for r in rows) == 0
    assert max(r["max_id"] for r in rows) == GEN_N - 1
    # the raw source frame must expose the planned parallelism
    raw = spark.read.format("firehose_gen").load()
    assert raw.rdd.getNumPartitions() == GEN_PARTS


def test_stream_source_exactly_once(spark, sf_dir):
    rows = q_pysource_stream(spark, sf_dir).collect()
    # every generated record delivered exactly once across micro-batches
    assert sum(r["n"] for r in rows) == STREAM_N
    assert STREAM_N % STREAM_BATCH == 0  # clean 5-batch progression
    # per-type counts are exact quarters (i % 4 round-robin)
    assert {r["n"] for r in rows} == {STREAM_N // 4}
    # cents checksum: replay the formula in plain Python
    want = sum((i * 2654435761) % 100000 for i in range(STREAM_N))
    assert sum(r["cents_sum"] for r in rows) == want
