"""Dual sink models: push (foreachBatch) and pull (memory table).

Reference:
- push: whole registry POSTed to a PushGateway per batch
  (PrometheusPusher.java:47-67, endOfSet at :61-67)
- pull: passive HTTP scrape of the registry
  (PrometheusPuller.java:50-65; endOfSet no-op :75-78)

Spark twins:
- push: writeStream.foreachBatch(push_fn) — per-epoch callback with
  the materialized state delta; push_fn renders Prometheus text
  exposition format (a pure function here; the HTTP POST would wrap
  it). foreachBatch IS endOfSet(): called once per micro-batch with
  the epoch id (≙ offset batch), checkpoint commit after (≙
  commitAsync).
- pull: format('memory') — an in-driver queryable table that an HTTP
  exposer thread can scrape at any time; update output mode keeps it
  current per series.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def to_prometheus_text(df: DataFrame, namespace_col: str | None = None) -> str:
    """Render a latest-value state table in Prometheus text exposition
    format (gauge metadata mirrors AbstractPrometheusFirehose.java:53-63:
    namespace=component, help='Confluent Metric: '+name).

    Driver-side by design: the state table is bounded (it's the scrape
    payload), like the reference's in-memory registry."""
    rows = df.collect()
    key_cols = [
        c for c in df.columns if c not in ("last_value", "last_ts", "n_events")
    ]
    lines = []
    metric = "firehose_last_value"
    lines.append(f"# HELP {metric} Confluent Metric: last value per series")
    lines.append(f"# TYPE {metric} gauge")

    def esc(v: object) -> str:
        # exposition-format label escaping: one bad tag value must not
        # poison the whole scrape payload
        return (
            str(v)
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
        )

    for r in sorted(rows, key=lambda r: tuple(str(r[c]) for c in key_cols)):
        labels = ",".join(f'{c}="{esc(r[c])}"' for c in key_cols)
        lines.append(f"{metric}{{{labels}}} {r['last_value']}")
    return "\n".join(lines) + "\n"


def push_sink(
    agg: DataFrame,
    push_fn: Callable[[str, int], None],
    checkpoint: str,
    query_name: str = "push_sink",
) -> StreamingQuery:
    """foreachBatch push: per-epoch render + push (epoch id = the
    reference's offset batch boundary)."""

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        push_fn(to_prometheus_text(batch_df), epoch_id)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def pull_sink(agg: DataFrame, query_name: str = "metrics_state") -> StreamingQuery:
    """Memory-table pull: the scrapeable registry twin. Query
    `spark.table(query_name)` (or an HTTP exposer around it) at any
    time."""
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
