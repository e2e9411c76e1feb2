"""CLI entry points: the PrometheusPusher / PrometheusPuller twins.

Reference surface (PrometheusPusher.java:38-45, PrometheusPuller.java:
36-41): options -c <inline map>, -f <config file>, -g <gateway url>,
-j <job name> (pusher), plus prometheus.listener (puller); a JVM
shutdown hook calls close(). Spark twin: the same options assemble a
LayeredConfig, then a Structured Streaming query runs the firehose
pipeline with the chosen sink; Ctrl-C stops the query (checkpoint makes
restart exactly-once, the commitAsync twin).

Usage:
    python -m confluent_example_firehose_spark pusher \
        -c consumer.topic=metrics.v1 -g http://gateway:9091 -j firehose
    python -m confluent_example_firehose_spark puller \
        -f conf.json --listener 0.0.0.0:9400
    # no broker? file mode streams staged events parquet instead:
    python -m confluent_example_firehose_spark pusher \
        --file-source /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import sys
import tempfile

from . import config as cfg


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="confluent_example_firehose_spark")
    sub = p.add_subparsers(dest="mode", required=True)
    for mode in ("pusher", "puller"):
        sp = sub.add_parser(mode)
        sp.add_argument("-c", "--configs", help="inline key=value[,k=v...]")
        sp.add_argument("-f", "--file", dest="config_file", help="config file")
        sp.add_argument(
            "--file-source",
            help="stream staged events parquet from this sf dir "
            "(no-broker demo mode)",
        )
        sp.add_argument("--bootstrap", help="Kafka bootstrap servers")
        sp.add_argument(
            "--checkpoint",
            help="checkpoint dir (exactly-once restart; default: fresh "
            "temp dir = NO cross-restart guarantee, dev only)",
        )
        if mode == "pusher":
            sp.add_argument("-g", "--gateway", help="PushGateway address")
            sp.add_argument("-j", "--job", help="push job name")
        else:
            sp.add_argument("--listener", help="host:port scrape endpoint")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # Explicit flags are TOP precedence (the reference addProperty's
    # them into the composite's in-memory layer, which outranks file/
    # env/system: PrometheusPusher.java:111-120).
    overrides = {}
    if getattr(args, "gateway", None):
        overrides[cfg.CONFIG_PROM_GATEWAY] = args.gateway
    if getattr(args, "job", None):
        overrides[cfg.CONFIG_PROM_GATEWAY_JOB] = args.job
    if getattr(args, "listener", None):
        overrides[cfg.CONFIG_PROM_LISTENER] = args.listener
    conf = cfg.assemble(
        inline=args.configs,
        config_file=args.config_file,
        overrides=overrides,
    )
    # -j defaults the consumer group id ONLY if nothing else set it
    # (PrometheusPusher.java:119: getString with the job as fallback);
    # written into the live top layer (assemble copied `overrides`)
    if getattr(args, "job", None) and cfg.CONFIG_CONSUMER_GROUP_ID not in conf:
        conf.layers[0][cfg.CONFIG_CONSUMER_GROUP_ID] = args.job

    from .session import get_spark
    from .streaming.pipeline import (
        file_event_stream,
        kafka_metric_stream,
        latest_value_stream,
        metric_latest_value_stream,
        stage_event_files,
    )
    from .streaming.sinks import (
        ScrapeServer,
        gateway_push_fn,
        pull_sink,
        push_sink,
        to_prometheus_text,
    )

    spark = get_spark(f"firehose-{args.mode}")
    if args.file_source:
        root = tempfile.mkdtemp(prefix="firehose_cli_")
        stage_event_files(spark, args.file_source, root)
        stream = file_event_stream(spark, root)
    else:
        bootstrap = args.bootstrap or conf.get("consumer.bootstrap.servers")
        if not bootstrap:
            print(
                "no --bootstrap/consumer.bootstrap.servers and no "
                "--file-source; nothing to consume",
                file=sys.stderr,
            )
            return 1
        # consumer.* keys Spark's source manages itself get TRANSLATED
        # to their Spark equivalents, not silently dropped:
        source_opts = {
            "subscribe": str(conf.get(cfg.CONFIG_CONSUMER_TOPIC)),
            "startingOffsets": {
                "earliest": "earliest", "latest": "latest"
            }.get(str(conf.get("consumer.auto.offset.reset", "latest"))),
            "maxOffsetsPerTrigger": str(
                conf.get("consumer.max.poll.records", 1000)
            ),
        }
        passthrough = {
            f"kafka.{k}": str(v)
            for k, v in conf.subset("consumer").items()
            if k
            not in (
                "topic",
                "bootstrap.servers",
                "max.poll.records",
                "enable.auto.commit",  # checkpoint replaces commits
                "auto.offset.reset",
                "allow.auto.create.topics",
            )
        }
        stream = kafka_metric_stream(
            spark, bootstrap, **source_opts, **passthrough
        )

    # Kafka carries METRIC_SCHEMA rows -> gauge-registry keying (name +
    # sorted filtered labels); the file twin carries event rows.
    agg = (
        latest_value_stream(stream)
        if args.file_source
        else metric_latest_value_stream(stream)
    )
    # A configured checkpoint is what makes restart exactly-once (the
    # commitAsync twin); the temp-dir default is dev-mode only and
    # cannot survive a process restart.
    ckpt = (
        args.checkpoint
        or conf.get("checkpoint.location")
        or tempfile.mkdtemp(prefix="firehose_ckpt_")
    )
    if args.mode == "pusher":
        gateway = conf.get(cfg.CONFIG_PROM_GATEWAY)
        if gateway:
            # real PushGateway POST per epoch (pushAdd twin,
            # PrometheusPusher.java:61-67)
            job = str(conf.get(cfg.CONFIG_PROM_GATEWAY_JOB, "firehose"))
            push_fn = gateway_push_fn(str(gateway), job)
        else:

            def push_fn(text: str, epoch_id: int) -> None:
                # no gateway configured: render to stdout (dev mode)
                print(f"--- push epoch {epoch_id} ---\n{text}", flush=True)

        q = push_sink(agg, push_fn, ckpt)
        server = None
    else:
        # Bind the scrape endpoint BEFORE starting the streaming query:
        # a busy port must fail cleanly with nothing to tear down, not
        # leave a running query behind an unhandled OSError (ADVICE r2;
        # same order as the reference — PrometheusPuller binds the
        # HTTPServer first, then starts the consumer, :53-64, and a
        # fatal bind error exits with help, :58-62).
        listener = str(conf.get(cfg.CONFIG_PROM_LISTENER, "0.0.0.0:9400"))
        host, _, port = listener.rpartition(":")
        try:
            server = ScrapeServer(
                lambda: to_prometheus_text(spark.table("metrics_state")),
                host=host or "0.0.0.0",
                port=int(port),
            )
        except OSError as e:
            print(
                f"cannot bind scrape endpoint {listener}: {e}",
                file=sys.stderr,
            )
            return 1
        q = pull_sink(agg)
        print(
            "registry queryable as spark.table('metrics_state'); "
            f"scrape endpoint http://{server.host}:{server.port}/metrics",
            flush=True,
        )
    try:
        q.awaitTermination()
    except KeyboardInterrupt:  # the shutdown-hook twin
        q.stop()
    finally:
        if server is not None:
            server.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
