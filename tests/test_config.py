"""Config resolution parity tests (operator #13): precedence chain,
env mapping, file loaders — mirroring PrometheusPusher.java:85-120."""

from __future__ import annotations

import json

from confluent_example_firehose_spark import config as cfg


def test_env_mapping():
    out = cfg.env_to_props(
        {"CONFLUENT_CONSUMER_TOPIC": "t1", "PATH": "/bin", "CONFLUENT_": "x"}
    )
    assert out == {"consumer.topic": "t1"}


def test_precedence_inline_over_file_over_env(tmp_path):
    f = tmp_path / "conf.json"
    f.write_text(json.dumps({"consumer": {"topic": "from_file", "a": 1}}))
    conf = cfg.assemble(
        inline="consumer.topic=from_cli",
        config_file=str(f),
        env={"CONFLUENT_CONSUMER_TOPIC": "from_env", "CONFLUENT_ONLY_ENV": "e"},
    )
    assert conf.get("consumer.topic") == "from_cli"  # -c wins
    assert conf.get("consumer.a") == 1  # file beats env/defaults
    assert conf.get("only.env") == "e"  # env-mapped visible
    # untouched defaults shine through (Configs.java:33)
    assert conf.get("consumer.max.poll.records") == 1000


def test_inline_parser_trims_and_rejects():
    assert cfg.parse_inline(" a=1 , b = 2 ,") == {"a": "1", "b": "2"}
    try:
        cfg.parse_inline("nokey")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_properties_and_ini_loaders(tmp_path):
    p = tmp_path / "c.properties"
    p.write_text("# comment\nconsumer.topic=tp\nx.y: z\n")
    assert cfg.load_file(str(p)) == {"consumer.topic": "tp", "x.y": "z"}
    i = tmp_path / "c.ini"
    i.write_text("[consumer]\ntopic = ti\n")
    assert cfg.load_file(str(i)) == {"consumer.topic": "ti"}


def test_subset_strips_prefix():
    conf = cfg.assemble(env={})
    sub = conf.subset("consumer")
    assert sub["topic"] == "metrics.v1"
    assert sub["isolation.level"] == "read_committed"
    assert "consumer.topic" not in sub


def test_cli_parser_builds():
    from confluent_example_firehose_spark.cli import build_parser

    args = build_parser().parse_args(
        ["pusher", "-c", "a=1", "-g", "http://gw:9091", "-j", "job1"]
    )
    assert args.mode == "pusher" and args.gateway == "http://gw:9091"
    args = build_parser().parse_args(["puller", "--listener", "0.0.0.0:9400"])
    assert args.mode == "puller" and args.listener == "0.0.0.0:9400"


def test_overrides_layer_outranks_everything(tmp_path):
    import json as _json

    f = tmp_path / "c.json"
    f.write_text(_json.dumps({"prometheus": {"gateway": "http://file-gw"}}))
    conf = cfg.assemble(
        inline="prometheus.gateway=http://cli-map-gw",
        config_file=str(f),
        env={"CONFLUENT_PROMETHEUS_GATEWAY": "http://env-gw"},
        overrides={"prometheus.gateway": "http://flag-gw"},
    )
    # explicit flag (-g) wins over -c, -f, and env — the reference's
    # addProperty-into-in-memory-config precedence
    assert conf.get("prometheus.gateway") == "http://flag-gw"
