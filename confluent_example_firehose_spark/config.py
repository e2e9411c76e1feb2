"""Layered config resolution — operator #13 (SURVEY.md §2.A).

Reference behavior (PrometheusPusher.java:85-120, PrometheusPuller.java:
96-119, defaults Configs.java:8-40): a first-wins CompositeConfiguration
layered as

    -c inline map  >  -f file (by extension)  >  system properties
    >  CONFLUENT_*-mapped env  >  raw env  >  gateway defaults
    >  consumer defaults

with env mapping = strip the ``CONFLUENT_`` prefix, lowercase,
``_`` -> ``.`` (so ``CONFLUENT_CONSUMER_TOPIC`` -> ``consumer.topic``).
Python twin: a list of dicts searched in order; no Java system props
(the JVM layer is meaningless here — kept as an optional injection
point for parity).
"""

from __future__ import annotations

import configparser
import json
import os
from collections.abc import Mapping
from typing import Any

ENV_PREFIX = "CONFLUENT_"  # Configs.java:9

# Configs.java:28-37 — the reference's consumer defaults, expressed as
# the Spark Kafka-source options they map onto (SURVEY.md §1.6).
CONSUMER_DEFAULTS: dict[str, Any] = {
    "consumer.topic": "metrics.v1",
    "consumer.allow.auto.create.topics": False,
    "consumer.auto.offset.reset": "latest",
    "consumer.enable.auto.commit": False,
    "consumer.isolation.level": "read_committed",
    "consumer.max.poll.records": 1000,
    "consumer.request.timeout.ms": 20000,
    "consumer.session.timeout.ms": 6000,
    "consumer.fetch.min.bytes": 16000,
    "consumer.retry.backoff.ms": 500,
}
GATEWAY_DEFAULTS: dict[str, Any] = {}  # Configs.java:39 (empty)

CONFIG_PROM_GATEWAY = "prometheus.gateway"  # Configs.java:19
CONFIG_PROM_GATEWAY_JOB = "prometheus.job"  # Configs.java:20
CONFIG_PROM_LISTENER = "prometheus.listener"  # Configs.java:22
CONFIG_CONSUMER_TOPIC = "consumer.topic"  # Configs.java:16
CONFIG_CONSUMER_GROUP_ID = "consumer.group.id"  # Configs.java:17


def env_to_props(
    env: Mapping[str, str], prefix: str = ENV_PREFIX
) -> dict[str, str]:
    """CONFLUENT_FOO_BAR=x -> {'foo.bar': 'x'} (ConfigUtils.envToProp
    twin: strip prefix, lowercase, underscores to dots)."""
    out = {}
    for k, v in env.items():
        if k.startswith(prefix) and len(k) > len(prefix):
            out[k[len(prefix) :].lower().replace("_", ".")] = v
    return out


def parse_inline(spec: str) -> dict[str, str]:
    """'-c a=1,b=2' inline map (Guava MapSplitter twin: split on comma,
    trim, key=value)."""
    out = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad -c entry (want key=value): {part!r}")
        k, v = part.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def load_file(path: str) -> dict[str, Any]:
    """Extension-dispatched file loader (ConfigUtils.newFileConfig twin:
    yaml/json/ini/properties)."""
    ext = os.path.splitext(path)[1].lower()
    with open(path) as f:
        if ext == ".json":
            data = json.load(f)
            if not isinstance(data, dict):
                raise ValueError(f"{path}: top-level JSON must be an object")
            return _flatten(data)
        if ext in (".yaml", ".yml"):
            try:
                import yaml  # type: ignore
            except ImportError as e:  # gated: pyyaml may be absent
                raise RuntimeError(
                    f"{path}: yaml config needs pyyaml installed"
                ) from e
            return _flatten(yaml.safe_load(f) or {})
        if ext == ".ini":
            cp = configparser.ConfigParser()
            cp.read_string(f.read())
            return {
                f"{sec}.{k}": v
                for sec in cp.sections()
                for k, v in cp.items(sec)
            }
        if ext == ".properties":
            out: dict[str, Any] = {}
            for line in f:
                line = line.strip()
                if not line or line.startswith(("#", "!")):
                    continue
                if "=" in line:
                    k, v = line.split("=", 1)
                elif ":" in line:
                    k, v = line.split(":", 1)
                else:
                    continue
                out[k.strip()] = v.strip()
            return out
    raise ValueError(f"unsupported config extension: {path}")


def _flatten(d: Mapping[str, Any], prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


class LayeredConfig:
    """First-wins layered lookup (CompositeConfiguration twin)."""

    def __init__(self, layers: list[Mapping[str, Any]]):
        self.layers = layers

    def get(self, key: str, default: Any = None) -> Any:
        for layer in self.layers:
            if key in layer:
                return layer[key]
        return default

    def __contains__(self, key: str) -> bool:
        return any(key in layer for layer in self.layers)

    def as_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for layer in reversed(self.layers):
            out.update(layer)
        return out

    def subset(self, prefix: str) -> dict[str, Any]:
        """All keys under 'prefix.', prefix stripped — the consumer.*
        subset handed to the Kafka source builder."""
        p = prefix + "."
        return {
            k[len(p) :]: v for k, v in self.as_dict().items() if k.startswith(p)
        }


def assemble(
    inline: str | None = None,
    config_file: str | None = None,
    env: Mapping[str, str] | None = None,
    system_props: Mapping[str, Any] | None = None,
    overrides: Mapping[str, Any] | None = None,
    extra_defaults: Mapping[str, Any] | None = None,
) -> LayeredConfig:
    """The full Pusher/Puller precedence chain
    (PrometheusPusher.java:85-109). `overrides` is the TOP layer — the
    reference's explicit CLI flags (-g/-j/listener) are addProperty'd
    into the composite's in-memory config, which outranks every other
    layer (PrometheusPusher.java:111-120); `extra_defaults` is the
    gateway-defaults slot at the bottom."""
    env = dict(env if env is not None else os.environ)
    layers: list[Mapping[str, Any]] = []
    layers.append(dict(overrides or {}))
    if inline:
        layers.append(parse_inline(inline))
    if config_file:
        layers.append(load_file(config_file))
    layers.append(dict(system_props or {}))
    layers.append(env_to_props(env))
    layers.append(env)
    layers.append(dict(extra_defaults or {}))
    layers.append(dict(CONSUMER_DEFAULTS))
    return LayeredConfig(layers)
