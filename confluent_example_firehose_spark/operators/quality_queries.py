"""Corpus-quality heuristics beyond text_queries.py's per-document
scorers: repetition detection (the Gopher-style intra-document
repetition rules), document-length distribution profiling, and source/
domain-mix auditing — the remaining quality gates a pre-training
curation stack runs before mixing.

Reference parity note: the reference (a fixed-function Kafka->Prometheus
consumer, /root/reference/src/main/java/io/confluent/firehose/) has no
counterpart; these extend SURVEY.md §2.C's north-star operator list.

Queries are registered by import from registry.all_queries().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import words
