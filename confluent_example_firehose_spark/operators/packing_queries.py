"""Sequence packing and training-batch assembly operators: the step
between chunking (curation_queries.q_chunk_documents) and the data
loader — greedy bin-packing of variable-length documents into fixed
token budgets, and deterministic epoch shuffling.

Reference parity note: no counterpart in /root/reference/ (fixed-function
Kafka->Prometheus consumer); extends SURVEY.md §2.C.

Queries are registered by import from registry.all_queries().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import words
