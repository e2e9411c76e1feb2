"""PySpark-native analytics engine with the capabilities of
nerdynick/confluent-example-firehose, re-expressed Spark-first.

The reference (read-only at /root/reference/) is a Kafka -> Prometheus
metrics firehose: JSON decode, map-column manipulation, dictionary
enrichment, keyed latest-value state with TTL, micro-batch commit, and
push/pull sinks (see SURVEY.md). This package re-expresses those
capabilities as Catalyst-planned DataFrame pipelines and Structured
Streaming, then extends the operator surface to batch relational
queries and LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Layout:
  session.py    - SparkSession factory (UTC, AQE, Arrow)
  schema.py     - METRIC_SCHEMA + testdata table schemas
  catalog.py    - parquet table loaders / temp-view registration
  operators/    - batch operators (firehose surface + relational + north-star)
  sources/      - batch & streaming source wrappers (parquet/json/kafka/rate)
  functions/    - column-expression helpers (vector math, text, fingerprints)
  streaming/    - Structured Streaming pipeline, stateful TTL, sinks
  plans/        - plan inspection / explain helpers
"""

__version__ = "0.1.0"
