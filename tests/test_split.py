"""Split assignment + leakage audit: the properties that make a split
usable (stability under append, full partition, sane proportions) and
the leakage report's orientation contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from confluent_example_firehose_spark.operators.split_queries import (
    TRAIN_PCT,
    VAL_PCT,
    q_split_leakage,
    split_bucket,
    split_label,
)


def test_split_stable_under_append(spark):
    """Assignment is a pure function of doc_id: computing it over a
    subset and over a superset must agree row-for-row — the property
    rand()/row_number() splits lack (appending data re-deals them)."""
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s = {r["doc_id"]: r["l"] for r in
         small.select("doc_id", split_label("doc_id").alias("l")).collect()}
    b = {r["doc_id"]: r["l"] for r in
         big.select("doc_id", split_label("doc_id").alias("l")).collect()}
    assert all(b[k] == v for k, v in s.items())


def test_split_partitions_completely(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = df.select(split_bucket("doc_id").alias("b"),
                    split_label("doc_id").alias("l"))
    rows = out.collect()
    assert all(0 <= r["b"] < 100 for r in rows)
    counts = out.groupBy("l").count().collect()
    by = {r["l"]: r["count"] for r in counts}
    assert set(by) == {"train", "val", "test"}
    # md5 buckets are uniform: 90/5/5 within generous tolerance
    assert abs(by["train"] / 5000 - TRAIN_PCT / 100) < 0.03
    assert abs(by["val"] / 5000 - VAL_PCT / 100) < 0.02


def test_leakage_pairs_oriented_train_to_eval(spark, sf_dir):
    out = q_split_leakage(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0  # the corpus plants near-dups; some straddle
    labels = {r["train_id"]: "train" for r in rows}
    checked = (
        spark.createDataFrame(
            [(i,) for i in labels], "doc_id long"
        ).select("doc_id", split_label("doc_id").alias("l")).collect()
    )
    assert all(r["l"] == "train" for r in checked)
    assert all(r["eval_split"] in ("val", "test") for r in rows)
