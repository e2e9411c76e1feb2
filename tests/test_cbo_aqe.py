"""Optimizer-infrastructure pins: ANALYZE statistics feeding CBO, and
AQE's runtime shuffle coalescing — the two mechanisms the engine
relies on (rather than hand-scheduling) for 100 TB plans."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from confluent_example_firehose_spark.catalog import load_table


def test_analyze_stats_feed_cbo(spark, sf_dir):
    db = "cbo_" + uuid.uuid4().hex[:8]
    spark.sql(f"CREATE DATABASE {db}")
    try:
        load_table(spark, sf_dir, "customer").write.saveAsTable(
            f"{db}.customer"
        )
        spark.sql(
            f"ANALYZE TABLE {db}.customer COMPUTE STATISTICS "
            "FOR COLUMNS c_custkey, c_nationkey"
        )
        # table-level stats recorded by ANALYZE
        det = spark.sql(f"DESCRIBE EXTENDED {db}.customer").collect()
        stats = {r["col_name"]: r["data_type"] for r in det}
        assert "Statistics" in stats and "rows" in stats["Statistics"]
        # column-level stats visible (distinct counts for join estimation)
        cdet = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                f"DESCRIBE EXTENDED {db}.customer c_custkey"
            ).collect()
        }
        assert cdet.get("distinct_count") not in (None, "NULL")
        # CBO consumes them: the optimized plan's stats carry the
        # analyzed row count instead of a size-based guess
        prev = spark.conf.get("spark.sql.cbo.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            df = spark.table(f"{db}.customer").filter(
                F.col("c_nationkey") >= 0
            )
            stats_str = df._jdf.queryExecution().optimizedPlan().stats().toString()
            assert "rowCount" in stats_str
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_aqe_coalesces_small_shuffle(spark, sf_dir):
    # 32 shuffle partitions on a 25-nation aggregate: AQE must coalesce
    # the post-shuffle partition count well below the static setting
    n = load_table(spark, sf_dir, "nation")
    agg = n.groupBy("n_regionkey").agg(F.count("*").alias("c"))
    agg.collect()  # materialize so AQE finalizes the plan
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan
    assert agg.rdd.getNumPartitions() < int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
