"""Relational breadth queries (SURVEY.md §2.B): everything the task
brief demands that the reference lacks, supplied by Spark built-ins.

Every query here is pure `pyspark.sql.functions` — whole plan inside
whole-stage codegen, no Python in the hot path (except q_pandas_udf,
which exists to demonstrate the Arrow-vectorized slow path).

Scale notes are per-query docstrings; the common themes:
- dims broadcast, facts never shuffle for enrichment joins
- aggregations rely on partial+final hash agg (map-side combine)
- every ranking has a total order (unique key tiebreak) so top-k is
  deterministic under any partitioning
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .relational import davg, davg_sql, dsum, dsum_sql


@register(
    "q_scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with column pruning: ReadSchema carries only the 4
    projected columns — at 100 TB this is the difference between
    reading ~25% of the table bytes and all of them."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown: both range predicates reach the parquet scan
    as PushedFilters (row-group stats skip non-qualifying chunks)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.03, 0.07))
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        "l_returnflag",
    )


@register(
    "q_agg_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash aggregation; 4 groups means
    the shuffle moves n_map_tasks*4 rows regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle=f"""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust,
           count(*) AS n_orders,
           max(o_totalprice) AS max_price,
           {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Catalyst plans count(distinct) as a
    two-phase expand+agg; at scale prefer approx_count_distinct
    (q_agg_approx) when exactness isn't required."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
        F.max("o_totalprice").alias("max_price"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag, TRUE AS parts_within_5pct,
           TRUE AS orders_within_5pct, count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct: constant memory per group vs the
    expand shuffle of exact distinct — the 100 TB default.

    Oracle-checked via a tolerance ASSERTION: the query emits whether
    the HLL++ estimate (rsd=0.02) lands within 5% of the exact count
    it computes alongside; the oracle claims TRUE per group. A sketch's
    exact value is engine-defined, but its error bound is a testable
    contract."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
        F.countDistinct("l_partkey").alias("xp"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.countDistinct("l_orderkey").alias("xo"),
        F.count("*").alias("n_rows"),
    )
    within = lambda a, x: (  # noqa: E731
        F.abs(F.col(a) - F.col(x)) <= 0.05 * F.col(x)
    )
    return agg.select(
        "l_returnflag",
        within("ap", "xp").alias("parts_within_5pct"),
        within("ao", "xo").alias("orders_within_5pct"),
        "n_rows",
    )


@register(
    "q_rollup_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (superset of ROLLUP): planned as Expand +
    single hash agg — one pass over the fact, not 4 scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    )


@register(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, rn, rnk
    FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn,
               rank() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC) AS rnk
        FROM customer
    )
    WHERE rn <= 5
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows; row_number carries a unique-key tiebreak so
    top-5-per-nation is deterministic under any partitioning."""
    c = load_table(spark, sf_dir, "customer")
    w_rn = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_rk = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).alias("rnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "q_window_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS VARCHAR) AS DOUBLE) AS running_total,
           lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_price
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum (decimal-exact for cross-engine
    determinism) + lag over the same frame-ordering."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject
    — per-partition heaps of k rows, no full sort, no full shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q_join_inner",
    oracle=f"""
    SELECT o.o_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer (filtered, small) broadcasts; the
    orders<->lineitem join shuffles on the shared key once; the
    o_orderdate filter prunes before the join.

    Since r13 (optimization round, guide §3.1 "pick the strategy
    deliberately"): the fact join carries an explicit merge hint.
    Under the 64 MB auto-broadcast threshold the planner used to
    broadcast LINEITEM — the 600k-row fact side — which serialized the
    whole query behind a driver-built 25 MB hash relation and ran the
    join + partial agg in the single scan task of the other side
    (plans/r13/q_join_inner_before.txt). The hint restores the
    scale-true shape: both facts exchange on the join key once, the
    join and the aggregation run at full parallelism, and the groupBy
    on (o_orderkey, ...) REUSES the join's orderkey partitioning (one
    Exchange disappears: 2 -> 1 data exchanges). AQE converts the
    sort-merge to a shuffled-hash join per partition when the local
    map fits (session.py sets adaptive.maxShuffledHashJoinLocalMapThreshold),
    so the local-mode cost matches the hinted SHJ plan while the safe
    SMJ remains the fallback at scale. Measured (interleaved min-of-6
    at sf0.1): 1.15 s -> 0.81 s."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(oc.hint("merge"), li.l_orderkey == oc.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q_join_outer",
    oracle=f"""
    SELECT n.n_name,
           count(c.c_custkey) AS n_cust,
           {dsum_sql('coalesce(c.c_acctbal, 0)')} AS sum_acctbal
    FROM nation n
    LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched dimension rows."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_cust"),
            dsum(F.coalesce(F.col("c_acctbal"), F.lit(0.0))).alias("sum_acctbal"),
        )
    )


@register(
    "q_join_semi_anti",
    oracle="""
    SELECT c_mktsegment, 'with_orders' AS tag, count(*) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, 'without_orders' AS tag, count(*) AS n
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) + left_anti (NOT EXISTS): no payload columns
    from the right side ever shuffle — semi-join reduction is the
    cheap existence test at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .withColumn("tag", F.lit("with_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .withColumn("tag", F.lit("without_orders"))
    )
    return semi.unionByName(anti).select("c_mktsegment", "tag", "n")


@register(
    "q_join_range",
    oracle=f"""
    SELECT s.s_suppkey,
           count(p.p_partkey) AS n_parts,
           {dsum_sql('coalesce(p.p_retailprice, 0)')} AS sum_price
    FROM supplier s
    LEFT JOIN part p
      ON p.p_retailprice BETWEEN s.s_acctbal - 100 AND s.s_acctbal + 100
    GROUP BY s.s_suppkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: no equi keys, so Spark plans a broadcast
    nested-loop with the small side broadcast. At scale, bucketize the
    range key into bands and equi-join on band (see asof.py)."""
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    cond = F.col("p_retailprice").between(
        F.col("s_acctbal") - 100, F.col("s_acctbal") + 100
    )
    return (
        s.join(F.broadcast(p), cond, "left")
        .groupBy("s_suppkey")
        .agg(
            F.count("p_partkey").alias("n_parts"),
            dsum(F.coalesce(F.col("p_retailprice"), F.lit(0.0))).alias("sum_price"),
        )
    )


@register(
    "q_set_ops",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         finished AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                      WHERE o_orderstatus = 'F')
    SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM building INTERSECT SELECT * FROM finished)
    UNION ALL
    SELECT c_custkey, 'building_only' AS tag FROM (SELECT * FROM building EXCEPT SELECT * FROM finished)
    UNION ALL
    SELECT c_custkey, 'finished_only' AS tag FROM (SELECT * FROM finished EXCEPT SELECT * FROM building)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL; Catalyst rewrites the set ops to
    semi/anti joins under the hood."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    finished = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(finished).withColumn("tag", F.lit("both"))
    b_only = building.exceptAll(finished).distinct().withColumn(
        "tag", F.lit("building_only")
    )
    f_only = finished.exceptAll(building).distinct().withColumn(
        "tag", F.lit("finished_only")
    )
    return both.unionByName(b_only).unionByName(f_only)


@register(
    "q_scalar_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 10) AS name10,
           concat(p_brand, '-', p_type) AS brand_type,
           length(p_name) AS name_len,
           round(p_retailprice * 1.1, 2) AS bumped,
           abs(p_size - 25) AS size_dist,
           round(ln(p_retailprice), 6) AS ln_price,
           round(sqrt(p_retailprice), 6) AS sqrt_price
    FROM part
    """,
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar functions — all codegen'd JVM expressions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("bumped"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("ln_price"),
        F.round(F.sqrt(F.col("p_retailprice")), 6).alias("sqrt_price"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mth,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions (epoch math stays in the JVM)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias(
            "days_since"
        ),
    )


@register(
    "q_array_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split -> explode -> count: generator + partial agg; the explode
    multiplies rows before the shuffle but the map-side combine
    collapses them back to distinct words per task."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / typed JSON extraction."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        (F.get_json_object("props", "$.k").cast("int") * 2).alias("k_doubled"),
    )


@register(
    "q_window_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '60 seconds', ts) AS w_start,
           event_type,
           count(*) AS n,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 60 s windows — the batch twin of the window struct the
    reference's producer pre-computes (FirehoseMetric.java:26-46,
    interval=60). Streaming twin in streaming_queries.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "60 seconds").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"), "event_type", "n", "sum_value"
        )
    )


@register(
    "q_pandas_udf",
    oracle="""
    SELECT event_id, round(sqrt(value) + 1, 6) AS score
    FROM events
    WHERE value >= 0
    """,
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF — the sanctioned slow path. Batches
    cross to Python via Arrow (zero-copy columnar), ~10-100x faster
    than row-at-a-time UDFs. Kept deliberately trivial so the oracle
    can check it exactly (IEEE sqrt is deterministic)."""
    import numpy as np

    @F.pandas_udf("double")
    def sqrt_plus_one(v: pd.Series) -> pd.Series:
        return np.sqrt(v) + 1.0

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 0)
    return ev.select(
        "event_id", F.round(sqrt_plus_one("value"), 6).alias("score")
    )


@register(
    "q_agg_quantiles",
    oracle="""
    SELECT l_returnflag, TRUE AS p50_within_1pct, TRUE AS p95_within_1pct,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch): like
    q_agg_approx, oracle-checked on the ERROR CONTRACT — the approx
    p50/p95 must land within 1% of the exact percentile computed
    alongside. The sketch is the 100 TB default: bounded memory per
    group vs a full sort for exact percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("xp50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("ap95"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("xp95"),
        F.count("*").alias("n_rows"),
    )
    within = lambda a, x: (  # noqa: E731
        F.abs(F.col(a) - F.col(x)) <= 0.01 * F.abs(F.col(x))
    )
    return agg.select(
        "l_returnflag",
        within("ap50", "xp50").alias("p50_within_1pct"),
        within("ap95", "xp95").alias("p95_within_1pct"),
        "n_rows",
    )


@register(
    "q_join_salted",
    oracle=f"""
    SELECT s_nationkey,
           count(*) AS n_items,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem, supplier
    WHERE l_suppkey = s_suppkey
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-beating salted equi-join as a declared query (the
    pathological-skew path: one hot key = 30% of 100 TB, where even
    AQE's skew split leaves a partition too big for one executor).
    The fact side's rows spread over 8 salt sub-keys; the dimension
    replicates 8x; the join key becomes (l_suppkey, salt) so no single
    reducer owns a hot supplier. The aggregate is salt-invariant —
    results are IDENTICAL to the plain join (the oracle is the plain
    join), only the shuffle layout changes."""
    from .relational import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    joined = salted_join(li, s.select("l_suppkey", "s_nationkey"), "l_suppkey")
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS "F",
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS "O",
           {dsum_sql("CASE WHEN l_linestatus = 'N' THEN l_quantity END")} AS "N"
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): quantity by return flag x line status.
    Explicit pivot values pin the output schema (no extra distinct-scan
    job to discover them — at 100 TB that discovery pass is a full
    shuffle you should never pay for a known domain). Catalyst compiles
    pivot to conditional aggregation — exactly the oracle's CASE WHEN
    formulation, one partial+final agg pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O", "N"])
        .agg(dsum("l_quantity"))
        .orderBy("l_returnflag")
    )


# Skew guard for q_dedup_fuzzy: blocks bigger than this are dropped from
# pair generation (same idea as dedup.bucket_pairs' max_bucket). A block
# this hot is a useless blocking key anyway — it approaches all-pairs —
# and one degenerate token must not go O(block^2) on a 100 TB catalog.
# Encoded identically in the oracle so semantics match at every scale
# (test-SF max block size is 8; the guard is latent there).
FUZZY_MAX_BLOCK = 256


@register(
    "q_dedup_fuzzy",
    oracle=f"""
    WITH names AS (
        SELECT DISTINCT p_name,
               string_split(p_name, ' ')[-1] AS block
        FROM part
    ),
    ok_blocks AS (
        SELECT block FROM names
        GROUP BY block HAVING count(*) <= {FUZZY_MAX_BLOCK}
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a, names b
    WHERE a.block = b.block
      AND a.block IN (SELECT block FROM ok_blocks)
      AND a.p_name < b.p_name
      AND levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
)
def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) dedup with blocking — the catalog/entity
    flavor of near-dup: distinct names, EQUI-join on a blocking key
    (last token), Levenshtein verify within the block. The blocking
    join is the scale shape (same candidate/verify split as MinHash
    LSH: candidates via one equi-shuffle, O(block^2) only within
    blocks, never O(n^2) globally). A per-block size cap
    (FUZZY_MAX_BLOCK) drops degenerate hot blocks so one shared token
    can't create a quadratic straggler. Levenshtein is the textbook
    DP — identical in Spark and DuckDB."""
    p = fuzzy_block_names(
        load_table(spark, sf_dir, "part").select("p_name")
    )
    a = p.select(F.col("p_name").alias("name_a"), "block")
    b = p.select(F.col("p_name").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= 3)
        .orderBy("name_a", "name_b")
    )


def fuzzy_block_names(
    names: DataFrame, max_block: int = FUZZY_MAX_BLOCK
) -> DataFrame:
    """Distinct names with their blocking key, hot blocks (> max_block
    members) removed. The block-size count is a window over the same
    partitioning the pair join shuffles on, so the guard adds no extra
    shuffle — the count and the self-join share one hash exchange."""
    from pyspark.sql.window import Window

    blocked = names.distinct().withColumn(
        "block", F.element_at(F.split("p_name", " "), -1)
    )
    n_in_block = F.count("*").over(Window.partitionBy("block"))
    return (
        blocked.withColumn("_bn", n_in_block)
        .filter(F.col("_bn") <= max_block)
        .drop("_bn")
    )
