"""TPC-H classic query shapes over the trimmed testdata schema.

All 22 classic shapes are covered: Q1/Q3/Q5/Q6/Q10/Q14/Q18 true to
spec, plus Q4/Q7/Q8/Q13/Q15/Q17/Q21/Q22 (predicates adapted where the
testdata lacks a column — each docstring says exactly what moved).
Q2/Q9/Q11/Q16/Q20 originally need partsupp, which the testdata does
not ship; they are adapted over the distinct (l_partkey, l_suppkey)
pairs of lineitem as the part-supplier relation, keeping each query's
defining structure (min-cost-per-group window, grouped profit, scalar
-subquery threshold, distinct-count rollup, semi-join-on-aggregate).
The reference has no SQL surface at all (SURVEY.md §2.B); these
demonstrate the engine's relational completeness — every join flavor
(inner/outer/semi/anti, broadcast/shuffle), correlated EXISTS/NOT
EXISTS, scalar subqueries, double aggregation — on the driver's
TPC-H-ish tables.

Scale notes:
- nation/region are tiny -> always broadcast.
- customer/orders/lineitem are fact-sized at 100 TB -> equi-joins on
  their keys shuffle both sides once; AQE picks SMJ/SHJ and splits
  skewed keys. No collect, no driver loops.
- every LIMIT has a total order (unique tiebreak) so results are
  deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register
from .relational import davg, davg_sql, dsum, dsum_sql

_CUTOFF = "1998-06-01"


@register(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '{_CUTOFF}'
      AND l_shipdate > TIMESTAMP '{_CUTOFF}'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: segment-filtered customer ⋈ orders ⋈ lineitem,
    top-10 revenue. The customer filter (1/5 selectivity) is pushed to
    the scan; order-side date predicate prunes before the fact join.

    Since r13 (optimization round, guide §3.1): customer broadcasts
    into orders first (dimension-sized), and the fact⋈fact join
    carries an explicit merge hint — the auto-broadcast threshold used
    to pick the shipdate-filtered LINEITEM (~300k rows) as the
    broadcast side, serializing the query behind a driver-built hash
    relation and a single-task probe (plans/r13/q_tpch_q3_before.txt).
    With the hint both facts exchange once on orderkey, the groupBy on
    (l_orderkey, ...) reuses that partitioning (no agg exchange), and
    AQE's local SMJ->SHJ rewrite keeps hash-join speed in local mode."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _CUTOFF
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _CUTOFF
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    oc = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(oc.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: the 6-way join. region⋈nation collapses
    to a broadcast filter on nationkey before touching any fact; the
    three fact joins shuffle on their natural keys. The same-nation
    constraint (c_nationkey = s_nationkey) rides the join condition —
    no post-filter over a wider intermediate."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    asian_nations = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name"
        )
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(asian_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q_tpch_q6",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: pure scan-filter-aggregate. All
    three predicates reach the parquet scan as PushedFilters; the agg
    is a single global partial+final pair (one row per map task moves
    over the wire)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_tpch_q14",
    oracle=f"""
    SELECT 100.0 * {dsum_sql("CASE WHEN p_type LIKE 'PROMO%' "
                             "THEN l_extendedprice * (1 - l_discount) "
                             "ELSE 0 END")}
           / {dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: date-pruned lineitem ⋈ part with a conditional
    aggregate. part broadcasts (dimension); the one-month shipdate
    filter cuts the fact scan ~97% before the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue")
        )
    )


@register(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: top-20 customers by lost revenue.
    nation broadcasts; the returnflag filter reaches the lineitem scan
    (dictionary-encoded column -> row groups skip)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 180
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: the HAVING subquery becomes an aggregate
    + LEFT SEMI join that prunes the fact before the wide joins — the
    filter-early shape that matters at 100 TB (the big-orders set is
    tiny; everything downstream sees only qualifying orders)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape). The testdata schema has
    no l_commitdate/l_receiptdate, so the EXISTS predicate is adapted to
    l_returnflag = 'R'; the operator shape — correlated EXISTS becoming a
    LEFT SEMI join that deduplicates the probe side before the count —
    is Q4's. The quarter filter prunes orders at the scan; the semi join
    shuffles each side once on orderkey and never widens rows."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {dsum_sql('volume')} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer,
             nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7): bilateral trade between two nations
    by year. Both nation dims broadcast onto supplier/customer BEFORE
    the fact joins, so lineitem rows from irrelevant nations never reach
    a shuffle (2/25 selectivity each side); the disjunctive pair
    predicate then only filters the 2x2 nation combinations left."""
    n = load_table(spark, sf_dir, "nation")
    pair = n.filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(pair.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(pair.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(volume).alias("revenue"))
    )


@register(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           {dsum_sql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
           / {dsum_sql('volume')} AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8): NATION_3's share of ECONOMY-part
    revenue among ASIA customers, by order year. The 8-way join keeps
    every dimension (part/supplier/nation/region) broadcast; only
    lineitem⋈orders and ⋈customer shuffle. The share is a conditional
    aggregate over one pass — no self-join, no second scan."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    asia_nations = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select("n_nationkey")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(asia_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("nation") == "NATION_3", volume).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((dsum(national) / dsum(volume)).alias("mkt_share"))
    )


@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13; the o_comment NOT
    LIKE filter is adapted to o_orderpriority since testdata carries no
    comment column). The join-predicate filter must live INSIDE the
    outer join condition — pushing it below would drop zero-order
    customers. Double aggregation: the first shuffles on custkey, the
    second is tiny (distinct counts), so AQE coalesces it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15). The CREATE VIEW + scalar-max self-
    reference becomes: aggregate revenue per supplier, reduce that to a
    1-row global max, broadcast-join the max back onto the aggregate on
    equality (ties kept). Unlike a Window.partitionBy() global max —
    which funnels every per-supplier row through ONE task — this stays
    fully parallel, and Spark's exchange reuse (ReusedExchange) dedupes
    the identical revenue subtree so lineitem is still scanned once.
    Revenue equality is safe across engines because both sides sum in
    exact decimal."""
    # The explicit isnotnull makes the revenue subtree IDENTICAL under
    # both the max branch and the join branch (the join would infer it
    # on one side only), so ReuseExchange dedupes the shuffle and
    # lineitem is scanned once. No-op semantically: l_suppkey is a
    # non-null key.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
        & F.col("l_suppkey").isNotNull()
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    best = revenue.join(
        F.broadcast(max_rev),
        F.col("total_revenue") == F.col("max_revenue"),
    ).select("supplier_no", "total_revenue")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(
            F.broadcast(best),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q17",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND p_size BETWEEN 1 AND 15
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17; p_container is not in
    the testdata schema, so the part filter is brand + size range). The
    correlated scalar subquery (per-part average quantity) becomes a
    window average partitioned by l_partkey AFTER the broadcast part
    filter — one scan of lineitem, no self-join. Quantities are
    integral, so the 0.2*avg threshold is exact in double and the row
    set matches the oracle bit-for-bit."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15))
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_part = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("avg_qty", F.avg("l_quantity").over(per_part))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_5'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape; the
    commit/receipt-date lateness predicate is adapted to l_returnflag =
    'R' — sole returner on a multi-supplier finished order). Exercises
    correlated EXISTS and NOT EXISTS with an inequality correlation:
    LEFT SEMI + LEFT ANTI joins on orderkey with the suppkey<>suppkey
    residual riding the join condition. All three lineitem roles prune
    before joining; supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        l1.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q_tpch_q22",
    oracle=f"""
    SELECT cntry, count(*) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM (
        SELECT c_nationkey AS cntry, c_acctbal, c_custkey
        FROM customer
        WHERE c_acctbal > (SELECT {davg_sql('c_acctbal')}
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
    ) rich_idle
    GROUP BY cntry
    ORDER BY cntry
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape; the phone-prefix
    country code is adapted to c_nationkey — no phone column in
    testdata). Scalar uncorrelated subquery (average positive balance,
    computed in exact decimal so the threshold is engine-stable) crossed
    onto customer as a broadcast, then a LEFT ANTI join against recent
    orders finds dormant customers (every testdata customer has SOME
    order, so "never ordered" is adapted to "no order since 1999")."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("ab")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l_linestatus AS shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY shipmode
    ORDER BY shipmode
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping modes and order priority (TPC-H Q12 shape; testdata has
    no l_shipmode/l_commitdate/l_receiptdate, so the mode group is
    l_linestatus and "late" is l_shipdate >= o_orderdate + 60 days).
    One orders⋈lineitem shuffle join, conditional counts in a single
    partial+final agg pass — no second scan for the two priority
    classes.

    Driver-red in r3 (hash only): DuckDB's un-cast CASE sums return
    HUGEINT (pandas float64) vs Spark's BIGINT — fixed r4 with explicit
    CAST AS BIGINT in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


@register(
    "q_tpch_q19",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
            AND l_quantity >= 1 AND l_quantity <= 20)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
            AND l_quantity >= 10 AND l_quantity <= 30)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
            AND l_quantity >= 20 AND l_quantity <= 50))
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape; p_container/l_shipmode/
    l_shipinstruct absent from testdata, so the three disjunctive
    branches pair p_brand+p_size with l_quantity ranges). The classic
    OR-of-ANDs join predicate: part stays broadcast, the disjunction
    evaluates post-join while each side's common constraints
    (p_brand IN ..., l_quantity range) are inferred and pushed to the
    scans by Catalyst's constraint propagation."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    br = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(br)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q_tpch_q20",
    oracle="""
    SELECT s_name, s_nationkey AS s_addr
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 300.0
    )
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape; partsupp and its
    availqty threshold are absent from testdata, so the inner block
    becomes "suppliers who shipped > 300 units of matching parts in
    1996" — same nested semi-join-on-aggregate structure). Inner: part
    name prefix broadcast-joined to the date-pruned lineitem, grouped
    per supplier with a HAVING on the quantity sum; outer: LEFT SEMI
    join supplier against the qualifying key set — supplier rows never
    expand, no distinct needed."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    qualifying = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300.0)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", F.col("s_nationkey").alias("s_addr"))
        .orderBy("s_name")
    )


@register(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
               AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report — TPC-H Q1 true to spec (the 90-day
    cutoff fixed at 1998-09-01). One scan, partial+final hash agg on a
    6-value group key; every aggregate is a decimal-exact sum cast to
    double so the result is bit-identical across engines. The canonical
    100 TB map-side-combine query: state is 6 rows regardless of input."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-01"
    )
    price, disc, tax, qty = (
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_quantity"),
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty).alias("sum_qty"),
            dsum(price).alias("sum_base_price"),
            dsum(price * (1 - disc)).alias("sum_disc_price"),
            dsum(price * (1 - disc) * (1 + tax)).alias("sum_charge"),
            davg(qty).alias("avg_qty"),
            davg(price).alias("avg_price"),
            davg(disc).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM (
        SELECT p.p_partkey, p.p_type, eu.s_name, eu.s_acctbal, eu.n_name,
               ps.unit_cost,
               row_number() OVER (
                   PARTITION BY p.p_partkey
                   ORDER BY ps.unit_cost, eu.s_suppkey
               ) AS rn
        FROM part p, ps, eu
        WHERE p.p_partkey = ps.l_partkey
          AND ps.l_suppkey = eu.s_suppkey
          AND p.p_size BETWEEN 10 AND 15
          AND p.p_type = 'LARGE'
    )
    WHERE rn = 1
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier — TPC-H Q2's correlated-min structure.
    partsupp is absent from testdata, so the part-supplier relation is
    lineitem's distinct (l_partkey, l_suppkey) pairs and ps_supplycost
    becomes the observed min unit price; the defining shape — for each
    qualifying part, THE supplier achieving the region-wide minimum
    cost — is intact, realized as a row_number window with a unique
    tiebreak instead of a correlated scalar subquery (same plan Spark
    and DuckDB derive for the original). Scale: the pair aggregation
    shuffles lineitem once on (partkey, suppkey); part filter and the
    25-row nation⋈region dim broadcast; the window re-shuffles only the
    filtered candidates, not the corpus."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE")
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        ps.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "unit_cost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice, l_discount
        FROM lineitem, part, supplier, orders, nation
        WHERE s_suppkey = l_suppkey
          AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit — TPC-H Q9's shape: a part-name LIKE filter
    fans a 4-fact join into a (nation, year) rollup. The supplycost
    term of the profit formula needs partsupp (absent), so profit is
    the revenue term only — the join graph and double group key are
    unchanged. Scale: part filter broadcasts ahead of the lineitem
    scan; supplier and orders join on their natural keys (one shuffle
    each side); nation broadcasts; year() stays in codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            F.col("p_name").like("%red%")
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS v_dec
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey,
           CAST(CAST(v_dec AS VARCHAR) AS DOUBLE) AS part_value
    FROM pv
    WHERE v_dec > (
        SELECT sum(v_dec) * CAST(0.0001 AS DECIMAL(10,6)) FROM pv
    )
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock — TPC-H Q11's defining structure: a grouped
    value per part HAVING-filtered against a scalar subquery over the
    SAME aggregate (a fraction of the global total). partsupp's
    supplycost*availqty value becomes the revenue booked per part from
    one nation's suppliers. The threshold compare happens in exact
    decimal on BOTH engines (double totals would depend on summation
    order). Scale: the grouped aggregate shuffles once on l_partkey;
    the global total is a 1-row re-aggregation of the per-part result
    broadcast back via cross join — the q_tpch_q15 pattern, never an
    unpartitioned window."""
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").join(
            n, F.col("s_nationkey") == F.col("n_nationkey")
        )
    )
    pv = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,10)")).alias(
                "v_dec"
            )
        )
    )
    total = pv.agg(
        (F.sum("v_dec") * F.lit("0.0001").cast("decimal(10,6)")).alias(
            "threshold"
        )
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("v_dec") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("v_dec").cast("string").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 3, 5, 7, 9, 11, 13, 15)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship — TPC-H Q16: how many distinct
    suppliers can supply each surviving (brand, type, size) bucket.
    partsupp is lineitem's distinct pairs (see module docstring); the
    original's supplier-complaint NOT IN is dropped — testdata carries
    no comment column. Scale: the distinct-pairs aggregation and the
    count(DISTINCT) expand-aggregate both shuffle on bounded keys;
    the filtered part dim broadcasts."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 3, 5, 7, 9, 11, 13, 15)
        )
    )
    return (
        pairs.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )
