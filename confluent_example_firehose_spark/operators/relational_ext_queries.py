"""Relational breadth extensions (SURVEY.md §2.B follow-on): SQL
surfaces the first pass didn't cover — grouping sets with grouping
markers, correlated EXISTS/NOT EXISTS, scalar subqueries, ordered
string aggregation, unpivot, ntile/percent_rank/cume_dist, exact
percentiles, and FILTER-style conditional aggregates.

The reference has no SQL surface at all (its only "query" is the
hard-coded consume loop, AbstractFirehose.java:113-142); these queries
demonstrate engine completeness on the driver's TPC-H-ish tables.
Several run through spark.sql(...) deliberately — the SQL front door is
part of the engine surface, and Catalyst rewrites correlated
subqueries into the same semi/anti/scalar-subquery joins the DataFrame
API would produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register
from .relational import dsum, dsum_sql


@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond q_rollup_cube's rollup/cube
    shorthands): two one-column sets plus the grand total, with
    GROUPING() markers disambiguating real NULLs from subtotal rows.
    Catalyst plans this as one Expand + hash agg — a single pass over
    the fact regardless of how many sets are declared (the 100 TB
    shape; N separate GROUP BYs would be N scans)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
                   AS total_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          )
    ORDER BY c_custkey
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS through the SQL front door.
    Catalyst rewrites the pair into a left-semi and a left-anti join on
    o_custkey (RewritePredicateSubquery) — the exact plan
    q_join_semi_anti builds by hand, proving the two surfaces converge.
    Scale: both rewritten joins shuffle on the customer key once; the
    EXISTS side aggregates nothing (first-match short-circuit)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_v"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer_v c
        WHERE EXISTS (
                SELECT 1 FROM orders_v o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders_v o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              )
        ORDER BY c_custkey
        """
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a filter: orders within 10% of
    the global maximum price. The threshold is max-derived (order-
    insensitive, so bit-identical across engines — an avg would depend
    on summation order). Catalyst executes the subquery once and
    injects the scalar into the predicate; the fact scan then filters
    in one pass — no join, no window, no second shuffle."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v
        WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders_v)
        ORDER BY o_totalprice DESC, o_orderkey
        """
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))),
                           ',') AS statuses,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: the distinct statuses per priority,
    key-sorted then joined — deterministic under any partitioning
    (an unsorted string_agg would depend on arrival order, the same
    trap as the reference's map iteration, SURVEY.md §1.4).
    collect_set keeps per-group state bounded by the value domain, not
    the row count."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("o_orderstatus"))
            ).alias("statuses"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, attr, val FROM (
        SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val
        FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val
        FROM part
    )
    ORDER BY p_partkey, attr
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via stack(): two numeric part attributes
    melt into (key, attr, val) rows. stack is a narrow 1->n expression
    — no shuffle, no join; the oracle's UNION ALL double-scan is
    exactly what unpivot avoids at scale (one scan instead of one per
    attribute)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.expr(
                "stack(2, 'size', CAST(p_size AS DOUBLE), "
                "'retailprice', p_retailprice) AS (attr, val)"
            ),
        )
        .orderBy("p_partkey", "attr")
    )


@register(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile quartiles, percent_rank,
    cume_dist over one account-balance ordering (unique-key tiebreak
    for determinism). NOTE the unpartitioned window: correct here as a
    demo but a single-task funnel at 100 TB — the scale version
    partitions by a bucketing key or uses approx percentiles
    (q_agg_quantiles); this query exists to pin the exact semantics."""
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           max(l_quantity) AS q_max
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (the companion to q_agg_quantiles'
    approx sketch): Spark `percentile` and DuckDB `quantile_cont` both
    define the linear-interpolation quantile, so values match. Exact
    percentiles buffer each group's values — fine on a bounded group
    count (3 flags here); at 100 TB with high-cardinality groups the
    approx sketch is the right tool (its query exists alongside)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("p25"),
            F.percentile("l_quantity", 0.5).alias("p50"),
            F.percentile("l_quantity", 0.75).alias("p75"),
            F.max("l_quantity").alias("q_max"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_conditional_agg",
    oracle=f"""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           count(*) FILTER (WHERE l_discount = 0.0) AS n_undiscounted,
           {dsum_sql("CASE WHEN l_tax > 0.04 "
                     "THEN l_extendedprice ELSE 0 END")} AS taxed_price,
           count(*) AS n_total
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: FILTER-clause counts (count_if) and a
    CASE-guarded decimal sum in one pass. The idiomatic replacement for
    N filtered self-joins — one scan, one partial+final agg, per-group
    state is a handful of counters no matter the input size."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.count_if(F.col("l_discount") == 0.0).alias("n_undiscounted"),
            dsum(
                F.when(
                    F.col("l_tax") > 0.04, F.col("l_extendedprice")
                ).otherwise(F.lit(0.0))
            ).alias("taxed_price"),
            F.count("*").alias("n_total"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_profile_table",
    oracle="""
    SELECT col_name, n_rows, n_nulls, n_distinct, min_d, max_d
    FROM (
        SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
               count(*) - count(l_quantity) AS n_nulls,
               count(DISTINCT l_quantity) AS n_distinct,
               min(l_quantity) AS min_d, max(l_quantity) AS max_d
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(*), count(*) - count(l_discount),
               count(DISTINCT l_discount), min(l_discount), max(l_discount)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag), NULL, NULL
        FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
               count(DISTINCT l_linestatus), NULL, NULL
        FROM lineitem
    )
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE TABLE ... COMPUTE STATISTICS twin):
    row count, null count, exact distinct count, and numeric min/max for
    a column set, emitted long-form (one row per column).

    ONE scan feeds every column's stats: Catalyst plans the multi-
    countDistinct as a single Expand + two-level aggregate, so the fact
    is read once regardless of how many columns are profiled — the
    oracle's N-scan UNION ALL formulation is the naive plan this query
    exists to avoid. Stats like these drive CBO join ordering and the
    skew diagnostics every 100 TB pipeline needs before it picks salt
    factors and bucket counts."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count("*").alias("n_rows"),
        *[
            e
            for c in ("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
            for e in (
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
            )
        ],
        F.min("l_quantity").alias("min_l_quantity"),
        F.max("l_quantity").alias("max_l_quantity"),
        F.min("l_discount").alias("min_l_discount"),
        F.max("l_discount").alias("max_l_discount"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                (
                    F.col(f"min_{c}")
                    if c in ("l_quantity", "l_discount")
                    else F.lit(None).cast("double")
                ).alias("min_d"),
                (
                    F.col(f"max_{c}")
                    if c in ("l_quantity", "l_discount")
                    else F.lit(None).cast("double")
                ).alias("max_d"),
            )
            for c in ("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "q_recursive_calendar",
    oracle="""
    WITH RECURSIVE cal(m, mx) AS (
        SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
               CAST(date_trunc('month', max(o_orderdate)) AS DATE)
        FROM orders
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mx FROM cal WHERE m < mx
    ),
    mo AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               count(*) AS n_orders
        FROM orders GROUP BY m
    )
    SELECT cal.m AS month,
           CAST(COALESCE(mo.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(mo.n_orders IS NULL AS BIGINT) AS is_gap
    FROM cal LEFT JOIN mo ON mo.m = cal.m
    """,
)
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 `WITH RECURSIVE`) date scaffold: generate
    every month between the first and last order date, then left-join
    monthly order counts so EMPTY months surface as explicit gap rows —
    the standard gap-filling scaffold a reporting layer builds (a plain
    GROUP BY can only show months that have data). The max bound rides
    along as a column because Spark doesn't allow a correlated scalar
    subquery in the recursive term.

    Scale shape: the recursion is a LINEAR ladder over the calendar —
    one row per month, bounded by the date span (~7 years = ~84 levels,
    under the default 100-level limit), never by data volume; the data
    side is one map-side-combinable monthly aggregate, and the join of
    calendar x months is broadcast-sized by construction. UNION
    (distinct) recursion — graph closure — is not yet supported by
    Spark ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]); iterative closure
    stays on the dataflow path (connected_components)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH RECURSIVE cal(m, mx) AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE)
            FROM orders_v
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE), mx
            FROM cal WHERE m < mx
        ),
        mo AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   count(*) AS n_orders
            FROM orders_v GROUP BY m
        )
        SELECT cal.m AS month,
               CAST(COALESCE(mo.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(mo.n_orders IS NULL AS BIGINT) AS is_gap
        FROM cal LEFT JOIN mo ON mo.m = cal.m
        """
    )


@register(
    "q_corr_stats",
    oracle="""
    WITH t AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS x,
               CAST(json_extract(props, '$.k') AS BIGINT) AS y
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
    ),
    g AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM t GROUP BY event_type
    )
    SELECT event_type, n,
           round((CAST(sxy AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                 / nullif(
                    sqrt(CAST(sxx AS DOUBLE) / n
                         - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                    * sqrt(CAST(syy AS DOUBLE) / n
                           - (CAST(sy AS DOUBLE) / n)
                             * (CAST(sy AS DOUBLE) / n)), 0),
                 6) AS corr_xy
    FROM g
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation between event value (exact cents)
    and the JSON prop k — computed from EXACT integer co-moment sums
    (n, Sx, Sy, Sxy, Sxx, Syy), with doubles entering only in the final
    closed-form expression. Built-in corr() folds doubles in partition
    order and is not reproducible across engines or runs; this shape is
    the order-independent way to do distributed correlation (and the
    co-moment sums merge associatively, so it re-aggregates like
    q_partial_reagg). At extreme scale the squared-sum magnitudes
    outgrow BIGINT (~1e11 rows at these value ranges) — the production
    variant swaps the sums to DECIMAL(38,0); the shape is unchanged.

    Scale shape: one map-side-combinable hash aggregation on a tiny key
    space; the correlation math runs on the aggregated rows."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.get_json_object("props", "$.k").cast("long").alias("y"),
    ).filter(F.col("y").isNotNull())
    g = t.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    mx, my = sx.cast("double") / n, sy.cast("double") / n
    cov = sxy.cast("double") / n - mx * my
    vx = sxx.cast("double") / n - mx * mx
    vy = syy.cast("double") / n - my * my
    # Zero-variance guard (ADVICE r4): constant x or y in a group makes
    # the denominator 0 — bare division gives NaN in Spark with engine-
    # dependent DuckDB behavior; NULL is the defined value both sides.
    denom = F.nullif(F.sqrt(vx) * F.sqrt(vy), F.lit(0.0))
    return g.select(
        "event_type",
        "n",
        F.round(cov / denom, 6).alias("corr_xy"),
    )


@register(
    "q_integrity_audit",
    oracle="""
    SELECT 'orders_orphan_custkey' AS check_name,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_bad
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_dup_orderkey',
           (SELECT CAST(COALESCE(sum(c - 1), 0) AS BIGINT) FROM
            (SELECT count(*) AS c FROM orders GROUP BY o_orderkey))
    UNION ALL
    SELECT 'customer_null_name',
           (SELECT count(*) FROM customer WHERE c_name IS NULL)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
    """,
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation audit (the data-quality gate a pipeline
    runs before publishing a table version): referential integrity via
    anti joins (orders->customer, lineitem->orders), key uniqueness via
    count-minus-distinct, null and domain checks — one row per check,
    zero means clean.

    Scale shape: each FK check is a left-anti join that AQE broadcasts
    when the dimension fits (customer/orders here) and shuffles
    otherwise; the uniqueness check is a map-side-combinable count per
    key. The five checks share scans where Catalyst can (orders feeds
    two) and the result is five rows — this is the shape of dbt-style
    'expectations' at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name: str, df_cnt: DataFrame) -> DataFrame:
        return df_cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n_bad").cast("long").alias("n_bad"),
        )

    orphan_orders = one(
        "orders_orphan_custkey",
        o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
            F.count("*").alias("n_bad")
        ),
    )
    orphan_items = one(
        "lineitem_orphan_orderkey",
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
            F.count("*").alias("n_bad")
        ),
    )
    dup_keys = one(
        "orders_dup_orderkey",
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n_bad")
        ),
    )
    null_names = one(
        "customer_null_name",
        c.filter(F.col("c_name").isNull()).agg(F.count("*").alias("n_bad")),
    )
    bad_qty = one(
        "lineitem_nonpositive_qty",
        li.filter(F.col("l_quantity") <= 0).agg(F.count("*").alias("n_bad")),
    )
    return (
        orphan_orders.unionByName(orphan_items)
        .unionByName(dup_keys)
        .unionByName(null_names)
        .unionByName(bad_qty)
    )


@register(
    "q_yoy_growth",
    oracle="""
    WITH y AS (
        SELECT year(CAST(o_orderdate AS DATE)) AS yr,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY yr
    )
    SELECT yr, n_orders, rev_cents,
           CAST(lag(rev_cents) OVER (ORDER BY yr) AS BIGINT)
               AS prev_rev_cents,
           round(CASE WHEN lag(rev_cents) OVER (ORDER BY yr) IS NULL
                      THEN NULL
                      ELSE (CAST(rev_cents AS DOUBLE)
                            - lag(rev_cents) OVER (ORDER BY yr))
                           / lag(rev_cents) OVER (ORDER BY yr) END,
                 6) AS yoy_growth
    FROM y
    """,
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly exact-cent revenue with a
    lag window producing each year's growth rate — the canonical
    reporting self-comparison, done with ONE window instead of a
    self-join.

    Scale shape: the heavy work is a map-side-combinable aggregate to
    ~7 rows (one per year); the lag window then runs over those 7 rows.
    An UNPARTITIONED window over an aggregated-to-tiny frame is the one
    place a global window is legitimate — the input is bounded by the
    calendar, not the data (contrast q_text_bm25's r3 rank-before-limit
    bug, where the global window saw the full candidate set)."""
    o = load_table(spark, sf_dir, "orders")
    y = (
        o.select(
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("yr")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("rev_cents"),
        )
    )
    w = Window.orderBy("yr")
    prev = F.lag("rev_cents").over(w)
    return y.select(
        "yr",
        "n_orders",
        "rev_cents",
        prev.cast("long").alias("prev_rev_cents"),
        F.round(
            (F.col("rev_cents").cast("double") - prev) / prev, 6
        ).alias("yoy_growth"),
    )


@register(
    "q_window_range_interval",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_1h,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_1h
    FROM events
    WHERE user_id < 50
    """,
)
def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (RANGE BETWEEN INTERVAL ... PRECEDING):
    per user, the trailing-1-hour event count and exact-cent value sum
    at every event — the continuous sliding-window analytic that
    tumbling/sliding WINDOW aggregation (q_window_sliding) only
    approximates at fixed slide boundaries. Spark's DataFrame API has
    no interval-RANGE frame; rangeBetween takes the interval in SECONDS
    over a cast-to-long ordering column — same frame semantics as the
    oracle's INTERVAL syntax. Sums are exact cents (a double sum over a
    sliding frame is evaluation-order-dependent).

    Scale shape: one shuffle on user_id (the partition key), then a
    per-partition ordered scan with a two-pointer frame — the window
    never sees more than one user's history, and the user_id < 50
    predicate is pushed to the parquet scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .cast("long")
        .alias("cents_1h"),
        F.count("*").over(w).cast("long").alias("n_1h"),
    )


@register(
    "q_scd2_merge",
    oracle="""
    WITH cur AS (
        SELECT c_custkey, 1 AS version,
               CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, 2 AS version,
               CAST(round(c_acctbal * 100) AS BIGINT) + 10000
                   AS acctbal_cents
        FROM customer WHERE c_custkey % 10 = 0
    ),
    hist AS (
        SELECT * FROM cur UNION ALL SELECT * FROM upd
    )
    SELECT c_custkey, CAST(version AS BIGINT) AS version, acctbal_cents,
           CAST(lead(version) OVER (
               PARTITION BY c_custkey ORDER BY version) AS BIGINT)
               AS superseded_by,
           CAST(lead(version) OVER (
               PARTITION BY c_custkey ORDER BY version) IS NULL
               AS BIGINT) AS is_current
    FROM hist
    """,
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 MERGE twin without a table format: apply a change
    set (10% of customers get +100.00) onto the current dimension as
    history rows — old versions get `superseded_by`, the open row is
    flagged current. This is `MERGE INTO ... WHEN MATCHED` re-expressed
    as union + per-key version window, the way an engine without
    ACID-table support (no Delta/Iceberg in this container) runs
    dimension maintenance; the write side would then overwrite the
    dimension snapshot atomically (q_sink_foreachbatch's idempotent
    directory pattern).

    Scale shape: ONE shuffle on c_custkey shared by the window; the
    change set unions in before the shuffle so matched and unmatched
    keys flow through the same partitioning. Balances are exact cents."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    cur = c.select(
        "c_custkey",
        F.lit(1).alias("version"),
        cents.alias("acctbal_cents"),
    )
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit(2).alias("version"),
        (cents + 10000).alias("acctbal_cents"),
    )
    hist = cur.unionByName(upd)
    w = Window.partitionBy("c_custkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return hist.select(
        "c_custkey",
        F.col("version").cast("long").alias("version"),
        "acctbal_cents",
        nxt.cast("long").alias("superseded_by"),
        nxt.isNull().cast("long").alias("is_current"),
    )


@register(
    "q_join_shuffle_hash",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control: the SHUFFLE_HASH hint forces a
    ShuffledHashJoin where AQE would default to sort-merge — the right
    call when one side is far smaller than the other but too big to
    broadcast (hash-table build beats sorting BOTH sides; no spillable
    sort). The oracle pins that strategy choice never changes results;
    the plan test pins that the hint actually took effect.

    Scale shape: same single co-partitioned shuffle as SMJ, minus the
    two sorts. At 100 TB this is the standard fact-to-medium-dim join
    once the dim outgrows the broadcast threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )


@register(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
           count(*) FILTER (WHERE json_extract(props, '$.k') IS NULL)
               AS n_null_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured ingestion (Spark 4): props parses ONCE
    into the binary variant encoding, then typed paths are extracted
    with try_variant_get — the schema-on-read path that replaces
    repeated get_json_object string re-parsing (each get_json_object
    call re-parses the JSON text; variant decodes field offsets).

    Scale shape: parse + extract are narrow codegen'd expressions
    feeding a map-side-combinable aggregate; at 100 TB the win is
    parsing each payload once regardless of how many fields downstream
    operators pull, and storing variant columns keeps them prunable."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).withColumn("k", F.try_variant_get("v", "$.k", "long"))
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_null_k"),
    )


@register(
    "q_lateral_topn",
    oracle="""
    SELECT r.r_name, t.n_name, t.n_customers
    FROM region r,
    LATERAL (
        SELECT n.n_name, count(*) AS n_customers
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n.n_name
        LIMIT 2
    ) t
    """,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY ... LIMIT: the top-2
    nations by customer count within EACH region — the per-row-subquery
    SQL surface (Spark 4 LATERAL). Catalyst decorrelates this into the
    same join + partitioned-rank plan the DataFrame window API writes
    by hand (q_topk), proving the two front doors converge; the (count
    desc, name) order is total, so the LIMIT'd row set is
    deterministic.

    Scale shape: after decorrelation the heavy work is one
    customer-per-nation count (map-side combinable) and a rank
    partitioned by region — never a global window; region/nation are
    broadcast-sized."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_v")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_v"
    )
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_customers
        FROM region_v r,
        LATERAL (
            SELECT n.n_name, count(*) AS n_customers
            FROM nation_v n JOIN customer_v c
              ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
            ORDER BY n_customers DESC, n.n_name
            LIMIT 2
        ) t
        """
    )


@register(
    "q_listagg",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native LISTAGG ... WITHIN GROUP (Spark 4): ordered string
    aggregation as a first-class aggregate — the standard-SQL spelling
    of what q_string_agg builds from concat_ws(array_sort(...)). The
    WITHIN GROUP order makes the concatenation deterministic, so it
    hash-matches DuckDB's string_agg(... ORDER BY).

    Scale shape: an ordered aggregate cannot partially combine the
    string; Spark collects the group's values and sorts per group —
    fine for bounded groups (5 nations/region), the documented trade vs
    q_string_agg's sortable-array form for big groups."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_v")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations
        FROM region_v r JOIN nation_v n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@register(
    "q_join_nullsafe",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS pr_key
        FROM orders
    ),
    d AS (
        SELECT DISTINCT NULLIF(o_orderpriority, '1-URGENT') AS pr_key,
               COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT-BUCKET')
                   AS bucket_name
        FROM orders
    )
    SELECT d.bucket_name, count(*) AS n_orders
    FROM o JOIN d ON o.pr_key IS NOT DISTINCT FROM d.pr_key
    GROUP BY d.bucket_name
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    join each other instead of silently dropping — the semantics a
    dimension join needs when NULL is a real 'unknown' bucket (here
    1-URGENT is nulled into that bucket). A plain equi-join would lose
    every NULL-keyed row; the count per bucket proves they flowed
    through.

    Scale shape: <=> is still hash-joinable (NULL hashes to one
    partition — a skew hazard if the unknown bucket dominates; salting
    applies as usual); the dim side is distinct-collapsed and
    broadcast."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias(
            "pr_key"
        ),
    )
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias(
                "pr_key"
            )
        )
        .distinct()
        .select(
            "pr_key",
            F.coalesce(F.col("pr_key"), F.lit("URGENT-BUCKET")).alias(
                "bucket_name"
            ),
        )
    )
    j = o.join(F.broadcast(d), o.pr_key.eqNullSafe(d.pr_key))
    return j.groupBy("bucket_name").agg(F.count("*").alias("n_orders"))


@register(
    "q_cdc_materialize",
    oracle="""
    WITH log AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
        FROM events
    ),
    last AS (
        SELECT user_id, op, cents FROM log
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ),
    agg AS (
        SELECT user_id, count(*) AS n_changes,
               CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_deletes
        FROM log GROUP BY user_id
    )
    SELECT a.user_id, l.cents, a.n_changes, a.n_deletes
    FROM last l JOIN agg a USING (user_id)
    WHERE l.op = 'U'
    """,
)
def q_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-log materialization: apply an ordered upsert/delete
    log (events keyed by user_id, 'error' = tombstone, anything else =
    upsert of the value in exact cents, total order (ts, event_id))
    down to the current-state table — the Debezium-feed / streaming-
    table-maintenance primitive q_scd2_merge's history view doesn't
    cover: deletes REMOVE the key instead of versioning it. Keys whose
    LAST change is a tombstone are absent from the result; per-key
    change/delete counts ride along as audit columns.

    Scale shape: ONE partial+final aggregate — max_by(struct(op,
    cents), struct(ts, event_id)) resolves last-writer-wins with
    map-side combine (each input split collapses to <= n_keys rows
    before the shuffle; struct-keyed max_by plans as SortAggregate,
    but the per-partition sort is on the group key, NOT the oracle's
    global per-key window sort over every change). Tombstone filtering
    is a post-agg filter on the key-sized result."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    g = log.groupBy("user_id").agg(
        F.max_by(
            F.struct("op", "cents"), F.struct("ts", "event_id")
        ).alias("last"),
        F.count("*").alias("n_changes"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias(
            "n_deletes"
        ),
    )
    return g.filter(F.col("last.op") == "U").select(
        "user_id",
        F.col("last.cents").alias("cents"),
        "n_changes",
        "n_deletes",
    )


@register(
    "q_nested_analytics",
    oracle="""
    SELECT l_orderkey,
           count(*) AS n_items,
           CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT)
               AS n_big,
           CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FILTER (WHERE l_quantity >= 25), 0) AS BIGINT)
               AS big_cents,
           CAST(max(l_linenumber) AS BIGINT) AS max_line
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q_nested_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data analytics: lineitems collapse into ONE array<struct>
    per order (the denormalized layout a 100 TB fact table keeps so
    detail rides with its parent), and every later metric is a NARROW
    higher-order expression over that array — filter() for the
    big-quantity subset, aggregate() for its exact-cent sum, transform
    + array_max for the line census — no re-explode, no second
    shuffle. The oracle computes the same numbers relationally
    (GROUP BY + FILTER), proving the nested pipeline loses nothing.

    Scale shape: one shuffle to build the nests (collect_list is the
    only wide op), then all analytics are per-row array expressions;
    at scale the nested table is written once and every downstream
    reader skips the shuffle entirely."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber").alias("ln"),
            F.col("l_quantity").alias("qty"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        ).alias("item"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list("item").alias("items")
    )
    big = F.filter(F.col("items"), lambda it: it["qty"] >= 25)
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.size(big).cast("long").alias("n_big"),
        F.aggregate(
            big, F.lit(0).cast("long"), lambda acc, it: acc + it["cents"]
        ).alias("big_cents"),
        F.array_max(
            F.transform(F.col("items"), lambda it: it["ln"])
        ).cast("long").alias("max_line"),
    )


@register(
    "q_robust_stats",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    cnt AS (
        SELECT event_type, cents, count(*) AS cc
        FROM c GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type, cents,
               sum(cc) OVER (PARTITION BY event_type
                             ORDER BY cents) AS cum,
               sum(cc) OVER (PARTITION BY event_type) AS nn
        FROM cnt
    ),
    th AS (
        SELECT event_type,
               min(cents) FILTER (WHERE 20 * cum >= nn) AS lo,
               min(cents) FILTER (WHERE 20 * cum >= 19 * nn) AS hi
        FROM cum
        GROUP BY event_type
    )
    SELECT c.event_type, count(*) AS n,
           CAST(count(*) FILTER (WHERE cents < lo) AS BIGINT)
               AS n_clip_lo,
           CAST(count(*) FILTER (WHERE cents > hi) AS BIGINT)
               AS n_clip_hi,
           th.lo AS lo_cents, th.hi AS hi_cents,
           round(CAST(sum(CASE WHEN cents < lo THEN lo
                               WHEN cents > hi THEN hi
                               ELSE cents END) AS DOUBLE)
                 / count(*), 6) AS winsor_mean_cents,
           round(CAST(sum(cents) AS DOUBLE) / count(*), 6)
               AS raw_mean_cents
    FROM c JOIN th USING (event_type)
    GROUP BY c.event_type, th.lo, th.hi
    """,
)
def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics — the outlier-clipping pass a
    curation pipeline runs before trusting a mean: per event type, the
    p05/p95 frontier is found by an INTEGER RANK-CROSSING rule
    (ADVICE r5, the q_quantile_mergeable 2c>=n form): lo = the
    smallest cents value whose cumulative count reaches n/20, hi =
    the smallest reaching 19n/20 — inverse ECDF on exact integers, so
    both engines agree bit-for-bit by construction. (The previous
    round(percentile(...)) frontier interpolated a double and rounded
    it; a frontier landing on x.5 or off by 1 ULP between engines
    would flip the rounded long and every downstream clip count.)
    Every value then clips to the integer frontier and the winsorized
    mean comes from an EXACT integer sum; clip counts ride along so
    the report shows how much tail was tamed.

    Scale shape: the frontier pass is a per-(type, cents) count (map-
    side combinable, one row per distinct value) + a window over the
    distinct values of each type (bounded by value cardinality, not
    row count) + a tiny min-filter aggregate; the result broadcasts
    back onto the fact for one clipped-sum aggregate. The approx-
    sketch swap for unbounded cardinality is q_agg_quantiles."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cnt = ev.groupBy("event_type", "cents").agg(
        F.count("*").alias("cc")
    )
    # both windows share the event_type partitioning -> ONE exchange;
    # the unbounded sum doubles as the group total, so no second scan
    # of the fact and no totals join
    jc = cnt.withColumn(
        "cum",
        F.sum("cc").over(
            Window.partitionBy("event_type").orderBy("cents")
        ),
    ).withColumn(
        "nn", F.sum("cc").over(Window.partitionBy("event_type"))
    )
    th = jc.groupBy("event_type").agg(
        F.min(
            F.when(20 * F.col("cum") >= F.col("nn"), F.col("cents"))
        ).alias("lo"),
        F.min(
            F.when(
                20 * F.col("cum") >= 19 * F.col("nn"), F.col("cents")
            )
        ).alias("hi"),
    )
    j = ev.join(F.broadcast(th), "event_type")
    clipped = (
        F.when(F.col("cents") < F.col("lo"), F.col("lo"))
        .when(F.col("cents") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("cents"))
    )
    return (
        j.groupBy("event_type", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("cents") < F.col("lo")).cast("long")).alias(
                "n_clip_lo"
            ),
            F.sum((F.col("cents") > F.col("hi")).cast("long")).alias(
                "n_clip_hi"
            ),
            F.sum(clipped).alias("wsum"),
            F.sum("cents").alias("rsum"),
        )
        .select(
            "event_type",
            "n",
            "n_clip_lo",
            "n_clip_hi",
            F.col("lo").alias("lo_cents"),
            F.col("hi").alias("hi_cents"),
            F.round(F.col("wsum").cast("double") / F.col("n"), 6).alias(
                "winsor_mean_cents"
            ),
            F.round(F.col("rsum").cast("double") / F.col("n"), 6).alias(
                "raw_mean_cents"
            ),
        )
    )
