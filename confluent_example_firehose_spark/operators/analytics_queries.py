"""Event-analytics operators over the events table: ordered funnel
conversion, cohort retention, and k-per-group deterministic sampling.

The reference consumes metrics into gauges
(AbstractPrometheusFirehose.java) and has no analytics surface; these
are the product-analytics shapes (funnel / retention) every event
warehouse runs, plus the bounded-sample primitive a debugging workflow
needs. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

FUNNEL_STEPS = ("click", "view", "purchase")
GROUP_SAMPLE_K = 3
GROUP_SAMPLE_SEED = "gs17"


@register(
    "q_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s1) AS n_click,
           (SELECT count(*) FROM s2) AS n_click_view,
           (SELECT count(*) FROM s3) AS n_click_view_purchase,
           round(CAST((SELECT count(*) FROM s2) AS DOUBLE)
                 / nullif((SELECT count(*) FROM s1), 0), 6) AS conv_1_2,
           round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
                 / nullif((SELECT count(*) FROM s2), 0), 6) AS conv_2_3
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (click -> view -> purchase): a user
    advances a step only with a LATER event of the next type — the
    strict event-sequence semantics (min qualifying timestamp per
    step), not mere set membership. Step populations and step-to-step
    conversion rates on one row.

    Scale shape: each step is one equi-join on user_id against the
    previous step's (user, ts) frame + a map-side-combinable min — the
    steps' frames shrink monotonically, and AQE broadcasts them as soon
    as they fit, so at 100 TB only step 1 pays a fact-sized shuffle.
    This is the scalable funnel shape; per-user event-array sorting
    (collect_list + UDF walk) would shuffle the full event payload."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count("*").alias("n_click"))
    c2 = s2.agg(F.count("*").alias("n_click_view"))
    c3 = s3.agg(F.count("*").alias("n_click_view_purchase"))
    out = c1.crossJoin(c2).crossJoin(c3)
    return out.select(
        "n_click",
        "n_click_view",
        "n_click_view_purchase",
        # nullif guards (ADVICE r4): an empty prior step makes the
        # conversion NULL on both engines instead of Spark-NaN vs
        # DuckDB's engine-dependent 0/0.
        F.round(
            F.col("n_click_view").cast("double")
            / F.nullif(F.col("n_click"), F.lit(0)),
            6,
        ).alias("conv_1_2"),
        F.round(
            F.col("n_click_view_purchase").cast("double")
            / F.nullif(F.col("n_click_view"), F.lit(0)),
            6,
        ).alias("conv_2_3"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_n,
               e.user_id
        FROM events e JOIN firsts f ON f.user_id = e.user_id
    ),
    sizes AS (
        SELECT cohort_day, count(*) AS cohort_size FROM firsts
        GROUP BY cohort_day
    )
    SELECT a.cohort_day, a.day_n,
           count(*) AS n_active, s.cohort_size,
           round(CAST(count(*) AS DOUBLE) / s.cohort_size, 6)
               AS retention
    FROM act a JOIN sizes s ON s.cohort_day = a.cohort_day
    WHERE a.day_n <= 7
    GROUP BY a.cohort_day, a.day_n, s.cohort_size
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users are cohorted by first-seen day; each
    (cohort, day-offset) cell counts distinct users active that many
    days later, as a fraction of the cohort — the day-0..7 retention
    triangle every growth dashboard shows.

    Scale shape: first-seen is one map-side-combinable min per user;
    the activity join is user-keyed (same partitioning as the agg
    feeding it), the distinct collapses (cohort, day, user) BEFORE the
    final count so the heavy dedup happens in one user-partitioned
    shuffle, and cohort sizes join back broadcast (calendar-bounded).
    Ratios are exact-int divisions rounded to 6."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    act = (
        ev.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_n"
            ),
            "user_id",
        )
        .filter(F.col("day_n") <= 7)
        .distinct()
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        act.groupBy("cohort_day", "day_n")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_n",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


@register(
    "q_group_sample",
    oracle=f"""
    WITH r AS (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('{GROUP_SAMPLE_SEED}:'
                                || CAST(doc_id AS VARCHAR))
               ) AS rk
        FROM documents
    )
    SELECT lang, rk, doc_id, n_chars
    FROM r WHERE rk <= {GROUP_SAMPLE_K}
    """,
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: exactly K documents per
    language, chosen by md5(seed||doc_id) rank — the uniform bounded
    sample a debugging or eval workflow pulls per stratum,
    reproducible across engines, retries, and partitionings (contrast
    q_sample_stratified, which samples at a RATE; this one fixes the
    COUNT).

    Scale shape: one shuffle on lang for the partitioned rank; the
    rank's input is per-language, never global, and the K-filter
    collapses each partition to K rows immediately. At extreme group
    skew the md5 order still requires each language's full sort —
    production pre-prunes with a coarse hash-prefix filter first
    (keep only keys whose md5 starts with enough zeros to leave ~10K
    candidates, then rank those)."""
    d = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(
                F.concat(
                    F.lit(f"{GROUP_SAMPLE_SEED}:"),
                    F.col("doc_id").cast("string"),
                )
            )
        )
    )
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
        .select("lang", "rk", "doc_id", "n_chars")
    )
