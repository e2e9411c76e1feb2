"""ANN index-quality audit over `embeddings`: recall@K of each
approximate similarity index (LSH sign-buckets, multiprobe LSH)
against the exact brute-force top-K — the measurement a 100 TB
pipeline runs continuously so an index rebuild or distribution shift
that silently degrades retrieval quality is caught as a NUMBER, not
an anecdote (the operational counterpart of the dedup kernels'
recall-contract asserts).

Composed from the registered operators themselves (q_similarity_topk
/ _lsh / _lsh_multiprobe return (query_id, neighbor_id, cos)), so the
audit can never drift from what the indexes actually serve. All
counting is integer; recall is one hits/K division of small exact
ints (identical IEEE doubles on both engines). Reference parity: the
reference engine (/root/reference) has no similarity surface; this
extends the build brief's similarity-search mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .similarity_queries import (
    TOP_K,
    _lsh_oracle,
    q_similarity_lsh,
    q_similarity_lsh_multiprobe,
    q_similarity_topk,
)

def _exact_oracle() -> str:
    """The registered q_similarity_topk oracle, verbatim (single
    source — the audit's 'relevant' set IS what that query serves).
    Read straight from the registration record: importing
    similarity_queries above already registered it, and going through
    all_queries() here would re-enter the registry's ordering pass."""
    from ..registry import _REGISTRY

    return _REGISTRY["q_similarity_topk"].oracle_sql()


def _recall_oracle() -> str:
    return f"""
    WITH exact AS ({_exact_oracle()}),
    ann AS (
        SELECT 'lsh' AS method, query_id, neighbor_id
        FROM ({_lsh_oracle(False)})
        UNION ALL
        SELECT 'lsh_multiprobe' AS method, query_id, neighbor_id
        FROM ({_lsh_oracle(True)})
    ),
    hits AS (
        SELECT a.method, a.query_id,
               count(*) AS n_ann,
               count(e.neighbor_id) AS n_hits
        FROM ann a
        LEFT JOIN exact e
          ON e.query_id = a.query_id
         AND e.neighbor_id = a.neighbor_id
        GROUP BY a.method, a.query_id
    ),
    grid AS (
        SELECT m.method, q.query_id
        FROM (SELECT DISTINCT query_id FROM exact) q
        CROSS JOIN (VALUES ('lsh'), ('lsh_multiprobe')) m(method)
    )
    SELECT g.method, g.query_id,
           CAST(coalesce(h.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
                 / {TOP_K}, 6) AS recall_at_k
    FROM grid g LEFT JOIN hits h
      ON h.method = g.method AND h.query_id = g.query_id
    """


@register("q_ann_recall", oracle=_recall_oracle)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@TOP_K of every ANN index variant vs the exact top-K, per
    query: (method, query_id, n_ann, n_hits, recall_at_k). n_ann can
    fall short of TOP_K when a probe bucket holds fewer than K
    vectors — visible in the output rather than papered over; the
    multiprobe row dominating the plain-LSH row per query is the
    quality ordering the multiprobe design claims.

    Scale shape: inherits its components' shapes — the exact baseline
    broadcasts the bounded query set through one corpus pass, the LSH
    sides are bucket equi-joins; the audit join itself runs on
    (methods x queries x K) rows, broadcast-sized by construction. At
    100 TB the exact side is the expensive leg — run the audit on a
    sampled query set (it is already bounded at N_QUERY_VECS) at
    whatever cadence the quality SLO needs."""
    exact = q_similarity_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = (
        q_similarity_lsh(spark, sf_dir)
        .select(
            F.lit("lsh").alias("method"), "query_id", "neighbor_id"
        )
        .unionByName(
            q_similarity_lsh_multiprobe(spark, sf_dir).select(
                F.lit("lsh_multiprobe").alias("method"),
                "query_id",
                "neighbor_id",
            )
        )
    )
    hits = (
        ann.join(
            F.broadcast(exact.withColumn("hit", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("method", "query_id")
        .agg(
            F.count("*").alias("n_ann"),
            F.count("hit").alias("n_hits"),
        )
    )
    grid = (
        exact.select("query_id")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [("lsh",), ("lsh_multiprobe",)], ["method"]
            )
        )
    )
    return (
        grid.join(F.broadcast(hits), ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            F.coalesce("n_ann", F.lit(0)).cast("long").alias("n_ann"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / TOP_K, 6
            ).alias("recall_at_k"),
        )
    )
