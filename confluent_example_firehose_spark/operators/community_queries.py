"""Label-propagation community detection (LPA, Raghavan et al. 2007)
over the purchase graph (SURVEY.md §2.D graph suite — the community
lens the connectivity/centrality/core operators don't give:
BFS answers "how far", PageRank "how important", k-core "how dense",
LPA answers "which cluster").

Synchronous deterministic LPA: every node starts as its own label;
each round every node adopts the label MOST FREQUENT among its
neighbors, ties broken by MINIMUM label — a pure function of the
graph, so a fixed-round run is hash-checkable against an unrolled
recursive-CTE oracle exactly like the BFS/PageRank ladders.
Reference parity: the reference engine (/root/reference) has no graph
surface; this extends the build brief's link-graph mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from .graph_queries import _EDGES_SQL, purchase_edges

LPA_ROUNDS = 3  # fixed synchronous rounds (oracle unrolls the ladder)
LPA_TOPK = 30  # reported communities


def _lpa_oracle() -> str:
    sql = f"""
    WITH {_EDGES_SQL},
    n0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)"""
    prev = "n0"
    for k in range(1, LPA_ROUNDS + 1):
        sql += f""",
    n{k} AS (
        SELECT node, lbl FROM (
            SELECT e.dst AS node, r.lbl, count(*) AS c,
                   row_number() OVER (
                       PARTITION BY e.dst
                       ORDER BY count(*) DESC, r.lbl ASC) AS rn
            FROM {prev} r JOIN e ON e.src = r.node
            GROUP BY e.dst, r.lbl
        ) WHERE rn = 1
    )"""
        prev = f"n{k}"
    return sql + f"""
    SELECT CAST(row_number() OVER (ORDER BY n_nodes DESC, community)
                AS BIGINT) AS rank,
           community, n_nodes
    FROM (
        SELECT lbl AS community, count(*) AS n_nodes
        FROM {prev} GROUP BY lbl
    )
    ORDER BY n_nodes DESC, community LIMIT {LPA_TOPK}"""


@register("q_graph_lpa", oracle=_lpa_oracle())
def q_graph_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPA_ROUNDS synchronous label-propagation rounds on the
    symmetrized purchase graph; returns the LPA_TOPK largest
    communities as (rank, community, n_nodes), community = the
    surviving representative label.

    Scale shape: edges are hash-partitioned on src ONCE and persisted
    (the r6 graph-loop rule); each round shuffles the (node, neighbor
    label) vote census — bounded by the distinct-label incidence,
    which STARTS edge-sized (all labels distinct) and shrinks as
    labels coalesce, the irreducible LPA message cost — and the
    argmax is map-side-combinable max(struct(count, -label)), no
    window over the node set. Labels are integers end to end; the
    tie rule (most frequent, then smallest) is encoded identically in
    the oracle's row_number ordering. Linear lineage (each round's
    labels feed only the next), so per the r7 checkpoint-stride law
    the loop checkpoints only the final frame to bound plan depth."""
    return lpa_communities(
        purchase_edges(spark, sf_dir), LPA_ROUNDS, LPA_TOPK
    )


def lpa_communities(
    edges: DataFrame, rounds: int, topk: int
) -> DataFrame:
    """Synchronous deterministic LPA kernel over an edge frame
    (src, dst), assumed symmetric (every node appears as src). Pinned
    against a pure-Python model in tests/test_properties.py."""
    edges = edges.repartition("src").persist()
    try:
        labels = edges.select(F.col("src").alias("node")).distinct()
        labels = labels.select("node", F.col("node").alias("lbl"))
        for r in range(rounds):
            votes = (
                edges.join(labels, edges["src"] == labels["node"])
                .select(F.col("dst").alias("node"), "lbl")
                .groupBy("node", "lbl")
                .agg(F.count("*").alias("c"))
            )
            labels = votes.groupBy("node").agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
                ).alias("m")
            ).select("node", (-F.col("m.nl")).alias("lbl"))
        labels = labels.localCheckpoint()
        comm = labels.groupBy(F.col("lbl").alias("community")).agg(
            F.count("*").alias("n_nodes")
        )
        top = comm.orderBy(
            F.col("n_nodes").desc(), "community"
        ).limit(topk)
        rw = W.orderBy(F.col("n_nodes").desc(), "community")
        return top.select(
            F.row_number().over(rw).cast("long").alias("rank"),
            "community",
            "n_nodes",
        )
    finally:
        edges.unpersist()
