"""Graph operators: multi-source BFS hop distances and PageRank over a
purchase graph — the link-graph analytics a crawl-scale training
pipeline runs for quality signals (a page's rank / distance from
trusted seeds is a standard pretraining quality feature, cf. the
harmonic-centrality filter in Common Crawl derivatives).

Graph derivation (deterministic from the testdata): the bipartite
purchase graph customer→supplier via orders ⋈ lineitem, node-encoded
as customer = 2·custkey, supplier = 2·suppkey + 1, then symmetrized
(both edge directions) so walks mix. ~48k distinct edges at sf0.01.

Determinism rule: every quantity is an integer end to end.
 - BFS distances are integer mins — trivially exact.
 - PageRank runs in FIXED-POINT INTEGER arithmetic: ranks are scaled
   by PR_SCALE and each edge contribution is (rank · 85) div
   (100 · outdeg) — integer division, which Spark (`div`) and DuckDB
   (integer `//`) both compute by TRUNCATION (probed: -1234 // 500 =
   -2 in DuckDB, not floor's -3), so they agree on every sign; all
   operands here are non-negative anyway. A float PageRank would be partition-order-dependent in
   the sum and engine-dependent in the last ULP; the fixed-point form
   is bit-identical everywhere and loses at most outdeg quanta of
   1e-9 mass per node per round (the dangling/rounding residue is
   deliberately dropped, like the classic "lost mass" formulation).

Iteration shape (both queries): the per-round big shuffle is
ranks/frontier ⋈ edges on the src key — the same key every round, so
at scale the edge table is hash-partitioned once and reused; the
per-round groupBy lands on the node key. Lineage is truncated with
localCheckpoint at a per-loop MEASURED stride (r7): every 2nd round
for BFS (the double references are identical subtrees, which
ReusedExchange dedupes), every round for SSSP (the diff-join
reference shapes differ — laziness recomputes, pinned negative), and
only every PR_CKPT_EVERY rounds for the linear-lineage rank loops
(each round references the previous ranks once — no blowup to
truncate). Rounds are FIXED (BFS_HOPS /
PR_ITERS), so the DuckDB oracle unrolls the exact same ladder and the
outputs hash-match.

No reference twin (the reference is a fixed-function metrics
consumer); north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import bucket_pair_instances

BFS_HOPS = 4       # fixed BFS rounds (oracle unrolls the same ladder)
BFS_SEED_MOD = 50  # seed customers: custkey % BFS_SEED_MOD == 0
PR_ITERS = 3       # fixed PageRank rounds
PR_SCALE = 1_000_000_000  # fixed-point scale: rank 1.0 == 1e9
PR_TOPK = 30
PR_CKPT_EVERY = 8  # lineage-truncation stride for the linear rank loops

# Shared SQL for the symmetrized purchase graph (DuckDB oracle side).
_EDGES_SQL = """
    d AS (
        SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    e AS (
        SELECT src, dst FROM d UNION ALL SELECT dst AS src, src AS dst FROM d
    )
"""


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized distinct (src, dst) purchase-graph edges.

    Scale shape: one fact-fact equi-join on the order key (both sides
    shuffle-partitioned on it) collapsed by distinct to the far smaller
    (customer × supplier) incidence set BEFORE the union doubles it —
    at 100 TB the distinct is the load-bearing step (lineitem has many
    rows per (cust, supp); edges are bounded by the incidence)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return d.unionByName(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _bfs_oracle() -> str:
    sql = f"""
    WITH {_EDGES_SQL},
    r0 AS (
        SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
        FROM e
        WHERE src % 2 = 0 AND (src // 2) % {BFS_SEED_MOD} = 0
    )"""
    prev = "r0"
    for k in range(1, BFS_HOPS + 1):
        sql += f""",
    r{k} AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS node, r.dist + 1 AS dist
            FROM {prev} r JOIN e ON e.src = r.node
        ) GROUP BY node
    )"""
        prev = f"r{k}"
    return sql + f"\n    SELECT node, dist FROM {prev}"


def bfs_distances(edges: DataFrame, seed_pred, hops: int) -> DataFrame:
    """Multi-source BFS kernel over an edge frame (src, dst): minimum
    hop distance from the seed set (distinct src values satisfying
    seed_pred, at dist 0) to every node reachable within `hops` hops.
    Returns (node, dist) — materialized, safe after the internal cache
    is dropped. Extracted from q_graph_bfs so the loop is directly
    property-testable against a pure-Python BFS model on arbitrary
    graphs (tests/test_properties.py).

    Scale shape: `hops` fixed rounds of frontier ⋈ edges (src key)
    + groupBy-min (node key) with localCheckpoint lineage truncation.
    Distances are integers; no float anywhere. The edge table is
    hash-partitioned on src ONCE before the loop (r6): the cached
    partitioning satisfies every round's join distribution, so the
    edge TABLE never re-shuffles; what moves per round is the
    node-sized frontier plus the dst-keyed message stream out of the
    join — bounded by edges incident to the frontier and cut down by
    the groupBy-min's map-side partial aggregation (the irreducible
    Pregel message cost, confirmed byte-level by the session-delta
    audit in SCALE.md)."""
    edges = edges.repartition("src")
    edges = edges.persist()
    try:
        seeds = (
            edges.select("src")
            .distinct()
            .filter(seed_pred)
            .select(
                F.col("src").alias("node"),
                F.lit(0).cast("long").alias("dist"),
            )
        )
        reached = seeds.localCheckpoint(eager=True)
        frontier = reached
        for hop in range(hops):
            # Frontier-only messaging (late r6): a node first reached at
            # hop h sends its one useful message at hop h+1 — messages
            # from older nodes can never beat the minima already
            # recorded, so joining edges against the full reached set
            # re-sends every round for nothing. With unit hops the
            # frontier is exactly dist == hop: a filter on the
            # checkpointed node vector, no diff join. Per-round message
            # volume drops from |edges ⋈ reached| to |edges ⋈ frontier|
            # — on a 100 TB graph the difference between a BFS whose
            # round cost tracks the expanding wave and one that re-walks
            # the whole reached region every hop.
            msgs = edges.join(
                frontier.withColumnRenamed("node", "src"), "src"
            ).select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            reached = (
                reached.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            # Checkpoint every 2nd hop, not every hop (r7, VERDICT r6
            # item 4): each localCheckpoint is a full materialization
            # job, and on a round-floor-dominated loop those jobs ARE
            # the wall time. An unchecked round is referenced twice by
            # the next one (union + frontier-join), but the two
            # references are identical subtrees, so ReusedExchange
            # dedupes them at execution — measured at sf0.1 warm:
            # 3.45 s -> 2.50 s with shuffle records unchanged (+1.5%),
            # outputs bit-identical. Never-checkpointing loses (plan
            # doubles per round: 5.28 s) — depth 2 is the sweet spot.
            # The LAST hop always checkpoints so the returned frame is
            # materialized before the finally drops the edge cache.
            if hop % 2 == 1 or hop == hops - 1:
                reached = reached.localCheckpoint(eager=True)
            frontier = reached.filter(F.col("dist") == hop + 1)
    finally:
        edges.unpersist()
    return reached


@register("q_graph_bfs", oracle=_bfs_oracle())
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: minimum hop distance from the seed-customer
    set (custkey % {BFS_SEED_MOD} == 0) to every node reachable within
    {BFS_HOPS} hops of the purchase graph — the trusted-seed distance
    feature of link-graph quality scoring. Loop kernel + scale notes:
    bfs_distances above; fixed round count so the oracle can unroll
    the identical ladder."""
    return bfs_distances(
        purchase_edges(spark, sf_dir),
        (F.col("src") % 2 == 0)
        & ((F.col("src") / 2).cast("long") % BFS_SEED_MOD == 0),
        BFS_HOPS,
    )


def _pagerank_oracle() -> str:
    base = 15 * PR_SCALE // 100
    sql = f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src),
    n AS (SELECT DISTINCT src AS node FROM e),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM n)"""
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        sql += f""",
    r{k} AS (
        SELECT n.node,
               CAST({base} + coalesce(s.c, 0) AS BIGINT) AS rank
        FROM n LEFT JOIN (
            SELECT e.dst AS node,
                   sum((r.rank * 85) // (100 * d.outdeg)) AS c
            FROM {prev} r
            JOIN deg d ON d.node = r.node
            JOIN e ON e.src = r.node
            GROUP BY e.dst
        ) s ON s.node = n.node
    )"""
        prev = f"r{k}"
    return sql + f"""
    SELECT node, rank FROM {prev}
    ORDER BY rank DESC, node LIMIT {PR_TOPK}"""


@register("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (damping 0.85, {PR_ITERS} rounds)
    over the symmetrized purchase graph; top {PR_TOPK} nodes by
    (rank desc, node asc) — a total order, so the LIMIT'd set is
    deterministic. See the module docstring for why the arithmetic is
    integer (engine-portable bit-exactness) and what mass the integer
    division drops.

    Scale shape: per round ONE shuffle join ranks ⋈ edges on src (the
    same key every round) + groupBy-sum on dst + a left join back onto
    the node universe; deg and ranks are node-sized (≪ edges). Top-K
    is orderBy().limit() = TakeOrderedAndProject, never a global
    window. Edges are hash-partitioned on src ONCE before the loop
    (r6): the cached partitioning satisfies every round's join
    distribution, so the edge TABLE shuffles once, not PR_ITERS times
    (measured 4.25 s -> 3.06 s at sf0.1). Per-round traffic that
    remains is the node-sized rank vector plus the dst-keyed
    contribution messages out of the join — edge-bounded, cut down by
    the groupBy-sum's map-side partial aggregation (the irreducible
    Pregel message cost; byte-level numbers in SCALE.md's
    session-delta audit)."""
    return pagerank_ranks(
        purchase_edges(spark, sf_dir), PR_ITERS, PR_TOPK
    )


def pagerank_ranks(edges: DataFrame, iters: int, topk: int) -> DataFrame:
    """Fixed-point integer PageRank kernel over an edge frame
    (src, dst): `iters` damped rounds at scale PR_SCALE, top `topk`
    (node, rank) by (rank desc, node asc). Extracted from
    q_graph_pagerank (scale notes there) for the pure-Python
    integer-arithmetic model law in tests/test_properties.py."""
    edges = edges.repartition("src")
    edges = edges.persist()
    try:
        deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        nodes = edges.select("src").distinct().select(
            F.col("src").alias("node")
        )
        nodes = nodes.localCheckpoint(eager=True)
        base = 15 * PR_SCALE // 100
        ranks = nodes.select(
            "node", F.lit(PR_SCALE).cast("long").alias("rank")
        )
        for i in range(iters):
            contrib = (
                ranks.withColumnRenamed("node", "src")
                .join(deg, "src")
                .join(edges, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("(rank * 85) div (100 * outdeg)").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("c"))
            )
            ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit(base) + F.coalesce(F.col("c"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            # Rank lineage is LINEAR (each round references the
            # previous ranks exactly once), so unlike BFS/CC there is
            # no double-reference blowup to truncate — checkpoint only
            # every PR_CKPT_EVERY rounds to bound plan depth, plus the
            # final round so the returned frame is materialized before
            # the edge cache drops (r7, VERDICT r6 item 4; measured at
            # sf0.1 warm: 3.05 s -> 2.42 s at PR_ITERS=3, where this
            # means final-only; shuffle volume unchanged, outputs
            # bit-identical).
            if i % PR_CKPT_EVERY == PR_CKPT_EVERY - 1 or i == iters - 1:
                ranks = ranks.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return ranks.orderBy(F.desc("rank"), "node").limit(topk)


SSSP_ROUNDS = 4  # fixed relaxation rounds (min cost within 4 hops)

_WEDGES_SQL = """
    d AS (
        SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
               count(DISTINCT o.o_orderkey) AS cnt
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    e AS (
        SELECT src, dst, CAST(1 + 1000 // cnt AS BIGINT) AS w FROM d
        UNION ALL
        SELECT dst AS src, src AS dst, CAST(1 + 1000 // cnt AS BIGINT)
            AS w
        FROM d
    )
"""


def weighted_purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized purchase edges with integer costs: strong links
    (many distinct orders) are cheap — w = 1 + 1000 div cnt. Same
    one-join + group-by derivation as purchase_edges, with the count
    kept instead of distinct-collapsed."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.countDistinct("o_orderkey").alias("cnt"))
    )
    d = d.select(
        "src", "dst", (1 + F.expr("1000 div cnt")).cast("long").alias("w")
    )
    return d.unionByName(
        d.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )


def _sssp_oracle() -> str:
    sql = f"""
    WITH {_WEDGES_SQL},
    r0 AS (
        SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS cost
        FROM e
        WHERE src % 2 = 0 AND (src // 2) % {BFS_SEED_MOD} = 0
    )"""
    prev = "r0"
    for k in range(1, SSSP_ROUNDS + 1):
        sql += f""",
    r{k} AS (
        SELECT node, min(cost) AS cost FROM (
            SELECT node, cost FROM {prev}
            UNION ALL
            SELECT e.dst AS node, r.cost + e.w AS cost
            FROM {prev} r JOIN e ON e.src = r.node
        ) GROUP BY node
    )"""
        prev = f"r{k}"
    return sql + f"\n    SELECT node, cost FROM {prev}"


@register("q_graph_sssp", oracle=_sssp_oracle())
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (bounded Bellman-Ford): minimum total
    edge cost from the seed-customer set within {SSSP_ROUNDS} hops,
    where an edge's cost is inverse to its order volume (strong
    commercial links are cheap to traverse) — BFS generalized from
    hop-counting to cost relaxation, the trust-propagation /
    proximity-scoring shape of link-graph quality pipelines. All
    integer arithmetic; fixed round count, so the oracle unrolls the
    identical relaxation ladder.

    Scale shape: identical to q_graph_bfs — per round ONE src-keyed
    join + node-keyed min agg with localCheckpoint truncation; the
    weighted edge table derives from the same single orders ⋈ lineitem
    pass (group-by keeps the count instead of distinct-collapsing
    it). Edges hash-partitioned on src once before the loop (r6, see
    bfs_distances). Loop kernel: sssp_distances below."""
    return sssp_distances(
        weighted_purchase_edges(spark, sf_dir),
        (F.col("src") % 2 == 0)
        & ((F.col("src") / 2).cast("long") % BFS_SEED_MOD == 0),
        SSSP_ROUNDS,
    )


def sssp_distances(edges: DataFrame, seed_pred, rounds: int) -> DataFrame:
    """Bounded Bellman-Ford kernel over a weighted edge frame
    (src, dst, w): minimum total cost from the seed set (distinct src
    values satisfying seed_pred, at cost 0) within `rounds` relaxation
    rounds. Returns (node, cost) — materialized. Extracted from
    q_graph_sssp for the pure-Python model law in
    tests/test_properties.py; scale notes in q_graph_sssp/bfs_distances."""
    edges = edges.repartition("src")
    edges = edges.persist()
    try:
        reached = (
            edges.select("src")
            .distinct()
            .filter(seed_pred)
            .select(
                F.col("src").alias("node"),
                F.lit(0).cast("long").alias("cost"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = reached
        for _ in range(rounds):
            # Changed-set messaging (late r6): only nodes whose cost
            # improved last round can make a neighbor cheaper this
            # round — a node that settled at round j sent its offers at
            # j+1, so re-offering from the whole reached set every
            # round is pure redundancy. The frontier needs a node-sized
            # left join (new vs old cost) instead of BFS's dist filter
            # because relaxation can LOWER an already-reached node's
            # cost; round-k results are provably identical to
            # full-messaging (both equal min over <=k-edge paths).
            msgs = edges.join(
                frontier.withColumnRenamed("node", "src"), "src"
            ).select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            # Per-round checkpoint is the MEASURED optimum here, unlike
            # BFS (r7 probe, sf0.1 warm: per-round 3.09 s, stride-2
            # 5.16 s, never 8.00 s): the changed-set frontier needs a
            # new-vs-old left join, so an unchecked round is referenced
            # by BOTH that diff join and the next union — reference
            # shapes that differ (ReusedExchange can't dedupe them),
            # so laziness recomputes instead of reusing. Pinned
            # negative result — don't re-apply the BFS stride here.
            new_reached = (
                reached.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("cost").alias("cost"))
                .localCheckpoint(eager=True)
            )
            frontier = (
                new_reached.alias("n")
                .join(reached.alias("o"), "node", "left_outer")
                .filter(
                    F.col("o.cost").isNull()
                    | (F.col("n.cost") < F.col("o.cost"))
                )
                .select("node", F.col("n.cost").alias("cost"))
            )
            reached = new_reached
    finally:
        edges.unpersist()
    return reached


TRI_QTY = 45   # incidence restricted to high-quantity lineitems
TRI_SHARED = 3  # co-purchase edge: suppliers sharing >= 3 customers
TRI_CAP = 256   # per-customer supplier cap (bucket_pair_instances)
TRI_TOPN = 15


@register(
    "q_graph_triangles",
    oracle=f"""
    WITH inc AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= {TRI_QTY}
    ),
    deg AS (SELECT cust, count(*) AS d FROM inc GROUP BY cust),
    ok AS (SELECT cust FROM deg WHERE d BETWEEN 2 AND {TRI_CAP}),
    pairs AS (
        SELECT a.supp AS x, b.supp AS y, count(*) AS shared
        FROM inc a JOIN inc b ON a.cust = b.cust AND a.supp < b.supp
        JOIN ok k ON k.cust = a.cust
        GROUP BY 1, 2
    ),
    e AS (SELECT x, y FROM pairs WHERE shared >= {TRI_SHARED}),
    tri AS (
        SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM e e1
        JOIN e e2 ON e2.x = e1.y
        JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    ),
    nodes AS (SELECT unnest([a, b, c]) AS supp FROM tri)
    SELECT supp, count(*) AS n_tri
    FROM nodes GROUP BY supp
    ORDER BY n_tri DESC, supp LIMIT {TRI_TOPN}
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census on a size-bounded co-purchase projection: the
    bipartite incidence (restricted to quantity >= {TRI_QTY}
    lineitems) projects onto its SMALL side — supplier pairs weighted
    by shared customers via bucket_pair_instances (one bucket shuffle
    on the customer key, per-bucket expansion capped at {TRI_CAP}) —
    and pairs sharing >= {TRI_SHARED} customers become edges; the
    ordered triangle join (a<b<c) then counts each triangle once, and
    the top {TRI_TOPN} suppliers by triangle participation fall out of
    one explode + count. Triangle density is the classic
    community-structure signal (clustering coefficient numerator) a
    link-graph quality pipeline computes.

    Scale shape: the projection is the load-bearing step and is
    bounded BY DESIGN — per-bucket expansion is capped, and the
    projected graph lives on the small side's node count, not the
    corpus. The triangle join runs on the projected edge set (a<b<c
    ordering means no triangle is counted twice and the join never
    explores both directions); AQE broadcasts it when small. All
    integer counts."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= TRI_QTY)
        .select("l_orderkey", "l_suppkey")
    )
    inc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    banded = inc.select(F.col("supp").alias("_id"), "cust")
    edges = (
        bucket_pair_instances(banded, ["cust"], max_bucket=TRI_CAP)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= TRI_SHARED)
        .select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
    )
    e1 = edges.select(F.col("x").alias("a"), F.col("y").alias("b"))
    e2 = edges.select(F.col("x").alias("b"), F.col("y").alias("c"))
    e3 = edges.select(F.col("x").alias("a"), F.col("y").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("supp")
        )
        .groupBy("supp")
        .agg(F.count("*").alias("n_tri"))
        .orderBy(F.desc("n_tri"), "supp")
        .limit(TRI_TOPN)
    )


KCORE_K = 30      # degree threshold
KCORE_ROUNDS = 3  # fixed peel rounds (oracle unrolls the same ladder)


def _kcore_oracle() -> str:
    sql = f"""
    WITH {_EDGES_SQL},
    e0 AS (SELECT src, dst FROM e)"""
    prev_e = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        sql += f""",
    deg{r} AS (SELECT src AS node, count(*) AS dg FROM {prev_e}
               GROUP BY src),
    n{r} AS (SELECT node FROM deg{r} WHERE dg >= {KCORE_K}),
    e{r} AS (
        SELECT ed.src, ed.dst FROM {prev_e} ed
        JOIN n{r} a ON a.node = ed.src
        JOIN n{r} b ON b.node = ed.dst
    )"""
        prev_e = f"e{r}"
    return sql + f"""
    SELECT src AS node, count(*) AS core_deg
    FROM {prev_e} GROUP BY src"""


@register("q_graph_kcore", oracle=_kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling ({KCORE_ROUNDS} rounds toward the
    {KCORE_K}-core): repeatedly drop nodes whose remaining degree is
    below K and the edges they carried — the graph-degeneracy filter
    that separates densely embedded nodes from peripheral ones (the
    community-core signal next to q_graph_triangles' clustering
    signal). Fixed round count, so the DuckDB oracle unrolls the
    identical peel ladder; full peeling to the true k-core is this
    loop run to fixpoint (the q_dedup_clusters convergence pattern).
    Output: surviving nodes with their in-core degree — all integers.

    Scale shape (reworked late r6): checkpoint the SMALL side, not the
    big one. The survivor set `keep` is node-sized — it gets the
    per-round localCheckpoint (truncating lineage at linear cost) and
    an explicit broadcast; `cur` stays a LAZY chain of broadcast
    semi-restrictions over the src-partitioned cached edge table, so
    its partitioning survives every round (broadcast joins preserve
    distribution — the checkpoint that would have destroyed it is
    gone) and each round's degree aggregation is exchange-free.
    Measured at sf0.1: loop shuffle 1.63 M rows -> 32 rows, wall
    4.75 s -> 3.71 s. Each round's keep job re-probes the cached
    edges through the accumulated broadcast chain — rounds+1 in-memory
    scans, zero shuffles, plan depth linear in rounds. At a scale
    where the survivor set outgrows broadcast, swap the hint for the
    shuffled semi-join and re-checkpoint `cur`; the oracle is
    unchanged either way. Loop kernel: kcore_survivors below."""
    return kcore_survivors(
        purchase_edges(spark, sf_dir), KCORE_K, KCORE_ROUNDS
    )


def kcore_survivors(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded k-core peel kernel over an edge frame (src, dst):
    `rounds` rounds of drop-degree-below-k, returning surviving
    (node, core_deg). Extracted from q_graph_kcore (scale notes there)
    for the pure-Python model law in tests/test_properties.py."""
    edges = edges.repartition("src").persist()
    cur = edges
    try:
        for _ in range(rounds):
            deg = cur.groupBy("src").agg(F.count("*").alias("dg"))
            keep = (
                deg.filter(F.col("dg") >= k)
                .select("src")
                .localCheckpoint(eager=True)
            )
            cur = (
                cur.join(
                    F.broadcast(keep.withColumnRenamed("src", "node")),
                    cur.src == F.col("node"),
                )
                .drop("node")
                .join(
                    F.broadcast(keep.select(F.col("src").alias("node"))),
                    F.col("dst") == F.col("node"),
                )
                .drop("node")
            )
        # Materialize the node-sized result BEFORE dropping the cache:
        # `cur` is lazy over the cached edges, so returning it
        # unmaterialized would hand the caller a plan that rebuilds the
        # whole edge table once the finally-block unpersists it.
        out = cur.groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("core_deg")
        )
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()


def _trustrank_oracle() -> str:
    base_total = 15 * PR_SCALE // 100
    sql = f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src),
    n AS (SELECT DISTINCT src AS node FROM e),
    s AS (SELECT node FROM n
          WHERE node % 2 = 0 AND (node // 2) % {BFS_SEED_MOD} = 0),
    r0 AS (
        SELECT n.node,
               CASE WHEN sd.node IS NULL THEN CAST(0 AS BIGINT)
                    ELSE CAST({PR_SCALE} AS BIGINT) END AS rank
        FROM n LEFT JOIN s sd ON sd.node = n.node
    )"""
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        sql += f""",
    r{k} AS (
        SELECT n.node,
               CAST(CASE WHEN sd.node IS NULL THEN 0
                         ELSE {base_total} END
                    + coalesce(c.c, 0) AS BIGINT) AS rank
        FROM n
        LEFT JOIN s sd ON sd.node = n.node
        LEFT JOIN (
            SELECT e.dst AS node,
                   sum((r.rank * 85) // (100 * d.outdeg)) AS c
            FROM {prev} r
            JOIN deg d ON d.node = r.node
            JOIN e ON e.src = r.node
            WHERE r.rank > 0
            GROUP BY e.dst
        ) c ON c.node = n.node
    )"""
        prev = f"r{k}"
    return sql + f"""
    SELECT node, rank FROM {prev} WHERE rank > 0
    ORDER BY rank DESC, node LIMIT {PR_TOPK}"""


@register("q_graph_trustrank", oracle=_trustrank_oracle())
def q_graph_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (seed-personalized PageRank): trust mass starts at
    the seed-customer set and ONLY re-seeds there — the teleport
    vector is the seed set, not uniform — so a node's rank measures
    its random-walk proximity to trusted nodes, the canonical
    crawl-corpus quality propagation (Gyongyi et al.'s TrustRank; the
    uniform-teleport twin is q_graph_pagerank). Same fixed-point
    integer arithmetic and fixed round count; nodes never reached by
    trust stay at exactly 0 and are filtered, so the top-{PR_TOPK}
    output is the trusted neighborhood ranking.

    Teleport variant (ADVICE r5): each seed receives the FULL
    0.15 * PR_SCALE teleport base rather than an equal 1/|seeds| share
    — an unnormalized seed-membership teleport vector. Textbook
    TrustRank normalizes by the seed count, which in exact arithmetic
    only rescales every rank by the same constant; the unnormalized
    form keeps the fixed-point integer ladder seed-count-independent
    (dividing the base by |seeds| would push early-round ranks into
    the floor-division noise floor). Both engines compute the
    identical variant, so the hash check is exact.

    Scale shape: identical to q_graph_pagerank — one src-keyed shuffle
    per round; the zero-rank filter keeps each round's join input to
    the reached frontier (trust spreads like BFS, so early rounds are
    small). Edges hash-partitioned on src once before the loop (r6,
    see q_graph_pagerank). Loop kernel: trustrank_ranks below."""
    return trustrank_ranks(
        purchase_edges(spark, sf_dir),
        (F.col("node") % 2 == 0)
        & ((F.col("node") / 2).cast("long") % BFS_SEED_MOD == 0),
        PR_ITERS,
        PR_TOPK,
    )


def trustrank_ranks(
    edges: DataFrame, seed_pred, iters: int, topk: int
) -> DataFrame:
    """Seed-personalized fixed-point integer PageRank kernel over an
    edge frame (src, dst): trust teleports only to the seed set
    (distinct src nodes satisfying seed_pred over column `node`);
    `iters` rounds; positive-rank top `topk` by (rank desc, node asc).
    Extracted from q_graph_trustrank (semantics + scale notes there)
    for the pure-Python model law in tests/test_properties.py."""
    edges = edges.repartition("src").persist()
    try:
        deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        nodes = edges.select("src").distinct().select(
            F.col("src").alias("node")
        ).localCheckpoint(eager=True)
        is_seed = seed_pred
        base_total = 15 * PR_SCALE // 100
        ranks = nodes.select(
            "node",
            F.when(is_seed, F.lit(PR_SCALE))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rank"),
        )
        for i in range(iters):
            contrib = (
                ranks.filter(F.col("rank") > 0)
                .withColumnRenamed("node", "src")
                .join(deg, "src")
                .join(edges, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("(rank * 85) div (100 * outdeg)").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("c"))
            )
            ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.when(is_seed, F.lit(base_total)).otherwise(F.lit(0))
                    + F.coalesce(F.col("c"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
            # Linear rank lineage — same stride rule as pagerank_ranks
            # (see the comment there); final round always checkpoints.
            if i % PR_CKPT_EVERY == PR_CKPT_EVERY - 1 or i == iters - 1:
                ranks = ranks.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return (
        ranks.filter(F.col("rank") > 0)
        .orderBy(F.desc("rank"), "node")
        .limit(topk)
    )
