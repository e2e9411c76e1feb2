"""Multi-probe LSH: measured recall against the exact top-k, pinned to
dominate single-probe (the property that justifies the 9x candidate
cost)."""

from __future__ import annotations

from confluent_example_firehose_spark.operators.similarity_queries import (
    q_similarity_lsh,
    q_similarity_lsh_multiprobe,
    q_similarity_topk,
)


def _neighbor_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    exact = _neighbor_sets(q_similarity_topk(spark, sf_dir))
    single = _neighbor_sets(q_similarity_lsh(spark, sf_dir))
    multi = _neighbor_sets(q_similarity_lsh_multiprobe(spark, sf_dir))

    def recall(approx):
        num = sum(len(approx.get(q, set()) & ex) for q, ex in exact.items())
        den = sum(len(ex) for ex in exact.values())
        return num / den

    r1, r9 = recall(single), recall(multi)
    # multi-probe candidates are a superset: recall can only improve
    assert r9 >= r1
    # Per-query exact-hit dominance (ADVICE r4 replaced a tautology):
    # an exact-top-k member is beaten by fewer than k vectors globally,
    # so it survives the (total-order) rank in ANY candidate pool that
    # contains it — multi's pool contains single's, hence every exact
    # hit single finds, multi must find too. This is provable on the
    # top-k OUTPUTS, unlike raw top-k set containment (ties aside, a
    # better candidate pool may push non-exact filler out of the k).
    for q, ex in exact.items():
        assert (single.get(q, set()) & ex) <= (multi.get(q, set()) & ex)
    # and it must find something for every query
    assert set(multi) == set(exact)


def test_mmr_diversity_beats_redundant_duplicate(spark):
    """MMR's second pick must skip an exact duplicate of the first pick
    when a moderately relevant but diverse vector is available."""
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.functions.vector import norm2
    from confluent_example_firehose_spark.operators.similarity_queries import (
        mmr_select,
    )

    rows = [
        (1, [0.9, 0.43589, 0.0]),   # most relevant to q=[1,0,0]
        (2, [0.9, 0.43589, 0.0]),   # exact duplicate of 1
        (3, [0.7, -0.71, 0.1]),     # diverse, still relevant
    ]
    q = [1.0, 0.0, 0.0]
    e = spark.createDataFrame(rows, ["vec_id", "v"])

    def cos(a, b):
        import math

        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    rel = e.select(
        "vec_id",
        F.lit(None).cast("double").alias("rel"),
        F.col("v").cast("array<double>").alias("v"),
    )
    rel = rel.withColumn("nv", norm2(F.col("v")))
    rel = rel.withColumn(
        "rel",
        F.when(F.col("vec_id") == 1, F.lit(cos(rows[0][1], q)))
        .when(F.col("vec_id") == 2, F.lit(cos(rows[1][1], q)))
        .otherwise(F.lit(cos(rows[2][1], q))),
    )
    picked = mmr_select(rel, 3)
    order = [vid for _, vid, _ in picked]
    # step1: id 1 (tie with 2 broken by id); step2: diverse id 3 beats
    # the duplicate (0.7*0.9 - 0.3*1.0 = 0.33 < 0.7*0.7 - 0.3*~0.32);
    # step3: the duplicate last
    assert order == [1, 3, 2]


def test_mmr_exhausts_gracefully(spark):
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.functions.vector import norm2
    from confluent_example_firehose_spark.operators.similarity_queries import (
        mmr_select,
    )

    e = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "v"])
    rel = e.select(
        "vec_id",
        F.lit(0.5).alias("rel"),
        F.col("v").cast("array<double>").alias("v"),
    ).withColumn("nv", norm2(F.col("v")))
    picked = mmr_select(rel, 5)
    assert [vid for _, vid, _ in picked] == [1]
