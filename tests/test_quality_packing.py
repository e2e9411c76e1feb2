"""Unit tests for the corpus-quality (quality_queries.py) and sequence
packing (packing_queries.py) operators on hand-built frames; the
differential gate is tools/check_oracle.py."""

from __future__ import annotations

from confluent_example_firehose_spark.operators.packing_queries import (
    BATCH_SIZE,
    PACK_BUDGET,
    next_fit_bins,
    q_pack_epoch_shuffle,
    q_pack_firstfit,
)
from confluent_example_firehose_spark.operators.quality_queries import (
    repetition_profile,
)


def test_repetition_profile_hand_values(spark):
    # "a a a b": 4 words, 2 distinct, top unigram a=3 -> 0.75
    # bigrams: "a a", "a a", "a b" -> top 2/3 -> 0.666667; flagged
    # doc 2 needs >= 15 distinct words: an all-distinct n-word doc has
    # top_unigram_frac 1/n and top_bigram_frac 1/(n-1), which must both
    # clear the 0.12 / 0.08 thresholds to stay unflagged
    distinct15 = " ".join(f"w{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, distinct15)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in repetition_profile(docs).collect()}
    r1 = got[1]
    assert r1["n_words"] == 4
    assert r1["n_distinct"] == 2
    assert r1["distinct_ratio"] == 0.5
    assert r1["top_unigram_frac"] == 0.75
    assert r1["top_bigram_frac"] == 0.666667
    assert r1["flag_repetitive"] == 1
    r2 = got[2]
    assert r2["n_distinct"] == 15
    assert r2["distinct_ratio"] == 1.0
    assert r2["flag_repetitive"] == 0


def test_next_fit_respects_budget_and_order():
    toks = [100, 100, 100, 50, 200, 300, 10]
    bins = next_fit_bins(toks, budget=256)
    # greedy: [100,100] | [100,50] | [200] | [300] | [10]
    assert bins == [0, 0, 1, 1, 2, 3, 4]
    # invariants: bin ids are non-decreasing and contiguous
    assert bins == sorted(bins)
    assert set(bins) == set(range(max(bins) + 1))
    # every multi-item bin fits the budget (oversized items sit alone)
    for b in set(bins):
        items = [t for t, bb in zip(toks, bins) if bb == b]
        assert sum(items) <= 256 or len(items) == 1


def test_next_fit_zero_tokens_never_close_bins():
    assert next_fit_bins([0, 0, 0], budget=10) == [0, 0, 0]
    # an oversized doc lands alone; a following zero-doc joins its bin
    assert next_fit_bins([20, 0, 5], budget=10) == [0, 1, 1]


def test_pack_firstfit_matches_kernel_on_testdata(spark, sf_dir):
    rows = q_pack_firstfit(spark, sf_dir).collect()
    # per (shard, bin): fits budget unless a lone oversized doc
    for r in rows:
        assert r["tok_sum"] <= PACK_BUDGET or r["n_docs"] == 1
        assert r["first_doc"] <= r["last_doc"]
    shards = {r["shard"] for r in rows}
    assert shards <= set(range(8))


def test_epoch_shuffle_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q_pack_epoch_shuffle(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_pack_epoch_shuffle(spark, sf_dir).collect()))
    assert a == b
    # every full batch holds exactly BATCH_SIZE docs; at most one
    # partial batch (the last) per shard
    by_shard: dict[str, list] = {}
    for r in a:
        by_shard.setdefault(r[0], []).append(r)
    for shard, batches in by_shard.items():
        partial = [r for r in batches if r[2] != BATCH_SIZE]
        assert len(partial) <= 1


def test_source_norm_histogram_equals_direct_window(spark, sf_dir):
    """The histogram-contracted percent_rank (window over per-source
    DISTINCT scores + cumulative counts, then join back) equals the
    direct per-doc window percent_rank PARTITION BY source ORDER BY
    score — the law that lets the operator avoid sorting a hot
    source's every document in one task. Ties share the min rank in
    both formulations, so equality is exact, not approximate."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.catalog import load_table
    from confluent_example_firehose_spark.operators.dedup import words
    from confluent_example_firehose_spark.registry import query_fns

    got = {
        (r["doc_id"], r["score"], r["src_pct"])
        for r in query_fns()["q_quality_source_norm"](
            spark, sf_dir
        ).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("ws", words("text")).filter(F.size("ws") > 0)
    direct = (
        d.select(
            "doc_id",
            "source",
            F.round(
                F.size(F.array_distinct("ws")).cast("double")
                / F.size("ws"),
                6,
            ).alias("score"),
        )
        .withColumn(
            "pct",
            F.percent_rank().over(
                W.partitionBy("source").orderBy("score")
            ),
        )
        .filter(F.col("pct") >= 0.5)
    )
    want = {
        (r["doc_id"], r["score"], round(r["pct"], 6))
        for r in direct.collect()
    }
    assert got == want


def test_source_norm_keeps_null_source_partition(spark, tmp_path):
    """NULL-source docs form their own rank partition in BOTH engines
    (DuckDB PARTITION BY groups NULLs; Spark too) — the join-back must
    be null-SAFE or they silently vanish from the Spark side only.
    Three null-source docs with distinct scores: the top two (pct 0.5
    and 1.0) must survive."""
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.registry import query_fns

    rows = [
        (1, "a a a a", None),          # ttr 0.25
        (2, "a b a b", None),          # ttr 0.5
        (3, "a b c d", None),          # ttr 1.0
        (4, "x y z w", "s1"),          # lone doc in s1 -> pct 0
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: (r["src_pct"], r["source"])
        for r in query_fns()["q_quality_source_norm"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {2: (0.5, None), 3: (1.0, None)}
