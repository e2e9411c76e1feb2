"""Semantics pins for the IR queries (ir_queries.py): BM25 ordering on
a hand-built corpus and the TF-IDF rarity inversion. The oracle check
proves engine agreement; these pin intent."""

from __future__ import annotations

from pyspark.sql import functions as F

from confluent_example_firehose_spark.operators import ir_queries as irq


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/documents.parquet")
    return sf


def test_bm25_rewards_tf_and_rarity(spark, tmp_path):
    # 'spark' appears in doc 0 (twice) and doc 1 (once); docs 2..9 are
    # padding. Doc 0 must outrank doc 1; padding docs never appear.
    rows = [
        (0, "spark spark table row"),
        (1, "spark table row scan"),
    ] + [(i, "table row scan agg") for i in range(2, 10)]
    sf = _write_docs(spark, tmp_path, rows)
    out = irq.q_text_bm25(spark, sf).collect()
    assert [r["doc_id"] for r in out] == [0, 1]
    assert out[0]["bm25"] > out[1]["bm25"]
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2


def test_bm25_length_normalization(spark, tmp_path):
    # Same tf, but doc 1 is much longer: BM25's b-term must score the
    # short doc higher.
    rows = [
        (0, "spark table"),
        (1, "spark " + "pad " * 40),
    ] + [(i, "table row") for i in range(2, 6)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r["bm25"] for r in irq.q_text_bm25(spark, sf).collect()}
    assert out[0] > out[1]


def test_tfidf_prefers_rare_terms(spark, tmp_path):
    # 'zebra' appears only in doc 0; 'common' appears everywhere, so
    # its idf is ln(1)=0 and it can never be a top term.
    rows = [(0, "common zebra zebra"), (1, "common pad"), (2, "common pad")]
    sf = _write_docs(spark, tmp_path, rows)
    out = irq.q_text_tfidf(spark, sf).collect()
    doc0 = [r for r in out if r["doc_id"] == 0]
    assert doc0[0]["term"] == "zebra" and doc0[0]["rk"] == 1
    common = [r for r in out if r["term"] == "common"]
    assert all(r["tfidf"] == 0.0 for r in common)


def test_bm25_no_full_corpus_shuffle(spark, sf_dir):
    # The query-term filter must sit below the tf aggregation: the
    # exploded token stream is pruned before any exchange.
    plan = (
        irq.q_text_bm25(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
