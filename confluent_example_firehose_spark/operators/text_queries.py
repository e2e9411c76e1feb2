"""Text analysis declared queries (SURVEY.md §2.C) over `documents`:
tokenization, quality scoring, language-ID heuristic, fingerprinting.
All integer-arithmetic + single-division shapes -> oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import words

STOPWORDS = ("a", "the")


@register(
    "q_text_tokens",
    oracle="""
    SELECT word, count(*) AS n
    FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS word
        FROM documents
    )
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenize -> explode -> count: top-50 vocabulary.
    Explode multiplies rows but map-side combine collapses to distinct
    words per task before the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(50)
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs —
# the GPT-2-style split minus lookaheads, so the pattern means the same
# thing under Java regex (Spark) and RE2 (DuckDB).
_BPE_PAT = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


@register(
    "q_text_tokens_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-zA-Z]+$')))
                AS BIGINT) AS n_alpha,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$')))
                AS BIGINT) AS n_num,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_vocab
    FROM (
        SELECT doc_id, regexp_extract_all(text, '{_BPE_PAT}') AS toks
        FROM documents
    )
    """,
)
def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (BPE-style pre-tokenizer) token counting per document —
    the training-data token budget estimator. Tokens materialized once
    (withColumn), then counted by class; narrow plan, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn(
        "toks", F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    )
    alpha = F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[a-zA-Z]+$")))
    num = F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[0-9]+$")))
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        alpha.cast("long").alias("n_alpha"),
        num.cast("long").alias("n_num"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_vocab"),
    )


@register(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
           CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
               / len(ws) AS avg_word_len,
           CAST(len(list_filter(ws, x -> x IN ('a', 'the'))) AS DOUBLE)
               / len(ws) AS stop_ratio,
           CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr
    FROM (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        FROM documents
    )
    WHERE len(ws) > 0
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token counts, type-token ratio, stopword ratio,
    mean word length — the standard pre-training corpus filters. All
    per-row array math inside codegen; no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    ws = words("text")
    d = d.withColumn("ws", ws).filter(F.size("ws") > 0)
    n = F.size("ws")
    n_distinct = F.size(F.array_distinct(F.col("ws")))
    total_len = F.aggregate(
        F.transform(F.col("ws"), lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(
        F.filter(F.col("ws"), lambda w: w.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        n_distinct.cast("long").alias("n_distinct"),
        (total_len.cast("double") / n).alias("avg_word_len"),
        (n_stop.cast("double") / n).alias("stop_ratio"),
        (n_distinct.cast("double") / n).alias("ttr"),
    )


@register(
    "q_text_langid",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN CAST(len(list_filter(ws, x -> x IN ('a', 'the')))
                     AS DOUBLE) / len(ws) >= 0.05
                THEN 'en_like' ELSE 'other' END AS pred
    FROM (
        SELECT doc_id, lang,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        FROM documents
    )
    WHERE len(ws) > 0
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic (the classic cheap filter:
    stopword density thresholding). Real models plug in at the same
    spot as a pandas UDF; the Spark plumbing is identical."""
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("ws", words("text")).filter(F.size("ws") > 0)
    stop_ratio = (
        F.size(
            F.filter(
                F.col("ws"), lambda w: w.isin(*[F.lit(s) for s in STOPWORDS])
            )
        ).cast("double")
        / F.size("ws")
    )
    return d.select(
        "doc_id",
        "lang",
        F.when(stop_ratio >= 0.05, "en_like").otherwise("other").alias("pred"),
    )


@register(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS BIGINT) AS n_words
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 is standardized -> identical digests
    across engines (unlike engine-native hash functions). xxhash64/
    SimHash variants live in dedup.py for in-engine use."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(words("text")).cast("long").alias("n_words"),
    )
