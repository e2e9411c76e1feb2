"""Multimodal column declared queries (SURVEY.md §2.C).

Text + embedding modalities live side by side in one row; binary
decode plumbing (images/audio) is in multimodal.py with a stubbed
decoder (the real codec libs aren't in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           CAST(len(e.embedding) AS INTEGER) AS dim,
           CAST(e.embedding[1] AS DOUBLE) AS e0
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text row + embedding vector in one projection: the multimodal
    row shape. 1:1 key join; the embedding side would be bucketed on
    vec_id at scale for a shuffle-free join (float->double cast of the
    first component is exact)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").alias("dim"),
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("e0"),
    )


@register(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE text IS NOT NULL
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing end to end: attach binary column + typed
    metadata, run the Arrow-batched mapInPandas feature kernel
    (deterministic fake standing in for a real decoder — see
    multimodal.py), project a byte-count the oracle can check."""
    from .multimodal import attach_fake_media, extract_features

    d = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(d, "doc_id", "text")
    feats = extract_features(media)
    return feats.select("doc_id", "n_bytes")


@register(
    "q_multimodal_resize",
    oracle="""
    SELECT doc_id, 64 AS width, 64 AS height, 4096 AS n_bytes
    FROM documents WHERE text IS NOT NULL
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage plumbing: every payload normalized to 64x64; the
    oracle checks the contract (fixed output geometry per doc)."""
    from .multimodal import attach_fake_media, resize_images

    d = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(d, "doc_id", "text")
    resized = resize_images(media)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("int").alias("n_bytes"),
    )


@register(
    "q_multimodal_frames",
    oracle="""
    SELECT doc_id, CAST(gs.g AS INTEGER) AS frame_idx
    FROM documents, generate_series(0, 3) gs(g)
    WHERE length(text) > 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 4 frames per non-empty payload (the
    1->n generator shape); oracle checks the fan-out contract."""
    from .multimodal import attach_fake_media, sample_frames

    d = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(d, "doc_id", "text")
    frames = sample_frames(media)
    return frames.select("doc_id", "frame_idx")
