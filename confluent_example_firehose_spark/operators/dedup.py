"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All pure DataFrame ops (higher-order functions + xxhash64) — no Python
in the hot path. The LSH pipeline is the 100 TB path: candidate
generation is a shuffle on (band_id, band_hash) instead of an O(n^2)
cross join; exact verification runs only on bucket-collided pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words(text: Column | str, lowercase: bool = True) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles via slice over a word index range.

    Docs shorter than n words yield an EMPTY shingle set (guarded: a
    bare sequence(1, size-(n-1)) would step backward for short docs —
    sequence(1, 0) is [1, 0] — and make slice() throw)."""
    w = words(text)
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """num_hashes independent min-hashes: h_i(s) = xxhash64(i, s).
    array of longs; one column expression, fully codegen'd."""
    sigs = [
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(i), s)))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Split the signature into `bands` bands of `rows`, hash each band.
    Returns array<struct<band_id int, band_hash bigint>> for explode."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.element_at(sig, b * rows + r + 1) for r in range(rows)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b), deduped across bands.

    Plan shape: per-doc shingles materialized ONCE (narrow) -> signature
    -> explode bands (xB) -> ONE shuffle on (band_id, band_hash) with
    collect_list -> in-bucket pair expansion as an array expression ->
    distinct. No self-join: a self-join would inline the signature
    pipeline into both inputs (2x compute + a giant codegen unit), and
    at 100 TB would shuffle the banded table twice. The groupBy keeps
    per-bucket state to an id list only.

    Skew guard: buckets over `max_bucket` ids are dropped — a
    degenerate band hash (boilerplate text) would otherwise expand
    O(k^2) pairs; near-identical boilerplate is better handled by exact
    dedup upstream. Dropped buckets are the documented trade.
    """
    rows = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_n).alias("_sh"),
    )
    sig = sh.select(
        "_id", minhash_signature(F.col("_sh"), num_hashes).alias("_sig")
    )
    banded = sig.select(
        "_id", F.explode(lsh_bands(F.col("_sig"), bands, rows)).alias("b")
    ).select("_id", "b.band_id", "b.band_hash")
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    # all i<j pairs from the sorted id list, purely expression-side
    n = F.size("ids")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col("ids"), i + 1, n),
                lambda other: F.struct(
                    F.element_at(F.col("ids"), i).alias("id_a"),
                    other.alias("id_b"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays. Integer set sizes;
    the single double division is bit-identical across engines."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return inter / union


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash: sign-sum of per-shingle hash bits.

    For each bit position: count shingles whose xxhash64 has that bit
    set vs total; bit in fingerprint = majority. Expressed as a fold
    over the shingle array accumulating 64 counters would be heavy in
    codegen; instead we use the weight trick: sum(+-1 per bit) via
    aggregate over an array of 64-bit masks. Kept to 64 bits in one
    BIGINT so Hamming distance is two codegen ops (xor + bit_count).
    """
    h = F.transform(shingles, lambda s: F.xxhash64(s))
    bits = []
    for i in range(64):
        cnt = F.aggregate(
            h,
            F.lit(0),
            lambda acc, x: acc
            + F.when(x.bitwiseAND(F.lit(1 << i if i < 63 else -(2**63))) != 0, 1).otherwise(
                -1
            ),
        )
        bits.append(F.when(cnt > 0, F.lit(1 << i if i < 63 else -(2**63))).otherwise(0))
    out = bits[0]
    for bcol in bits[1:]:
        out = out.bitwiseOR(bcol)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
