"""Statistical scoring operators: corpus-frequency fluency scoring,
closed-form OLS trend fitting, label-centroid separability, and BPE
pair statistics — the model-adjacent measurements a training pipeline
computes with exact-arithmetic determinism.

Determinism rule used throughout (the q_corr_stats pattern): every
accumulation runs on exact integers (counts, fixed-point values,
co-moment sums), doubles enter only in the final closed-form
expression, so Spark and DuckDB are bit-identical regardless of
partitioning/order. Log-probability (perplexity) scoring is
deliberately replaced by relative-frequency scoring: ln() is a libm
call whose last ULP differs between the JVM and C runtimes, and no
amount of rounding makes a transcendental's boundary cases
engine-portable; mean relative bigram frequency ranks documents the
same direction with integer-exact math.

No reference twin (fixed-function consumer); north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import fan_out, words

BPE_TOPK = 20
EMB_FIX = 1000  # fixed-point scale for centroid sums

_WORDS_SQL = "list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f\\v]+'), x -> x <> '')"
_BIGRAMS_SQL = (
    "list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])"
)


@register(
    "q_lm_commonness",
    oracle=f"""
    WITH st AS (
        SELECT doc_id, {_WORDS_SQL} AS w FROM documents
    ),
    tf AS (
        SELECT doc_id, gram, count(*) AS tf
        FROM (SELECT doc_id, unnest({_BIGRAMS_SQL}) AS gram
              FROM st WHERE len(w) >= 2)
        GROUP BY doc_id, gram
    ),
    corpus AS (
        SELECT gram, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY gram
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM corpus)
    SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
           CAST(sum(t.tf * c.cnt) AS BIGINT) AS freq_sum,
           round(CAST(sum(t.tf * c.cnt) AS DOUBLE) / sum(t.tf), 6)
               AS mean_cnt,
           round(CAST(sum(t.tf * c.cnt) AS DOUBLE) * 1000000
                 / (sum(t.tf) * (SELECT total FROM tot)), 6) AS rel_ppm
    FROM tf t JOIN corpus c ON c.gram = t.gram
    GROUP BY t.doc_id
    """,
)
def q_lm_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency fluency score (the deterministic stand-in for
    CCNet-style LM perplexity filtering): each document's mean corpus
    frequency of its bigram INSTANCES — template/boilerplate text made
    of common bigrams scores high, out-of-distribution junk scores low,
    the same ordering signal a small LM gives, with integer-exact math
    (see module docstring for why not log-probabilities).

    Scale shape: instances collapse to (doc, gram) term frequencies
    FIRST (one map-side-combinable agg — the explode runs once), the
    corpus table derives from those tf rows by a second agg, and the
    gram join runs at (doc, gram) granularity with freq_sum recovered
    as sum(tf * cnt) — instance-level work without instance-level join
    fan-in (measured 6.1 s -> ~2 s at sf0.1 vs the instance-join
    shape). Stopword grams are the heavy join keys, but the count side
    is one row per gram — hash-join fan-out, no blowup. Total is a
    broadcast one-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    st = d.select("doc_id", words("text").alias("w")).filter(
        F.size("w") >= 2
    )
    w = F.col("w")
    # total-expression guard (see shingle_strings in curation_queries)
    _gidx = F.when(
        F.size(w) >= 2, F.sequence(F.lit(1), F.size(w) - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(
        _gidx,
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1)
        ),
    )
    tf = (
        st.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("tf"))
    )
    corpus = tf.groupBy("gram").agg(F.sum("tf").alias("cnt"))
    # Corpus-scalar memo (VERDICT r12 item 5): the grand-total branch
    # would otherwise recompute the whole bigram census per run (the
    # census also feeds the per-doc join, so the query paid it twice).
    from ..caching import corpus_scalars

    tot = corpus_scalars(
        spark,
        sf_dir,
        "documents",
        "bigram_total",
        lambda: corpus.agg(F.sum("cnt").alias("total")),
    )
    per_doc = (
        tf.join(corpus, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("cnt")).alias("freq_sum"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_bigrams",
        F.col("freq_sum").cast("long").alias("freq_sum"),
        F.round(
            F.col("freq_sum").cast("double") / F.col("n_bigrams"), 6
        ).alias("mean_cnt"),
        F.round(
            F.col("freq_sum").cast("double")
            * 1_000_000
            / (F.col("n_bigrams") * F.col("total")),
            6,
        ).alias("rel_ppm"),
    )


@register(
    "q_trend_fit",
    oracle="""
    WITH b AS (SELECT min(epoch_us(ts)) AS min_us FROM events),
    t AS (
        SELECT event_type,
               (epoch_us(ts) - (SELECT min_us FROM b)) // 3600000000
                   AS x_hr,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    ),
    g AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x_hr) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x_hr * y) AS BIGINT) AS sxy,
               CAST(sum(x_hr * x_hr) AS BIGINT) AS sxx
        FROM t GROUP BY event_type
    )
    SELECT event_type, n,
           round((CAST(sxy AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                 / nullif(CAST(sxx AS DOUBLE) / n
                          - (CAST(sx AS DOUBLE) / n)
                            * (CAST(sx AS DOUBLE) / n), 0),
                 6) AS slope_cents_per_hr,
           round(CAST(sy AS DOUBLE) / n
                 - ((CAST(sxy AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                    / nullif(CAST(sxx AS DOUBLE) / n
                             - (CAST(sx AS DOUBLE) / n)
                               * (CAST(sx AS DOUBLE) / n), 0))
                   * (CAST(sx AS DOUBLE) / n),
                 6) AS intercept_cents
    FROM g
    """,
)
def q_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS trend per event type: value (exact cents) versus
    hours since the corpus start, slope and intercept derived from
    exact integer co-moment sums — distributed linear regression the
    order-independent way (same pattern as q_corr_stats; a chained
    float fold would be partition-order-dependent). Hour granularity
    keeps x*x sums within BIGINT headroom for ~1e9-row groups; beyond
    that the sums swap to DECIMAL(38,0), shape unchanged.

    Scale shape: the global min timestamp is one broadcast scalar; the
    co-moments are one map-side-combinable aggregate on a tiny key."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min(F.unix_micros("ts")).alias("min_us"))
    t = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.expr("(unix_micros(ts) - min_us) div 3600000000").alias("x_hr"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    g = t.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x_hr").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x_hr") * F.col("y")).alias("sxy"),
        F.sum(F.col("x_hr") * F.col("x_hr")).alias("sxx"),
    )
    n = F.col("n")
    mx, my = F.col("sx").cast("double") / n, F.col("sy").cast("double") / n
    cov = F.col("sxy").cast("double") / n - mx * my
    vx = F.col("sxx").cast("double") / n - mx * mx
    slope = cov / F.nullif(vx, F.lit(0.0))
    return g.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_cents_per_hr"),
        F.round(my - slope * mx, 6).alias("intercept_cents"),
    )


@register(
    "q_label_centroids",
    oracle=f"""
    WITH u AS (
        SELECT label, unnest(list_transform(range(1, len(embedding) + 1),
                   i -> {{'pos': i,
                          'val': CAST(round(CAST(embedding[i] AS DOUBLE)
                                            * {EMB_FIX}) AS BIGINT)}}))
                   AS e
        FROM embeddings
    ),
    s AS (
        SELECT CAST(label AS BIGINT) AS label, e.pos AS pos,
               CAST(sum(e.val) AS BIGINT) AS s
        FROM u GROUP BY label, e.pos
    ),
    dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(sum(a.s * b.s) AS BIGINT) AS dot_ab
        FROM s a JOIN s b ON a.pos = b.pos AND a.label <= b.label
        GROUP BY a.label, b.label
    ),
    norms AS (
        SELECT label_a AS label, dot_ab AS aa FROM dots
        WHERE label_a = label_b
    )
    SELECT d.label_a, d.label_b,
           round(CAST(d.dot_ab AS DOUBLE)
                 / (sqrt(CAST(na.aa AS DOUBLE))
                    * sqrt(CAST(nb.aa AS DOUBLE))), 6) AS centroid_cos
    FROM dots d
    JOIN norms na ON na.label = d.label_a
    JOIN norms nb ON nb.label = d.label_b
    WHERE d.label_a < d.label_b
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separability audit: cosine between per-label embedding
    centroids for every label pair — the cheap embedding-space health
    check (collapsed classes → cosines near 1) run before training a
    classifier head. Centroid sums are fixed-point integers
    (round(x*{EMB_FIX})), dot products are exact integer sums (cosine
    is scale-invariant, so the un-normalized sums ARE the centroids for
    this purpose), and doubles appear only under the final sqrt.
    BIGINT headroom holds to ~1e5 vectors/label at this scale factor;
    past that the sums swap to DECIMAL(38,0).

    Scale shape: posexplode → (label, pos) hash agg is one shuffle of
    n_vectors x dims rows with full map-side combine; the pair join
    runs on the labels x dims aggregate (bounded by construction)."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * EMB_FIX).cast("long"),
            )
        ).alias("pos0", "val"),
    )
    s = (
        u.select("label", (F.col("pos0") + 1).alias("pos"), "val")
        .groupBy("label", "pos")
        .agg(F.sum("val").alias("s"))
    )
    a = s.select(
        F.col("label").alias("label_a"),
        F.col("pos"),
        F.col("s").alias("sa"),
    )
    b = s.select(
        F.col("label").alias("label_b"),
        F.col("pos").alias("pos_b"),
        F.col("s").alias("sb"),
    )
    dots = (
        a.join(
            b,
            (a.pos == b.pos_b) & (a.label_a <= b.label_b),
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot_ab"))
    )
    norms = dots.filter(F.col("label_a") == F.col("label_b")).select(
        F.col("label_a").alias("label"), F.col("dot_ab").alias("aa")
    )
    na = norms.select(
        F.col("label").alias("label_a"), F.col("aa").alias("na")
    )
    nb = norms.select(
        F.col("label").alias("label_b"), F.col("aa").alias("nb")
    )
    return (
        dots.filter(F.col("label_a") < F.col("label_b"))
        .join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot_ab").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("centroid_cos"),
        )
    )


@register(
    "q_bpe_pairs",
    oracle=f"""
    WITH w AS (
        SELECT unnest({_WORDS_SQL}) AS word FROM documents
    ),
    p AS (
        SELECT unnest(list_transform(range(1, length(word)),
                                     i -> substr(word, i, 2))) AS pair
        FROM w WHERE length(word) >= 2
    ),
    c AS (
        SELECT pair, count(*) AS cnt FROM p GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT {BPE_TOPK}
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT)
               AS rank,
           pair, cnt
    FROM c
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training step 1: the adjacent character-pair frequency table
    over in-word positions — the statistic byte-pair-encoding greedily
    merges on. Top {BPE_TOPK} pairs by (count desc, pair asc): a total
    order, so the LIMIT'd set is deterministic.

    Scale shape: two explodes (words, then in-word char pairs) feeding
    one map-side-combinable count; top-K is orderBy().limit() =
    TakeOrderedAndProject (the r3 lesson: never a global window over
    the full pair vocabulary); the rank window runs on {BPE_TOPK}
    surviving rows."""
    d = load_table(spark, sf_dir, "documents")
    wtab = d.select(F.explode(words("text")).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.col("word").substr(i, F.lit(2)),
    )
    c = (
        wtab.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(BPE_TOPK)
    )
    rank = F.row_number().over(W.orderBy(F.desc("cnt"), "pair"))
    return c.select(rank.cast("long").alias("rank"), "pair", "cnt")


BPE_ROUNDS = 8

# Token-stream encoding for exact greedy BPE merges in BOTH engines:
# a word's tokens are joined with DOUBLED separators ('§§a§§b§§...').
# Merging pair (a, b) is then the plain (non-regex) string replace of
# '§a§§b§' with '§ab§' — each match consumes one '§' from each side's
# doubled separator, so adjacent candidate matches never share a
# character and SQL replace()'s left-to-right non-overlapping scan IS
# the greedy BPE merge (probed identical in Spark and DuckDB,
# including the overlap case '§§a§§a§§a§§' -> '§§aa§§a§§'). '§' is
# absent from the corpus (probed; an ingest guard would enforce it).


def _bpe_oracle() -> str:
    sql = """
    WITH w0 AS (
        SELECT '§§' || regexp_replace(word, '(.)', '\\1§§', 'g') AS w
        FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f\\v]+'),
                                        x -> x <> '')) AS word
              FROM documents)
    )"""
    # MATERIALIZED: w{k} is referenced by both c{k+1} and w{k+1} (and
    # c{k} three times via scalar subqueries) — without the hint DuckDB
    # may inline each reference and re-derive the whole merge lineage
    # per round, the exact O(rounds^2) recompute the Spark side's
    # per-round persist avoids.
    for k in range(1, BPE_ROUNDS + 1):
        sql += f""",
    c{k} AS MATERIALIZED (
        SELECT pair, count(*) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1]))
                       AS pair
            FROM (SELECT list_filter(string_split(w, '§§'),
                                     x -> x <> '') AS t
                  FROM w{k - 1})
        ) GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1
    ),
    w{k} AS MATERIALIZED (
        SELECT replace(w,
            '§' || string_split((SELECT pair FROM c{k}), ' ')[1]
                || '§§'
                || string_split((SELECT pair FROM c{k}), ' ')[2] || '§',
            '§' || replace((SELECT pair FROM c{k}), ' ', '') || '§') AS w
        FROM w{k - 1}
    )"""
    parts = [
        f"SELECT CAST({k} AS BIGINT) AS round, pair, cnt FROM c{k}"
        for k in range(1, BPE_ROUNDS + 1)
    ]
    return sql + "\n    " + "\n    UNION ALL ".join(parts)


@register("q_bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE training ({BPE_ROUNDS} merge rounds): each round
    takes the most frequent adjacent token pair (count desc, pair asc
    — a total order) and merges EVERY greedy left-to-right occurrence
    corpus-wide, re-counting on the merged stream — the actual
    tokenizer-training loop, of which q_bpe_pairs is the single-round
    census. The merge itself is a narrow JVM string replace over the
    doubled-separator encoding (see _bpe_oracle's comment), so the
    oracle replays the identical rounds with scalar-subquery-fed
    replaces and the outputs hash-match exactly.

    Scale shape (r6 pair-DELTA census, the SCALE.md roadmap step): the
    full pair census — explode every adjacent pair in the corpus and
    shuffle-count it — runs ONCE. Merging pair P only changes counts
    of pairs adjacent to an occurrence of P, and exactly per word:
    census(new) = census(old) - pairs(matched words, before)
    + pairs(matched words, after). Each round therefore keeps a
    vocabulary-bounded (pair, cnt) table up to date by exploding ONLY
    the words that contain the merge pattern (a narrow contains()
    filter over the cached stream), and full-outer-merging that delta
    in — the per-round shuffle shrinks from every pair instance in
    the corpus to the delta set + the pair-vocabulary merge. The
    argmax stays TakeOrdered(1) on the counts table. The merged
    stream and counts table are PERSISTED per round (r6, VERDICT r5
    item 4) with a parent/child cache window, so total work is
    O(rounds) narrow replaces + O(rounds) delta shuffles — the shape
    a thousands-of-rounds tokenizer trainer needs. The merge sequence
    and counts are bit-identical to full re-census (per-word delta
    exactness), so the oracle's full-recount replay still
    hash-matches."""
    # fan_out: documents is one parquet file at test SFs, so without a
    # repartition the whole loop runs ~2 tasks wide (measured: the full
    # census alone took 4.8 s at sf0.1 on the unfanned stream, 1.8 s
    # fanned; the delta round 2.8 s -> 0.5 s)
    d = fan_out(load_table(spark, sf_dir, "documents"))
    st = d.select(F.explode(words("text")).alias("word")).select(
        F.concat(
            F.lit("§§"), F.regexp_replace("word", "(.)", "$1§§")
        ).alias("w")
    )
    return bpe_merge_rounds(st, BPE_ROUNDS)


def bpe_merge_rounds(st: DataFrame, rounds: int) -> DataFrame:
    """BPE merge-training kernel over a doubled-separator token stream
    (column `w`, one word per row, '§§a§§b§§' encoding — see
    _bpe_oracle's comment): `rounds` rounds of corpus-wide argmax +
    greedy merge with the r6 pair-DELTA census and parent/child cache
    window (mechanics and scale notes in q_bpe_merges). Returns
    (round, pair, cnt). Extracted from q_bpe_merges so the delta
    census is directly property-testable against a pure-Python
    full-recensus BPE trainer (tests/test_properties.py). Stops early
    (fewer than `rounds` result rows) when the pair census runs dry —
    a corpus can exhaust its mergeable pairs before the round budget."""
    spark = st.sparkSession
    st = st.persist()

    def pair_arr(col: Column) -> Column:
        t = F.filter(F.split(col, "§§"), lambda x: x != "")
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))

    counts = (
        st.select(F.explode(pair_arr(F.col("w"))).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    streams, countss = [st], [counts]
    results = []
    for k in range(1, rounds + 1):
        top = counts.orderBy(F.desc("cnt"), "pair").limit(1).first()
        # Cache-window accounting (r7, ADVICE r6): round k's argmax
        # materializes counts_{k-1}, whose delta branch reads the
        # PARENT stream st_{k-2} — the newest stream st_{k-1} is still
        # unmaterialized at this point (nothing in counts_{k-1}'s
        # lineage touches it). The stream window must therefore stay
        # 2 deep: popping to 1 here would unpersist the materialized
        # parent and leave only the lazy child, which would then
        # recompute from the raw scan (O(rounds^2) total work, the r6
        # off-by-one). With a 2-deep window, st_{k-1} materializes from
        # st_{k-2}'s cache at round k+1's argmax with exactly one
        # narrow replace. The counts window CAN stay 1 deep because
        # the argmax directly materializes the newest counts table.
        while len(streams) > 2:
            streams.pop(0).unpersist()
        while len(countss) > 1:
            countss.pop(0).unpersist()
        if top is None:
            break  # census ran dry: every word is a single token
        pa, pb = top["pair"].split(" ")
        results.append((k, top["pair"], top["cnt"]))
        if k == rounds:
            break  # the last argmax needs no merged stream
        # typed F.replace (not an interpolated F.expr): corpus tokens
        # may contain quote characters, which must stay data, not SQL
        pat, rep = F.lit(f"§{pa}§§{pb}§"), F.lit(f"§{pa}{pb}§")
        matched = st.filter(F.col("w").contains(f"§{pa}§§{pb}§"))
        delta = (
            matched.select(
                F.explode(
                    F.concat(
                        F.transform(
                            pair_arr(F.col("w")),
                            lambda p: F.struct(
                                p.alias("pair"), F.lit(-1).alias("d")
                            ),
                        ),
                        F.transform(
                            pair_arr(F.replace(F.col("w"), pat, rep)),
                            lambda p: F.struct(
                                p.alias("pair"), F.lit(1).alias("d")
                            ),
                        ),
                    )
                ).alias("pd")
            )
            .select(F.col("pd.pair").alias("pair"), F.col("pd.d").alias("d"))
            .groupBy("pair")
            .agg(F.sum("d").alias("d"))
        )
        counts = (
            counts.join(delta, "pair", "full_outer")
            .select(
                "pair",
                (
                    F.coalesce(F.col("cnt"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                ).cast("long").alias("cnt"),
            )
            .filter(F.col("cnt") > 0)
            .persist()
        )
        countss.append(counts)
        st = st.select(F.replace(F.col("w"), pat, rep).alias("w")).persist()
        streams.append(st)
    for c in streams + countss:
        c.unpersist()
    return spark.createDataFrame(
        results, "round long, pair string, cnt long"
    )


def _bpe_encode_oracle() -> str:
    """q_bpe_encode's oracle: the _bpe_oracle merge ladder with doc_id
    carried through every w{k} CTE, finishing with a per-document
    token count instead of the merge table. Each round's replace is
    guarded for the census-ran-dry case (empty c{k} -> scalar
    subqueries NULL -> replace would NULL the stream; the Spark side
    simply stops applying merges there)."""
    sql = """
    WITH w0 AS MATERIALIZED (
        SELECT doc_id,
               '§§' || regexp_replace(word, '(.)', '\\1§§', 'g') AS w
        FROM (SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f\\v]+'),
                                        x -> x <> '')) AS word
              FROM documents)
    )"""
    for k in range(1, BPE_ROUNDS + 1):
        sql += f""",
    c{k} AS MATERIALIZED (
        SELECT pair, count(*) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1]))
                       AS pair
            FROM (SELECT list_filter(string_split(w, '§§'),
                                     x -> x <> '') AS t
                  FROM w{k - 1})
        ) GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1
    ),
    w{k} AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN (SELECT count(*) FROM c{k}) = 0 THEN w
               ELSE replace(w,
                   '§' || string_split((SELECT pair FROM c{k}), ' ')[1]
                       || '§§'
                       || string_split((SELECT pair FROM c{k}), ' ')[2]
                       || '§',
                   '§' || replace((SELECT pair FROM c{k}), ' ', '')
                       || '§')
               END AS w
        FROM w{k - 1}
    )"""
    return sql + f"""
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(list_filter(string_split(w, '§§'),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens
    FROM w{BPE_ROUNDS} GROUP BY doc_id
    """


@register("q_bpe_encode", oracle=_bpe_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the other half of q_bpe_merges' train loop:
    train {BPE_ROUNDS} merges on the corpus, then ENCODE every
    document with them and report per-doc word and BPE-token counts
    (the pretraining-cost accounting every data pipeline runs before
    a training job). The merge list is collected to the driver — it is
    vocabulary-sized by definition (rounds rows; a production
    tokenizer's merge table is exactly such a shipped artifact), so
    the collect is bounded regardless of corpus size.

    Scale shape: training is the r6 pair-delta census (see
    q_bpe_merges); ENCODING is a chain of `rounds` narrow JVM string
    replaces over the doubled-separator word stream — zero shuffles —
    followed by ONE map-side-combined per-doc count aggregation. At
    100 TB the encode pass is embarrassingly parallel and the only
    exchange carries (doc_id, counts) rows. The oracle replays the
    identical ladder with doc_id carried through (dry-census rounds
    guarded on both sides: the trainer stops early, the oracle's CASE
    keeps the stream unchanged)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    st = d.select(F.explode(words("text")).alias("word")).select(
        F.concat(
            F.lit("§§"), F.regexp_replace("word", "(.)", "$1§§")
        ).alias("w")
    )
    # rounds-bounded collect: the trained merge table IS the artifact
    merges = sorted(
        bpe_merge_rounds(st, BPE_ROUNDS).collect(),
        key=lambda r: r["round"],
    )
    enc = d.select("doc_id", F.explode(words("text")).alias("word")).select(
        "doc_id",
        F.concat(
            F.lit("§§"), F.regexp_replace("word", "(.)", "$1§§")
        ).alias("w"),
    )
    for r in merges:
        pa, pb = r["pair"].split(" ")
        enc = enc.select(
            "doc_id",
            F.replace(
                F.col("w"),
                F.lit(f"§{pa}§§{pb}§"),
                F.lit(f"§{pa}{pb}§"),
            ).alias("w"),
        )
    return enc.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(
            F.size(F.filter(F.split("w", "§§"), lambda x: x != ""))
        )
        .cast("long")
        .alias("n_tokens"),
    )
