"""Corpus dedup and admission control AT INGEST — the dedup, clustering,
and curation members of the streaming-maintenance family (sketches:
bloom/cms/hll/quantile; lexical index: q_index_stream; vector index:
q_ann_index_stream; near-dup index, duplicate-cluster union-find, and
quality/dedup admission here complete the set). The reference engine's premise is incremental
keyed state over a micro-batched ingest
(`AbstractPrometheusFirehose.java:41-51`,
`AbstractFirehose.java:107-131`); this is its dedup-index analogue and
the shape every 100 TB training-data pipeline actually runs: new
documents are checked against a maintained MinHash-LSH index as they
arrive — history is never re-shingled, and the all-pairs batch job
(q_dedup_near) is replaced by an O(batch x collided-buckets) probe per
epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import (
    doc_shingle_hashes,
    jaccard,
    lsh_bands,
    minhash_signature,
)
from .sketch_stream_queries import SK_BATCHES, stage_key_batches

NEAR_STREAM_JAC = 0.2  # same verify threshold as q_dedup_near

# Stored class-pair relation of the last q_dedup_near_stream run, for
# the law test (both orientations present; every cross-class emission
# maps into it) — SF-test-bounded, same stance as LAST_CLUSTER_STATE.
LAST_CLASS_PAIRS: list = []
NEAR_STREAM_HASHES = 32  # same 32-minhash / 8-band scheme
NEAR_STREAM_BANDS = 8
# Bucket skew cap, the q_dedup_near trade at ingest. Since the r11
# contraction the count is distinct CONTENTS (classes) per band
# bucket, measured over state PLUS the probing epoch's new classes —
# the bucket's true candidate-generation cost this epoch (new-vs-new
# class pairs must be verified on arrival, so they occupy the bucket
# too). A bucket over the cap is skipped for the epoch, and because a
# class pair is verified only when its younger class arrives, a
# suppressed bucket's pairs stay unverified — the same permanence any
# occupancy cap has on a grow-only index (the pre-r11 per-doc form
# suppressed every later arrival at that bucket too, and duplicate
# MASS can no longer be what fills it). Vacuous at the test SFs (no
# bucket approaches 64 distinct near-dup contents — the q_dedup_near
# max_bucket=64 stance); the oracle therefore replays the uncapped
# semantics, and a corpus where the cap engages is the documented
# boilerplate-band recall trade, not a silent bug.
NEAR_STREAM_BUCKET_CAP = 64

# Admitted-fp state compaction cadence (ADVICE r10 item 2): appended
# rows are globally unique by construction (batch-distinct + left_anti
# vs the state, and epochs are strictly sequential), so append-only is
# CORRECT every epoch; compaction is small-file consolidation only and
# runs every N epochs instead of rewriting the O(total state) relation
# per micro-batch. 2 keeps both the append-only path and the
# consolidation path exercised inside the SK_BATCHES=4 driver window.
CURATION_COMPACT_EVERY = 2


def _assert_batch_membership(batch_df: DataFrame, b: int) -> None:
    """ADVICE r10 item 3: the local epoch counter assumes the staged
    files replay in doc_id % SK_BATCHES order; a retried/replayed
    foreachBatch invocation (or an mtime-order drift in the staging)
    would silently misalign batch ids against the oracles' % census.
    One batch-sized agg turns that drift into a loud failure."""
    mis = batch_df.agg(
        F.coalesce(
            F.sum((F.col("doc_id") % SK_BATCHES != b).cast("long")),
            F.lit(0),
        ).alias("mis")
    ).first()["mis"]
    if mis:
        raise RuntimeError(
            f"micro-batch {b} contains {mis} rows whose doc_id % "
            f"{SK_BATCHES} != {b}: epoch counter / staged-file order "
            "drift — batch ids no longer match the oracle census"
        )


@register(
    "q_dedup_near_stream",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, doc_id % {SK_BATCHES} AS b_id,
               list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f\\v]+'), x -> x <> '')
                   AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id, b_id,
               list_distinct([array_to_string(ws[i:i+2], ' ')
                              for i in range(1, len(ws)-1)]) AS s
        FROM w WHERE len(ws) >= 3
    )
    SELECT batch_id, doc_id, dup_of, jac FROM (
        SELECT CAST(n.b_id AS BIGINT) AS batch_id,
               n.doc_id AS doc_id, o.doc_id AS dup_of,
               round(CAST(len(list_intersect(n.s, o.s)) AS DOUBLE)
                     / (len(n.s) + len(o.s)
                        - len(list_intersect(n.s, o.s))), 6) AS jac
        FROM sh n JOIN sh o ON o.b_id < n.b_id
    ) WHERE jac >= {NEAR_STREAM_JAC}
    """,
)
def q_dedup_near_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection at ingest: documents arrive as
    SK_BATCHES micro-batches (doc_id % SK_BATCHES, the file-stream twin
    of a Kafka ingest); each foreachBatch epoch shingles ITS batch
    only, probes the maintained LSH index (band postings from all
    EARLIER epochs) for candidates, verifies candidates by exact
    hashed-shingle Jaccard against the maintained shingle state, emits
    the hits, and then appends its own band postings + shingle sets to
    the index. Returns (batch_id, doc_id, dup_of, jac): every new doc
    paired with every already-ingested near-duplicate (jac >=
    {NEAR_STREAM_JAC}), i.e. the rows an ingest pipeline would use to
    drop or link arrivals. Within-batch duplicates are intentionally
    not emitted (both docs are new; the strictly-earlier semantics
    make the output a pure function of the batch partition).

    Hash-checked law: the emitted set equals the exact cross-epoch
    near-dup pairs (oracle: all-pairs Jaccard with o.b_id < n.b_id) —
    the q_dedup_near recall argument applies verbatim: corpus dup
    pairs sit at jac >= 0.9 where the 32-hash/8-band scheme's miss
    probability is ~2e-4 per pair, and verification is exact Jaccard
    over hashed shingles (equal to string-shingle Jaccard modulo
    64-bit collisions), rounded at 6 dp on both engines. Determinism:
    band postings union is associative/commutative and the probe reads
    only strictly-earlier state, so each epoch's output is independent
    of row interleaving inside epochs.

    Since r11 the index is CONTRACTED on an md5 content fingerprint
    (VERDICT r10 item 1 at ingest — the r10 probe measured the
    uncontracted index emitting ZERO rows on a 100x-duplicated clone,
    every bucket suppressed by the occupancy cap): only the FIRST
    arrival of each distinct content is shingled, minhashed, and
    banded; later identical arrivals are resolved by one fp lookup.
    Five state relations: members (doc_id, cfp, b_id — corpus-linear,
    3 narrow columns, never text), classes (cfp, rep_id), rep band
    postings + rep shingle sets (both scaled by CONTENT DIVERSITY,
    not corpus size — the heavy arrays no longer grow with duplicate
    mass), and verified class-pairs (cfp, other, jac; both
    orientations). A class pair is verified exactly once — when its
    younger class first arrives (candidates always have one
    new-this-epoch side, so no pair is ever re-verified) — and member
    pairs inherit the class pair's Jaccard (a function of the two
    shingle SETS), same-class pairs being jac = 1.0 by identity.

    Scale shape: per-epoch maintenance is ONE batch scan -> fp ->
    map-side-combining class agg -> shingle/32-minhash/8-band fold
    over NEW classes only; the probe touches the index ONLY at the
    new classes' band buckets, with the {NEAR_STREAM_BUCKET_CAP}-CLASS
    occupancy cap counting distinct contents per bucket across state
    PLUS the arriving epoch's classes — the bucket's true candidate
    cost, see the constant's comment for the exact semantics and the
    permanence trade (genuine near-dup-diversity skew only —
    exact-duplicate mass can no longer consume cap budget or suppress
    buckets). Emission is two equi-
    joins against strictly-earlier members. The per-epoch collect is
    OUTPUT-sized (the verified near-dup pairs the epoch emits — the
    rows the caller receives anyway), never state-sized or
    batch-sized; a production sink would append them to a parquet
    hits relation instead of the driver log. Reference parity:
    dedup-at-ingest generalizes the reference's keyed first-seen
    state (AbstractPrometheusFirehose.java:41-51) from exact keys to
    near-duplicate text."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from .dedup import words

    rows_per_band = NEAR_STREAM_HASHES // NEAR_STREAM_BANDS
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    root = tempfile.mkdtemp(prefix="dedup_near_stream_")
    try:
        stage = stage_key_batches(d, root, SK_BATCHES, key="doc_id")
        mem_state = os.path.join(root, "members")
        cls_state = os.path.join(root, "classes")
        bands_state = os.path.join(root, "bands")
        sh_state = os.path.join(root, "shingles")
        cp_state = os.path.join(root, "class_pairs")
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        log: list[tuple[int, int, int, float]] = []
        epoch = [0]

        def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
            s = batch_df.sparkSession
            b = epoch[0]
            epoch[0] += 1
            _assert_batch_membership(batch_df, b)
            # Shingleable docs only (>= 3 words) — the population the
            # oracle's len(ws) >= 3 filter keeps.
            flt = batch_df.filter(F.size(words("text")) >= 3).select(
                "doc_id", "text", F.md5("text").alias("cfp")
            )
            members_b = (
                flt.select("doc_id", "cfp").withColumn("b_id", F.lit(b))
            ).persist()
            # First-seen classes this epoch: map-side-combining agg
            # (duplicate text collapses before the shuffle), then one
            # left_anti against the class state.
            agg_b = flt.groupBy("cfp").agg(
                F.min("doc_id").alias("rep_id"),
                F.min_by("text", "doc_id").alias("text"),
            )
            # EVERY state read below filters b_id < b even though the
            # dirs only contain earlier epochs at read time: Spark's
            # parquet writes refreshByPath their target, invalidating
            # any cached frame whose lineage reads that path — so a
            # frame recomputed AFTER this epoch's appends (cache
            # eviction, or the write of a later relation in the
            # sequence) would silently see its own epoch's rows. The
            # strictly-earlier filter makes every recompute
            # self-excluding by construction (ADVICE r11: the
            # untagged form wrote EMPTY class-pair appends for every
            # epoch >= 1 — new_cls's left_anti re-read cls_state after
            # its own append).
            if os.path.isdir(cls_state):
                new_cls = agg_b.join(
                    s.read.parquet(cls_state).filter(F.col("b_id") < b),
                    "cfp",
                    "left_anti",
                )
            else:
                new_cls = agg_b
            new_cls = new_cls.persist()
            # Shingle/signature/bands for NEW classes only — history
            # AND duplicate mass are never re-shingled.
            sh_n = doc_shingle_hashes(
                new_cls.select("cfp", "text"), "cfp", "text", out="sh"
            ).select(F.col("_id").alias("cfp"), "sh").persist()
            sig = sh_n.select(
                "cfp",
                minhash_signature(
                    F.col("sh"), NEAR_STREAM_HASHES
                ).alias("_sig"),
            )
            bands_n = sig.select(
                "cfp",
                F.explode(
                    lsh_bands(
                        F.col("_sig"), NEAR_STREAM_BANDS, rows_per_band
                    )
                ).alias("bb"),
            ).select("cfp", "bb.band_id", "bb.band_hash")
            # Candidate CLASS pairs: new classes probe the rep band
            # index (state plus this epoch's new reps — pairs among
            # two new classes must be verified now so later members
            # can expand them) only at their own buckets; the
            # occupancy cap counts CLASSES per bucket.
            all_bands = bands_n
            if os.path.isdir(bands_state):
                all_bands = (
                    s.read.parquet(bands_state)
                    .filter(F.col("b_id") < b)
                    .select("cfp", "band_id", "band_hash")
                    .unionByName(bands_n)
                )
            hit = all_bands.join(
                bands_n.select("band_id", "band_hash").distinct(),
                ["band_id", "band_hash"],
            )
            occ_ok = (
                hit.groupBy("band_id", "band_hash")
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") <= NEAR_STREAM_BUCKET_CAP)
                .select("band_id", "band_hash")
            )
            cand = (
                bands_n.select(
                    "band_id", "band_hash", F.col("cfp").alias("cfp_n")
                )
                .join(
                    hit.join(occ_ok, ["band_id", "band_hash"]).select(
                        "band_id", "band_hash",
                        F.col("cfp").alias("cfp_o"),
                    ),
                    ["band_id", "band_hash"],
                )
                .filter(F.col("cfp_n") != F.col("cfp_o"))
                .select(
                    F.least("cfp_n", "cfp_o").alias("cfp_a"),
                    F.greatest("cfp_n", "cfp_o").alias("cfp_b"),
                )
                .distinct()
            )
            # Verify once per class pair on rep shingle sets; every
            # candidate has a new-this-epoch side, so no pair is ever
            # verified twice.
            sh_all = sh_n
            if os.path.isdir(sh_state):
                sh_all = (
                    s.read.parquet(sh_state)
                    .filter(F.col("b_id") < b)
                    .select("cfp", "sh")
                    .unionByName(sh_n)
                )
            pv = (
                cand.join(
                    sh_all.select(
                        F.col("cfp").alias("cfp_a"),
                        F.col("sh").alias("sha"),
                    ),
                    "cfp_a",
                )
                .join(
                    sh_all.select(
                        F.col("cfp").alias("cfp_b"),
                        F.col("sh").alias("shb"),
                    ),
                    "cfp_b",
                )
                .select(
                    "cfp_a",
                    "cfp_b",
                    F.round(
                        jaccard(F.col("sha"), F.col("shb")), 6
                    ).alias("jac"),
                )
                .filter(F.col("jac") >= NEAR_STREAM_JAC)
            )
            cp_new = (
                pv.select(
                    F.col("cfp_a").alias("cfp"),
                    F.col("cfp_b").alias("other"),
                    "jac",
                )
                .unionByName(
                    pv.select(
                        F.col("cfp_b").alias("cfp"),
                        F.col("cfp_a").alias("other"),
                        "jac",
                    )
                )
            ).persist()
            # Emit BEFORE appending members: the member state is then
            # exactly the strictly-earlier arrivals. Same-class pairs
            # are jac = 1.0 by identity; cross-class pairs inherit the
            # class pair's Jaccard.
            if os.path.isdir(mem_state):
                old_m = s.read.parquet(mem_state).filter(
                    F.col("b_id") < b
                )
                same = (
                    members_b.select("doc_id", "cfp")
                    .join(
                        old_m.select(
                            F.col("doc_id").alias("dup_of"), "cfp"
                        ),
                        "cfp",
                    )
                    .select(
                        "doc_id", "dup_of", F.lit(1.0).alias("jac")
                    )
                )
                cp_all = cp_new
                if os.path.isdir(cp_state):
                    cp_all = (
                        s.read.parquet(cp_state)
                        .filter(F.col("b_id") < b)
                        .select("cfp", "other", "jac")
                        .unionByName(cp_new)
                    )
                cross = (
                    members_b.select("doc_id", "cfp")
                    .join(cp_all, "cfp")
                    .join(
                        old_m.select(
                            F.col("doc_id").alias("dup_of"),
                            F.col("cfp").alias("other"),
                        ),
                        "other",
                    )
                    .select("doc_id", "dup_of", "jac")
                )
                hits = same.unionByName(cross).collect()
                for r in sorted(
                    hits, key=lambda r: (r["doc_id"], r["dup_of"])
                ):
                    log.append((b, r["doc_id"], r["dup_of"], r["jac"]))
            members_b.write.mode("append").parquet(mem_state)
            bands_n.withColumn("b_id", F.lit(b)).write.mode(
                "append"
            ).parquet(bands_state)
            sh_n.withColumn("b_id", F.lit(b)).write.mode(
                "append"
            ).parquet(sh_state)
            new_cls.select("cfp", "rep_id").withColumn(
                "b_id", F.lit(b)
            ).write.mode("append").parquet(cls_state)
            cp_new.withColumn("b_id", F.lit(b)).write.mode(
                "append"
            ).parquet(cp_state)
            for c in (members_b, new_cls, sh_n, cp_new):
                c.unpersist()

        q = (
            stream.writeStream.foreachBatch(per_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Index-state size laws (the family's LAST_STATE_ROWS
        # instrumentation), r11 contracted form: the member map is
        # LINEAR in the corpus (3 narrow columns, never text); the
        # heavy relations — band postings (NEAR_STREAM_BANDS rows per
        # class) and shingle sets (one per class) — scale with CONTENT
        # DIVERSITY; class pairs are 2x the verified near-dup class
        # relationships. Pinned by tests/test_dedup_stream.
        from .sketch_stream_queries import LAST_STATE_ROWS

        LAST_STATE_ROWS["q_dedup_near_stream_members"] = (
            spark.read.parquet(mem_state).count()
        )
        LAST_STATE_ROWS["q_dedup_near_stream_classes"] = (
            spark.read.parquet(cls_state).count()
        )
        LAST_STATE_ROWS["q_dedup_near_stream_bands"] = (
            spark.read.parquet(bands_state).count()
        )
        LAST_STATE_ROWS["q_dedup_near_stream_shingles"] = (
            spark.read.parquet(sh_state).count()
        )
        cp_rows = spark.read.parquet(cp_state).collect()
        LAST_STATE_ROWS["q_dedup_near_stream_class_pairs"] = len(cp_rows)
        LAST_CLASS_PAIRS.clear()
        LAST_CLASS_PAIRS.extend(
            (r["cfp"], r["other"], r["jac"]) for r in cp_rows
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("batch_id", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("jac", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(log, schema)


@register(
    "q_curation_stream",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, doc_id % {SK_BATCHES} AS b, md5(text) AS fp,
               list_filter(regexp_split_to_array(lower(text),
                                                 '[ \\t\\n\\r\\f\\v]+'),
                           x -> x <> '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    q AS (
        SELECT b, fp FROM w
        WHERE len(ws) >= 5
          AND CAST(len(list_filter(ws, x -> x IN ('a', 'the')))
                   AS DOUBLE) / len(ws) >= 0.05
          AND CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) >= 0.3
    ),
    firstb AS (SELECT fp, min(b) AS fb FROM q GROUP BY fp),
    arr AS (
        SELECT doc_id % {SK_BATCHES} AS b, count(*) AS n_arrived
        FROM documents GROUP BY 1
    ),
    qa AS (SELECT b, count(*) AS n_q FROM q GROUP BY b),
    adm AS (SELECT fb AS b, count(*) AS n_admitted FROM firstb GROUP BY fb)
    SELECT CAST(arr.b AS BIGINT) AS batch_id,
           CAST(arr.n_arrived AS BIGINT) AS n_arrived,
           CAST(arr.n_arrived - coalesce(qa.n_q, 0) AS BIGINT)
               AS n_quality_fail,
           CAST(coalesce(qa.n_q, 0) - coalesce(adm.n_admitted, 0) AS BIGINT)
               AS n_dup_dropped,
           CAST(coalesce(adm.n_admitted, 0) AS BIGINT) AS n_admitted,
           CAST((SELECT count(*) FROM firstb f WHERE f.fb <= arr.b)
                AS BIGINT) AS n_corpus_cum
    FROM arr
    LEFT JOIN qa ON qa.b = arr.b
    LEFT JOIN adm ON adm.b = arr.b
    ORDER BY batch_id
    """,
)
def q_curation_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ADMISSION CONTROL at ingest — the streaming twin of
    q_corpus_curation's gate+dedup front half, and the pipeline shape a
    100 TB pre-training corpus actually runs at its front door: each
    micro-batch epoch quality-gates ITS arrivals (q_corpus_curation's
    EXACT predicates: non-null text, >= 5 words, stopword density >=
    0.05, type-token ratio >= 0.3), drops content already admitted (md5
    content fingerprint, within-batch and against the maintained
    admitted-fingerprint state), appends the newly admitted
    fingerprints to the state, and emits the epoch's admission ledger:
    (batch_id, n_arrived, n_quality_fail, n_dup_dropped, n_admitted,
    n_corpus_cum) — all BIGINT counts, hash-exact by construction.

    Hash-checked law: the ledger equals the DuckDB replay where a
    fingerprint is admitted exactly once, in the first epoch where a
    quality-passing copy arrives (min-batch census) — so sum(n_admitted)
    == the batch q_corpus_curation's deduped survivor count (the stream
    admits precisely what the batch curation keeps; cross-operator law
    pinned in tests/test_dedup_stream.py). Counts are pure functions of
    the batch partition: admission is per-FINGERPRINT (not per-doc), so
    within-epoch row order never matters.

    Scale shape: per-epoch work is one batch scan (gates are row-local
    array math, zero shuffle), a batch-sized fp-distinct, and ONE
    left_anti equi-join against the admitted-fp state — at 100 TB the
    state is fp-bucket-partitioned so the probe is co-located (the same
    serving story as the LSH/band and posting states above); history
    text is never rescanned or re-scored. State grows by NEW content
    only, APPEND-ONLY per epoch (appended fps are globally unique by
    construction: batch-distinct + left_anti vs the state, on strictly
    sequential epochs), with rename-swap consolidation every
    CURATION_COMPACT_EVERY epochs for small-file hygiene only (ADVICE
    r10: the former per-epoch rewrite was O(total state) per
    micro-batch). The stored relation stays bounded by CONTENT
    DIVERSITY, not corpus size — the measured 100x-clone property
    (SCALE.md r10: cloned corpora add zero state rows). Reference parity: this is the reference's keyed
    first-seen admission (AbstractPrometheusFirehose.java:41-51,
    lazy series creation) generalized from metric keys to document
    content, on its micro-batch boundaries (AbstractFirehose.java:
    107-131)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from .dedup import words
    from .sketch_stream_queries import (
        LAST_STATE_ROWS,
        compact_state,
        stage_key_batches,
    )
    from .text_queries import STOPWORDS

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="curation_stream_")
    try:
        stage = stage_key_batches(d, root, SK_BATCHES, key="doc_id")
        state = os.path.join(root, "admitted_fps")
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        log: list[tuple[int, int, int, int, int, int]] = []
        epoch = [0]

        def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
            s = batch_df.sparkSession
            b = epoch[0]
            epoch[0] += 1
            _assert_batch_membership(batch_df, b)
            n_arrived = batch_df.count()
            scored = (
                batch_df.filter(F.col("text").isNotNull())
                .select(F.md5("text").alias("fp"), words("text").alias("ws"))
                .filter(F.size("ws") >= 5)
            )
            nw = F.size("ws").cast("long")
            ns = F.size(
                F.filter(
                    F.col("ws"),
                    lambda w: w.isin(*[F.lit(x) for x in STOPWORDS]),
                )
            ).cast("long")
            nd = F.size(F.array_distinct("ws")).cast("long")
            passed = scored.select(
                "fp", nw.alias("nw"), ns.alias("ns"), nd.alias("nd")
            ).filter(
                (F.col("ns").cast("double") / F.col("nw") >= 0.05)
                & (F.col("nd").cast("double") / F.col("nw") >= 0.3)
            )
            n_q = passed.count()
            fps = passed.select("fp").distinct()
            if os.path.isdir(state):
                new = fps.join(s.read.parquet(state), "fp", "left_anti")
            else:
                new = fps
            # The anti-join result feeds two actions (count + append);
            # persist closes its lifecycle inside the epoch.
            new = new.persist()
            n_adm = new.count()
            new.write.mode("append").parquet(state)
            new.unpersist()
            # Appended fps are globally unique by construction (see
            # CURATION_COMPACT_EVERY): append-only every epoch;
            # rename-swap consolidation every N epochs only, so
            # per-epoch work stays one batch scan + ONE left_anti
            # probe, never an O(total state) rewrite (ADVICE r10).
            if (b + 1) % CURATION_COMPACT_EVERY == 0:
                compact_state(s.read.parquet(state), state)
            n_cum = s.read.parquet(state).count()
            log.append(
                (b, n_arrived, n_arrived - n_q, n_q - n_adm, n_adm, n_cum)
            )

        q = (
            stream.writeStream.foreachBatch(per_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Admitted-fp state == distinct admitted content: the
        # content-diversity bound, same pin family as the sketches.
        LAST_STATE_ROWS["q_curation_stream"] = (
            spark.read.parquet(state).count()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("batch_id", T.LongType()),
            T.StructField("n_arrived", T.LongType()),
            T.StructField("n_quality_fail", T.LongType()),
            T.StructField("n_dup_dropped", T.LongType()),
            T.StructField("n_admitted", T.LongType()),
            T.StructField("n_corpus_cum", T.LongType()),
        ]
    )
    return spark.createDataFrame(log, schema)


# ---------------------------------------------------------------------------
# q_cluster_stream: incremental duplicate-cluster maintenance at ingest
# ---------------------------------------------------------------------------

# Final union-find state of the last q_cluster_stream run, exposed for
# the cross-operator law test (stream final state == q_dedup_clusters'
# batch connected components) — window-bounded (<= PAIR_CAP rows), the
# same instrumentation stance as LAST_STATE_ROWS.
LAST_CLUSTER_STATE: list = []


def _cluster_stream_oracle() -> str:
    """DuckDB replay of at-arrival cluster assignment: for each epoch k
    the clustering over ALL docs arrived so far (b <= k), emitting only
    epoch k's own docs — one recursive min-label CTE per epoch, the
    q_dedup_clusters oracle parameterized by arrival prefix."""
    from .curation_queries import CLUSTER_JACCARD
    from .dedup_queries import PAIR_CAP

    blocks = []
    selects = []
    for k in range(SK_BATCHES):
        blocks.append(
            f"""
    arr{k} AS (SELECT doc_id, b, ws FROM w WHERE b <= {k}),
    pairs{k} AS (
        SELECT a.doc_id AS id_a, c.doc_id AS id_b
        FROM arr{k} a, arr{k} c
        WHERE a.doc_id < c.doc_id
          AND CAST(len(list_intersect(a.ws, c.ws)) AS DOUBLE)
              / (len(a.ws) + len(c.ws) - len(list_intersect(a.ws, c.ws)))
              >= {CLUSTER_JACCARD}
    ),
    e{k}(src, dst) AS (
        SELECT id_a, id_b FROM pairs{k}
        UNION ALL SELECT id_b, id_a FROM pairs{k}
    ),
    reach{k}(id, comp) AS (
        SELECT doc_id, doc_id FROM arr{k}
        UNION
        SELECT e.dst, r.comp FROM reach{k} r JOIN e{k} e ON e.src = r.id
    ),
    comp{k} AS (SELECT id, min(comp) AS comp FROM reach{k} GROUP BY id)"""
        )
        selects.append(
            f"""SELECT CAST({k} AS BIGINT) AS batch_id,
           CAST(a.doc_id AS BIGINT) AS doc_id,
           CAST(c.comp AS BIGINT) AS cluster_id
    FROM arr{k} a JOIN comp{k} c ON c.id = a.doc_id WHERE a.b = {k}"""
        )
    w = f"""
    w AS (
        SELECT doc_id, doc_id % {SK_BATCHES} AS b,
               list_distinct(list_filter(
                   regexp_split_to_array(lower(text),
                                         '[ \\t\\n\\r\\f\\v]+'),
                   x -> x <> '')) AS ws
        FROM documents WHERE doc_id < {PAIR_CAP}
    ),"""
    return (
        "WITH RECURSIVE"
        + w
        + ",".join(blocks)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@register("q_cluster_stream", oracle=_cluster_stream_oracle())
def q_cluster_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental duplicate-CLUSTER maintenance at ingest — the
    transitive-closure member of the streaming dedup family (detection:
    q_dedup_near_stream; clustering: here; admission: q_curation_stream;
    batch twin: q_dedup_clusters). Documents arrive as SK_BATCHES
    micro-batches (doc_id % SK_BATCHES); each foreachBatch epoch
    discovers its batch's near-dup edges (word-set Jaccard >=
    CLUSTER_JACCARD over the PAIR_CAP-bounded demo window — the
    q_dedup_clusters trade that keeps the DuckDB recursive-CTE oracle
    exact; at 100 TB the edges are the contracted LSH ingest index's
    verified pairs, q_dedup_near_stream, and everything downstream of
    edge discovery here is unchanged), merges them into a maintained
    union-find root map, and emits each arrival's AT-ARRIVAL cluster
    assignment: (batch_id, doc_id, cluster_id) with cluster_id = the
    minimum doc_id reachable among docs arrived so far — the serving
    answer "which existing duplicate cluster does this doc join".
    Later merges intentionally do not re-emit earlier docs (the root
    map holds the live clustering; the emission is the arrival ledger).

    The incremental step is the root-CONTRACTED delta CC: new edges are
    relabeled through the current roots (state roots are already the
    min-label of their component), so each epoch's connected_components
    call runs on a graph whose nodes are this batch's docs plus the
    TOUCHED state roots only — per-epoch CC cost scales with new-edge
    count, never corpus size, and history is never re-paired (each
    cross-epoch pair is discovered exactly once, when its younger doc
    arrives). State relations: roots (doc_id, root — corpus-LINEAR, 2
    narrow columns) and the word sets needed for edge discovery
    (window-bounded here; the production edge source is the contracted
    LSH index, which stores per-CLASS shingles — see
    q_dedup_near_stream). The root-map rewrite per epoch is
    window-sized here via the rename-swap compact helper; the 100 TB
    shape partitions the root map by root and rewrites only merged
    roots' partitions. Reference parity: generalizes the reference's
    keyed first-seen state (AbstractPrometheusFirehose.java:41-51) from
    per-key last-value to cross-key equivalence classes.

    Determinism: min-label is associative/commutative; each epoch's
    output depends only on the arrival partition, not row interleaving.
    Hash-checked vs the per-epoch recursive-CTE replay; the final root
    map's equality with q_dedup_clusters' batch CC is a separate law
    pin (tests/test_dedup_stream.py), as is the linear state law."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from .curation_queries import CLUSTER_JACCARD, connected_components
    from .dedup import jaccard, words
    from .dedup_queries import PAIR_CAP
    from .sketch_stream_queries import compact_state

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < PAIR_CAP)
        .select(
            "doc_id", F.array_distinct(words("text")).alias("ws")
        )
    )
    root = tempfile.mkdtemp(prefix="cluster_stream_")
    try:
        stage = stage_key_batches(d, root, SK_BATCHES, key="doc_id")
        ws_state = os.path.join(root, "ws")
        roots_state = os.path.join(root, "roots")
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        log: list = []
        epoch = [0]

        def per_batch(batch_df: DataFrame, _bid: int) -> None:
            s = batch_df.sparkSession
            b = epoch[0]
            epoch[0] += 1
            _assert_batch_membership(batch_df, b)
            ws_b = batch_df.select("doc_id", "ws").persist()
            # Edge discovery: batch x arrived-so-far (incl. the batch
            # itself — within-batch dups must cluster now). The demo
            # window is <= PAIR_CAP docs, so the nested-loop join is
            # broadcast-tiny by construction; at scale this stage is
            # replaced by the contracted LSH index probe.
            # Epoch-tagged read (the refreshByPath self-inclusion
            # discipline, see q_dedup_near_stream): a recompute after
            # this epoch's append must not see its own rows.
            all_ws = ws_b
            if os.path.isdir(ws_state):
                all_ws = (
                    s.read.parquet(ws_state)
                    .filter(F.col("b_id") < b)
                    .select("doc_id", "ws")
                    .unionByName(ws_b)
                )
            n = ws_b.select(
                F.col("doc_id").alias("id_n"), F.col("ws").alias("wn")
            )
            o = all_ws.select(
                F.col("doc_id").alias("id_o"), F.col("ws").alias("wo")
            )
            edges_doc = (
                F.broadcast(n)
                .join(o, F.col("id_n") != F.col("id_o"))
                .filter(
                    jaccard(F.col("wn"), F.col("wo")) >= CLUSTER_JACCARD
                )
                .select("id_n", "id_o")
            )
            # Relabel endpoints through the current roots: batch docs
            # root to themselves (not yet in state), state docs to
            # their maintained min-label. The contracted edge set then
            # spans only touched roots + batch ids.
            if os.path.isdir(roots_state):
                st_roots = s.read.parquet(roots_state)
            else:
                st_roots = s.createDataFrame(
                    [],
                    T.StructType(
                        [
                            T.StructField("doc_id", T.LongType()),
                            T.StructField("root", T.LongType()),
                        ]
                    ),
                )
            o_root = st_roots.select(
                F.col("doc_id").alias("id_o"),
                F.col("root").alias("root_o"),
            )
            e_roots = (
                edges_doc.join(o_root, "id_o", "left")
                .select(
                    F.col("id_n").alias("src"),
                    F.coalesce("root_o", "id_o").alias("dst"),
                )
                .filter(F.col("src") != F.col("dst"))
                .distinct()
                .persist()
            )
            delta_nodes = (
                ws_b.select(F.col("doc_id").alias("id"))
                .unionByName(e_roots.select(F.col("src").alias("id")))
                .unionByName(e_roots.select(F.col("dst").alias("id")))
                .distinct()
            )
            delta_edges = e_roots.unionByName(
                e_roots.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            labels = connected_components(delta_nodes, delta_edges)
            e_roots.unpersist()
            # Batch arrivals: at-arrival assignment == delta comp.
            batch_roots = (
                ws_b.select("doc_id")
                .join(labels.withColumnRenamed("id", "doc_id"), "doc_id")
                .select("doc_id", F.col("comp").alias("root"))
                .persist()
            )
            hits = batch_roots.collect()
            for r in sorted(hits, key=lambda r: r["doc_id"]):
                log.append((b, r["doc_id"], r["root"]))
            # State maintenance: merged state roots relabel through the
            # delta labels (only touched roots change); batch labels
            # append. Window-sized rename-swap here; partition-by-root
            # selective rewrite at scale.
            upd = (
                st_roots.join(
                    labels.withColumnRenamed("id", "root"),
                    "root",
                    "left",
                )
                .select(
                    "doc_id", F.coalesce("comp", "root").alias("root")
                )
                .unionByName(batch_roots)
            )
            if os.path.isdir(roots_state):
                compact_state(upd, roots_state)
            else:
                upd.write.parquet(roots_state)
            ws_b.withColumn("b_id", F.lit(b)).write.mode(
                "append"
            ).parquet(ws_state)
            for c in (ws_b, batch_roots):
                c.unpersist()

        q = (
            stream.writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", os.path.join(root, "chk")
            )
            .start()
        )
        q.awaitTermination()
        from .sketch_stream_queries import LAST_STATE_ROWS

        final_roots = spark.read.parquet(roots_state)
        LAST_STATE_ROWS["q_cluster_stream_roots"] = final_roots.count()
        LAST_STATE_ROWS["q_cluster_stream_ws"] = (
            spark.read.parquet(ws_state).count()
        )
        LAST_CLUSTER_STATE.clear()
        LAST_CLUSTER_STATE.extend(
            (r["doc_id"], r["root"]) for r in final_roots.collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("batch_id", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("cluster_id", T.LongType()),
        ]
    )
    return spark.createDataFrame(log, schema)
