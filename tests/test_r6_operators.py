"""Hand-verified semantics for the round-6-touched operators: the
robust-stats integer rank frontier, line-dedup first-occurrence +
reassembly on the hashed window key, and the IVF probe tiebreak.
Constructed micro-corpora with answers derived by hand, so a future
refactor can't silently drift the semantics even if both engines drift
together (the one failure mode the DuckDB oracles can't see)."""

from __future__ import annotations

from confluent_example_firehose_spark.registry import all_queries


def test_robust_stats_rank_frontier_hand_verified(spark, tmp_path):
    """Type 'a': cents 100..2000 (n=20). lo = smallest value whose
    cumulative count reaches n/20 = 1 -> 100; hi = smallest reaching
    19n/20 = 19 -> 1900. One value clips high (2000 -> 1900):
    winsor mean = (sum(100..1900) + 1900)/20 = 20900/20 = 1045."""
    rows = [(i, f"2024-01-01 00:00:{i:02d}", 1, "a", float(i), "{}")
            for i in range(1, 21)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
        "event_type", "value * 100 AS value", "props"
    )
    sf_dir = str(tmp_path / "micro_sf")
    df.coalesce(1).write.parquet(sf_dir + "/events.parquet")
    out = all_queries()["q_robust_stats"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lo_cents"], r["hi_cents"]) == (10000, 190000)
    assert (r["n_clip_lo"], r["n_clip_hi"]) == (0, 1)
    assert r["winsor_mean_cents"] == 104500.0
    assert r["raw_mean_cents"] == 105000.0


def test_dedup_lines_first_occurrence_hand_verified(spark, tmp_path):
    """doc 1 = chunks [A, B]; doc 2 = chunks [B, C]. The corpus-wide
    first occurrence of B is (doc 1, pos 1) < (doc 2, pos 0), so doc 2
    keeps only C and reassembles to exactly C's text; doc 1 keeps
    both chunks and reassembles to its original text."""
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    c = " ".join(f"c{i}" for i in range(10))
    rows = [
        (1, "en", "s1", 0, f"{a} {b}"),
        (2, "en", "s2", 0, f"{b} {c}"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    )
    sf_dir = str(tmp_path / "micro_sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in all_queries()["q_dedup_lines"].fn(spark, sf_dir).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == f"{a} {b}"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == c


def test_ivf_seq_sqdist_matches_fold_order():
    """_seq_sqdist must accumulate dimension-by-dimension (the DuckDB
    list_reduce order), not via numpy pairwise .sum() — build a vector
    where the two orders differ in the last ULP and pin the
    sequential result."""
    import numpy as np

    from confluent_example_firehose_spark.operators.similarity_queries import (
        _seq_sqdist,
    )

    rng = np.random.RandomState(7)
    x = rng.rand(1, 64)
    c = rng.rand(3, 64)
    got = _seq_sqdist(x, c)
    want = np.zeros((1, 3))
    for k in range(3):
        acc = 0.0
        for i in range(64):
            t = x[0, i] - c[k, i]
            acc += t * t
        want[0, k] = acc
    assert (got == want).all()  # bitwise, not approx
