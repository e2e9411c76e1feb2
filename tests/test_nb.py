"""Naive Bayes classifier pins (r8): exact agreement with an
independent pure-Python multinomial-NB model on a micro corpus, and
the broadcast/no-window plan shape the docstring claims."""

from __future__ import annotations

import math

import pytest

from confluent_example_firehose_spark.plans.inspect import executed_plan
from confluent_example_firehose_spark.registry import query_fns

DOCS = [
    (1, "apple banana apple", "en", "s", 0),
    (2, "apple apple cherry", "en", "s", 0),
    (3, "banane kirsche banane", "de", "s", 0),
    (4, "kirsche kirsche apfel banane", "de", "s", 0),
    (5, "apple banane", "en", "s", 0),  # mixed-vocab doc
]


def _python_nb(docs, nb_round):
    """Independent model: multinomial NB, add-one smoothing, rounded
    argmax with lexicographic tie-break."""
    from collections import Counter, defaultdict

    ct = defaultdict(Counter)
    nd = Counter()
    for _id, text, lang, *_ in docs:
        toks = [t for t in text.lower().split() if t]
        ct[lang].update(toks)
        nd[lang] += 1
    vocab = {t for c in ct.values() for t in c}
    v = len(vocab)
    nt = sum(nd.values())
    out = {}
    for _id, text, lang, *_ in docs:
        toks = [t for t in text.lower().split() if t]
        best = None
        for c in sorted(ct):
            tot = sum(ct[c].values())
            s = math.log(nd[c] / nt) + sum(
                math.log((ct[c][t] + 1) / (tot + v)) for t in toks
            )
            s = round(s, nb_round)
            if best is None or s > best[0] or (s == best[0] and c < best[1]):
                best = (s, c)
        out[_id] = (best[1], best[0], int(best[1] == lang))
    return out


@pytest.fixture(scope="module")
def fns():
    return query_fns()


def test_nb_matches_python_model(spark, fns, tmp_path):
    from confluent_example_firehose_spark.operators.nb_queries import (
        NB_ROUND,
    )

    df = spark.createDataFrame(
        DOCS, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["pred_lang"], r["score"], r["is_correct"])
        for r in fns["q_nb_classify"](spark, str(tmp_path)).collect()
    }
    want = _python_nb(DOCS, NB_ROUND)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert got[i][1] == pytest.approx(want[i][1], abs=10 ** -NB_ROUND)
        assert got[i][2] == want[i][2]


def test_nb_plan_shape(spark, sf_dir, fns, lazy_caching):
    plan = executed_plan(fns["q_nb_classify"](spark, sf_dir))
    # the model (likelihood table, priors) broadcasts into the scoring
    # join; the argmax is an aggregate (min(struct) compiles to
    # SortAggregate with partition-LOCAL sorts — fine), not a window
    # over the corpus; no GLOBAL sort or range partitioning anywhere
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    for line in plan.splitlines():
        if "Sort [" in line:
            assert ", false, 0" in line, f"global sort: {line.strip()}"
    assert "rangepartitioning" not in plan.lower()
