"""DSIR importance weighting (functions/weighting.py): hand-computed
weights via an independent pure-Python replica, ranking sanity, and the
deterministic Gumbel-top-k resampler."""

from __future__ import annotations

import hashlib
import math
import re
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from opentelemetry_collector_contrib_spark.functions import weighting as wt  # noqa: E402


def _py_terms(text: str) -> list[str]:
    t = re.findall(r"[a-z0-9]+", text.lower())
    big = [" ".join(t[i : i + 2]) for i in range(max(len(t) - 1, 1))]
    return [x for x in t + big if x]


def _py_bucket(term: str) -> str:
    return hashlib.md5(term.encode()).hexdigest()[:2]


def _py_weights(corpus, target, alpha=1.0, B=256):
    """Independent replica of dsir_logweights for tiny inputs."""
    cr: dict[str, int] = {}
    ct: dict[str, int] = {}
    doc_buckets: dict[int, list[str]] = {}
    for doc_id, text in corpus:
        bs = [_py_bucket(g) for g in _py_terms(text)]
        doc_buckets[doc_id] = bs
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
    for _, text in target:
        for g in _py_terms(text):
            b = _py_bucket(g)
            ct[b] = ct.get(b, 0) + 1
    t_raw, t_tgt = sum(cr.values()), sum(ct.values())
    lam = {
        b: math.log((ct.get(b, 0) + alpha) / (t_tgt + alpha * B))
        - math.log((c + alpha) / (t_raw + alpha * B))
        for b, c in cr.items()
    }
    out = {}
    for doc_id, bs in doc_buckets.items():
        if not bs:
            continue
        logw = sum(lam[b] for b in bs)
        out[doc_id] = (len(bs), logw, logw / len(bs))
    return out


def test_hashed_term_buckets_bag_semantics(spark):
    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    rows = wt.hashed_term_buckets(df).collect()
    # unigrams a,b,a + bigrams "a b","b a" = 5 occurrences (bag, not set)
    assert len(rows) == 5
    got = sorted(r["bucket"] for r in rows)
    want = sorted(_py_bucket(g) for g in ["a", "b", "a", "a b", "b a"])
    assert got == want


def test_hashed_term_buckets_single_token_truncation(spark):
    df = spark.createDataFrame([(1, "word")], ["doc_id", "text"])
    rows = wt.hashed_term_buckets(df).collect()
    # the lone token plays both the unigram and the truncated bigram
    assert [r["bucket"] for r in rows] == [_py_bucket("word")] * 2


def test_dsir_logweights_hand_computed(spark):
    corpus = [
        (1, "spark shuffles partition data"),
        (2, "the quick brown fox"),
        (3, "spark partition spark partition"),
    ]
    target = [(100, "spark partition tuning")]
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    tdf = spark.createDataFrame(target, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_terms"], r["logw"], r["avg_logw"])
        for r in wt.dsir_logweights(cdf, tdf).collect()
    }
    want = _py_weights(corpus, target)
    assert set(got) == set(want)
    for doc_id, (n, logw, avg) in want.items():
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(logw, abs=1e-9)
        assert got[doc_id][2] == pytest.approx(avg, abs=1e-9)


def test_dsir_target_like_doc_scores_higher(spark):
    cdf = spark.createDataFrame(
        [
            (1, "neural network training loss gradient"),
            (2, "cheap pills buy now click here winner"),
        ],
        ["doc_id", "text"],
    )
    tdf = spark.createDataFrame(
        [(100, "gradient descent neural network training")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["avg_logw"]
        for r in wt.dsir_logweights(cdf, tdf).collect()
    }
    assert got[1] > got[2]


def test_dsir_lambda_join_is_broadcast(spark):
    cdf = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    tdf = spark.createDataFrame([(9, "a b")], ["doc_id", "text"])
    plan = (
        wt.dsir_logweights(cdf, tdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_importance_resample_is_deterministic_subset(spark):
    w = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(200)], ["doc_id", "logw"]
    )
    s1 = sorted(r["doc_id"] for r in wt.importance_resample(w, 25, seed=3).collect())
    s2 = sorted(r["doc_id"] for r in wt.importance_resample(w, 25, seed=3).collect())
    assert s1 == s2 and len(s1) == 25
    assert set(s1) <= set(range(200))
    s3 = sorted(r["doc_id"] for r in wt.importance_resample(w, 25, seed=4).collect())
    assert s1 != s3  # a different seed moves the selection


def test_importance_resample_low_temperature_is_topk(spark):
    w = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], ["doc_id", "logw"]
    )
    got = sorted(
        r["doc_id"]
        for r in wt.importance_resample(w, 10, seed=0, temperature=1e-9).collect()
    )
    assert got == list(range(90, 100))  # Gumbel noise drowned out


def test_importance_resample_weight_bias(spark):
    """A hugely-upweighted minority must dominate the selection."""
    rows = [(i, 50.0 if i < 20 else 0.0) for i in range(400)]
    w = spark.createDataFrame(rows, ["doc_id", "logw"])
    got = [r["doc_id"] for r in wt.importance_resample(w, 20, seed=1).collect()]
    assert sum(1 for d in got if d < 20) >= 18


def test_dsir_zero_bucket_overlap_uses_true_target_total(spark):
    # corpus and target engineered to share NO md5-prefix bucket: with
    # prefix 2 there are 256 buckets; pick single-token docs whose
    # buckets differ. The λ for a corpus bucket must use the TRUE
    # target total (len of target terms), not 0 — a 0 total inflates
    # log((0+a)/(a*B)) to log((c+a)/(a*B)) uniformly.
    import hashlib
    import math

    def bucket(t):
        return hashlib.md5(t.encode()).hexdigest()[:2]

    # find two words in different buckets
    words = ["alpha", "beta", "gamma", "delta", "omega", "kappa"]
    corpus_w = words[0]
    target_w = next(w for w in words[1:] if bucket(w) != bucket(corpus_w))
    corpus = spark.createDataFrame([(1, corpus_w)], ["doc_id", "text"])
    target = spark.createDataFrame([(2, target_w)], ["doc_id", "text"])
    row = wt.dsir_logweights(corpus, target).collect()[0]
    # one-token doc => unigram + bigram-of-one = 2 occurrences of the
    # same term; target likewise has t_tgt = 2
    B = 256
    lam = (math.log((0 + 1.0) / (2 + B)) - math.log((2 + 1.0) / (2 + B)))
    assert abs(row["logw"] - 2 * lam) < 1e-9, (row["logw"], 2 * lam)
