"""Trainable logistic-regression quality classifier: differential fuzz
vs an independent dict-based reference, deterministic-vs-fast-path
agreement, learning sanity on separable data, and edge cases."""

from __future__ import annotations

import math
import random

import pytest

from discoverx_spark.functions.xxh import spark_xxhash64_string as H
from discoverx_spark.operators.logreg import (BIAS_FEATURE, hashed_features,
                                              logreg_predict, logreg_train)

B = 32


class _RefLR:
    """Sequential logistic regression mirroring the deterministic plan's
    reduction orders (f-sorted margins, id-sorted gradients) — no Spark
    code shared."""

    def __init__(self, rows, n_iter, lr, l2):
        self.feats = {}
        self.ys = {}
        for i, y, text in rows:
            self.ys[i] = float(y)
            toks = (text or "").lower().split()
            if not toks:
                continue
            cnt = {}
            for t in toks:
                f = H(t) % B
                cnt[f] = cnt.get(f, 0) + 1
            self.feats[i] = {f: c / len(toks) for f, c in cnt.items()}
        n = float(len(self.ys))
        self.w = {f: 0.0 for m in self.feats.values() for f in m}
        self.b = 0.0
        for _ in range(n_iter):
            resid = {i: self._sig(i) - self.ys[i] for i in self.ys}
            gb = 0.0
            for i in sorted(resid):
                gb += resid[i]
            new_w = {}
            for f in self.w:
                g = 0.0
                for i in sorted(self.feats):
                    if f in self.feats[i]:
                        g += resid[i] * self.feats[i][f]
                new_w[f] = self.w[f] - lr * (g / n + l2 * self.w[f])
            self.w = new_w
            self.b -= lr * (gb / n)

    def _margin(self, i):
        m = 0.0
        for f in sorted(self.feats.get(i, ())):
            m += self.w[f] * self.feats[i][f]
        return m

    def _sig(self, i):
        return 1.0 / (1.0 + math.exp(-(self._margin(i) + self.b)))


def _corpus(seed, n=40, with_empty=True):
    rng = random.Random(seed)
    pos = [f"p{j}" for j in range(6)]
    neg = [f"n{j}" for j in range(6)]
    neutral = ["the", "of", "and", "xyz"]
    rows = []
    for i in range(n):
        y = rng.randint(0, 1)
        own = pos if y else neg
        words = [rng.choice(own if rng.random() < 0.6 else neutral)
                 for _ in range(rng.randint(1, 25))]
        rows.append((i, y, " ".join(words)))
    if with_empty:
        rows.append((n, 1, ""))
        rows.append((n + 1, 0, None))
    return rows


@pytest.mark.parametrize("seed,l2", [(3, 0.0), (11, 1e-2)])
def test_logreg_train_differential(spark, seed, l2):
    rows = _corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    ref = _RefLR(rows, n_iter=5, lr=1.5, l2=l2)
    model = logreg_train(df, "text", "y", "doc_id", n_buckets=B,
                         n_iter=5, lr=1.5, l2=l2)
    got = {r["f"]: r["w"] for r in model.collect()}
    exp = dict(ref.w)
    exp[BIAS_FEATURE] = ref.b
    assert set(got) == set(exp)
    for f in exp:
        assert got[f] == pytest.approx(exp[f], rel=1e-9, abs=1e-12), f


def test_logreg_predict_differential(spark):
    rows = _corpus(7)
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    ref = _RefLR(rows, n_iter=4, lr=2.0, l2=0.0)
    model = logreg_train(df, "text", "y", "doc_id", n_buckets=B,
                         n_iter=4, lr=2.0)
    out = logreg_predict(df, "text", "doc_id", model, n_buckets=B)
    got = {r["id"]: r["score"] for r in out.collect()}
    assert set(got) == set(ref.ys)
    for i in got:
        assert got[i] == pytest.approx(ref._sig(i), rel=1e-9), i
    # featureless docs score exactly sigma(bias)
    sig_b = 1.0 / (1.0 + math.exp(-ref.b))
    assert got[40] == pytest.approx(sig_b, rel=1e-9)
    assert got[41] == pytest.approx(sig_b, rel=1e-9)


def test_logreg_fast_path_agrees(spark):
    """deterministic=False (plain F.sum reductions — the 100 TB path)
    agrees with the sorted-fold path to float-reduction tolerance."""
    rows = _corpus(19, with_empty=False)
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    slow = {r["f"]: r["w"]
            for r in logreg_train(df, "text", "y", "doc_id", n_buckets=B,
                                  n_iter=4, lr=1.0).collect()}
    fast = {r["f"]: r["w"]
            for r in logreg_train(df, "text", "y", "doc_id", n_buckets=B,
                                  n_iter=4, lr=1.0,
                                  deterministic=False).collect()}
    assert set(slow) == set(fast)
    for f in slow:
        assert fast[f] == pytest.approx(slow[f], rel=1e-6, abs=1e-9), f


def test_logreg_learns_separable(spark):
    """On cleanly separable data the trained model classifies its own
    training set almost perfectly and the loss-reducing direction is
    real (positive-class words get positive weights)."""
    rng = random.Random(23)
    rows = [(i, i % 2,
             " ".join(rng.choice(["apple", "banana"] if i % 2
                                 else ["rock", "sand"])
                      for _ in range(rng.randint(3, 10))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    # n_buckets=64: the four class words land in distinct buckets (at
    # B=32 'sand' collides with 'apple' and the sign check is undefined)
    model = logreg_train(df, "text", "y", "doc_id", n_buckets=64,
                         n_iter=10, lr=4.0)
    out = logreg_predict(df, "text", "doc_id", model, n_buckets=64)
    preds = {r["id"]: int(r["score"] >= 0.5) for r in out.collect()}
    acc = sum(preds[i] == y for i, y, _ in rows) / len(rows)
    assert acc >= 0.95
    w = {r["f"]: r["w"] for r in model.collect()}
    for word in ("apple", "banana"):
        assert w[H(word) % 64] > 0, word
    for word in ("rock", "sand"):
        assert w[H(word) % 64] < 0, word


def test_logreg_model_parquet_roundtrip(spark, tmp_path):
    """The model is a plain DataFrame: persist to parquet, reload, and
    predictions are bit-identical (the functions/models.py seam story
    for the TRAINED classifier)."""
    rows = _corpus(31, with_empty=False)
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    model = logreg_train(df, "text", "y", "doc_id", n_buckets=B, n_iter=3)
    path = str(tmp_path / "lr_model")
    model.write.parquet(path)
    reloaded = spark.read.parquet(path)
    a = sorted((r["id"], r["score"]) for r in
               logreg_predict(df, "text", "doc_id", model,
                              n_buckets=B).collect())
    b = sorted((r["id"], r["score"]) for r in
               logreg_predict(df, "text", "doc_id", reloaded,
                              n_buckets=B).collect())
    assert a == b


def test_logreg_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "doc_id long, y int, text string")
    with pytest.raises(ValueError, match="no labeled documents"):
        logreg_train(df, "text", "y", "doc_id", n_buckets=B, n_iter=1)


def test_hashed_features_values(spark):
    df = spark.createDataFrame([(1, "aa bb aa")], "doc_id long, text string")
    rows = hashed_features(df, "text", "doc_id", n_buckets=B).collect()
    got = {r["f"]: r["x"] for r in rows}
    assert got == {H("aa") % B: pytest.approx(2 / 3),
                   H("bb") % B: pytest.approx(1 / 3)}
