"""Differential fuzz: Spark winnowing and chunking vs independent
pure-Python references on seeded random corpora.

The references share NO code with the operators: tokenization is
``str.split()`` (equivalent to the \\S+ extraction for space-joined
corpora), hashing re-derives the md5 slice from hashlib, and the
winnowing loop is the textbook sliding-window scan with the
rightmost-min tie rule."""

import hashlib
import random

from discoverx_spark.operators.fingerprint import winnow_fingerprints
from discoverx_spark.operators.packing import chunk_documents

K, W = 3, 4


def _md5_slice(gram: str) -> int:
    return int(hashlib.md5((gram + "#g0").encode()).hexdigest()[:8], 16)


def _ref_winnow(text: str, k: int, w: int):
    toks = text.lower().split()
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [_md5_slice(g) for g in grams]
    n = len(hs)
    out = set()
    windows = ([range(0, n)] if n < w else
               [range(s, s + w) for s in range(0, n - w + 1)])
    for win in windows:
        best = None
        for p in win:
            # strict < : ties keep the RIGHTMOST (later p never replaces
            # on equal hash unless we scan right-to-left; scan left and
            # use <=)
            if best is None or hs[p] <= hs[best]:
                best = p
        out.add((best, hs[best]))
    return out


def _ref_chunks(text: str, chunk: int, overlap: int):
    toks = text.split()
    stride = chunk - overlap
    out = {}
    c = 0
    while c * stride < len(toks):
        if c > 0 and c * stride + overlap >= len(toks):
            break
        piece = toks[c * stride:c * stride + chunk]
        out[c] = (len(piece), " ".join(piece))
        c += 1
    return out


def _corpus(seed, n_docs, vocab_size=25, max_len=80):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(vocab_size)]
    return [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, max_len))))
            for i in range(n_docs)]


def test_winnow_differential_fuzz(spark):
    rows = _corpus(11, 40)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "text", "doc_id",
                                 k=K, window=W).collect():
        got.setdefault(r["id"], set()).add((r["fp_pos"], r["fp_hash"]))
    for i, text in rows:
        want = _ref_winnow(text, K, W)
        assert got.get(i, set()) == want, f"doc {i}: {text[:60]!r}"


def test_chunk_differential_fuzz(spark):
    rows = _corpus(13, 40, max_len=120)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=16,
                          overlap_tokens=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["id"], {})[r["chunk_idx"]] = (
            r["n_chunk_tokens"], r["chunk_text"])
    for i, text in rows:
        assert got.get(i, {}) == _ref_chunks(text, 16, 4), f"doc {i}"
