"""Winnowing fingerprints: the paper's guarantees on small frames."""

import pytest
from pyspark.sql import functions as F

from discoverx_spark.operators.fingerprint import (fingerprint_overlap_pairs,
                                                   winnow_fingerprints)

K, W = 3, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_substring_guarantee(spark):
    # winnowing guarantee: a shared run of >= window + k - 1 tokens
    # (here 6) yields at least one shared selected fingerprint hash
    shared = "alpha beta gamma delta epsilon zeta"
    docs = _docs(spark, [
        (1, f"one two {shared} three four"),
        (2, f"{shared} five six seven eight nine"),
    ])
    fps = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared substring produced no shared fp"


def test_rightmost_tie_rule_on_constant_doc(spark):
    # all grams identical -> every window's min is its RIGHTMOST gram,
    # so selected positions are exactly {w-1 .. n_grams-1}
    n_tokens = 10
    docs = _docs(spark, [(1, " ".join(["tok"] * n_tokens))])
    fps = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W)
    n_grams = n_tokens - K + 1
    got = sorted(r["fp_pos"] for r in fps.collect())
    assert got == list(range(W - 1, n_grams))


def test_short_document_selects_one(spark):
    # fewer grams than one window -> the position-0 truncated window
    # selects exactly one fingerprint (the global min, rightmost tie)
    docs = _docs(spark, [(1, "a b c d")])  # 2 grams < window
    fps = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W)
    assert fps.count() == 1


def test_density_and_modes_agree_on_positions_count(spark):
    import random
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(60)))
            for i in range(20)]
    docs = _docs(spark, rows)
    md5 = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W,
                              hash_mode="md5")
    counts = {r["id"]: r["cnt"] for r in
              md5.groupBy("id").agg(F.count("*").alias("cnt")).collect()}
    n_grams = 60 - K + 1
    n_windows = n_grams - W + 1
    for c in counts.values():
        # at least one per disjoint window block, at most one per window
        assert n_windows // W <= c <= n_windows
    # xxhash64 mode must select from the same position universe with
    # comparable density (different hash family -> different choices)
    xx = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W,
                             hash_mode="xxhash64")
    assert xx.count() > 0
    assert xx.select("fp_pos").rdd.map(lambda r: r[0]).min() >= 0


def test_positions_false_matches_distinct_hashes(spark):
    docs = _docs(spark, [(i, f"a b c d e f g h i doc{i} x y z")
                         for i in range(5)])
    full = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W)
    slim = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W,
                               positions=False)
    lhs = set(map(tuple, full.select("id", "fp_hash").distinct().collect()))
    rhs = set(map(tuple, slim.collect()))
    assert lhs == rhs


def test_overlap_pairs_cap_drops_boilerplate(spark):
    # the same text in 6 docs; cap=5 removes every hash they share
    rows = [(i, "common shared boilerplate line here now") for i in range(6)]
    rows += [(10, "alpha beta gamma delta epsilon zeta eta"),
             (11, "alpha beta gamma delta epsilon zeta theta")]
    docs = _docs(spark, rows)
    pairs = fingerprint_overlap_pairs(docs, "text", "doc_id", k=K, window=W,
                                      min_shared=1, max_hash_freq=5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (10, 11) in got
    assert not any(a < 6 and b < 6 for a, b in got)


def test_invalid_hash_mode_raises(spark):
    docs = _docs(spark, [(1, "a b c d e")])
    with pytest.raises(ValueError, match="hash_mode"):
        winnow_fingerprints(docs, "text", "doc_id", hash_mode="sha1")


def test_sub_k_token_documents_emit_nothing(spark):
    docs = _docs(spark, [(1, "one two"), (2, ""), (3, None),
                         (4, "a b c d e f g")])
    fps = winnow_fingerprints(docs, "text", "doc_id", k=K, window=W)
    assert {r["id"] for r in fps.collect()} == {4}


def test_incremental_overlap_probes_index_only(spark):
    from discoverx_spark.operators.fingerprint import (
        incremental_fingerprint_overlap, winnow_fingerprints)
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    index_docs = _docs(spark, [
        (0, f"{shared} one two three"),
        (2, f"{shared} four five six"),       # near-dup inside the index
        (4, "totally different content words here"),
    ])
    batch = _docs(spark, [
        (1, f"intro {shared} outro words"),
        (3, "no overlap with anything stored previously at all"),
    ])
    idx = winnow_fingerprints(index_docs, "text", "doc_id", k=K, window=W,
                              positions=False)
    out = incremental_fingerprint_overlap(batch, idx, "text", "doc_id",
                                          k=K, window=W, min_shared=1)
    got = {(r["batch_id"], r["index_id"]) for r in out.collect()}
    assert (1, 0) in got and (1, 2) in got
    # index near-dups never pair with each other (index x index not formed)
    assert all(b in (1, 3) for b, _ in got)
    assert not any(b == 3 for b, _ in got)
