"""Deterministic sampling, sequence packing, and vocabulary operators —
the training-mix prep layer (round 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from discoverx_spark.operators.packing import (pack_sequences, token_counts,
                                               top_tokens)
from discoverx_spark.operators.sampling import (BUCKETS, hash_sample,
                                                split_train_holdout,
                                                stratified_hash_sample)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_partitioning_invariant(spark, docs):
    """The whole point vs df.sample(): identical keep set under any
    physical layout."""
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in
         hash_sample(docs.repartition(17), "doc_id", 0.3).collect()}
    c = {r.doc_id for r in
         hash_sample(docs.coalesce(1), "doc_id", 0.3).collect()}
    assert a == b == c
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # roughly the asked fraction


def test_hash_sample_monotone_fractions(docs):
    small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in hash_sample(docs, "doc_id", 0.4).collect()}
    assert small <= big  # nested samples: same hash, larger threshold


def test_stratified_fractions_respected(docs):
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_fraction=0.5)
    by_lang = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == totals["en"]
    assert "de" not in by_lang
    for lang, n in by_lang.items():
        if lang not in ("en",):
            assert 0 < n < totals[lang]


def test_split_train_holdout_disjoint_and_total(docs):
    train, hold = split_train_holdout(docs, "doc_id", 0.2)
    t = {r.doc_id for r in train.collect()}
    h = {r.doc_id for r in hold.collect()}
    assert not (t & h)
    assert len(t) + len(h) == docs.count()


def test_bad_fraction_raises(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "doc_id", "lang", {"en": -0.1})


def test_cap_per_group_quota_and_ties(spark):
    from discoverx_spark.operators.sampling import cap_per_group
    rows = [(i, "g1" if i < 6 else "g2", 100 - (i % 3)) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, src string, score long")
    out = cap_per_group(df, "src", "score", 2, tiebreak_col="doc_id")
    got = sorted((r.src, r.doc_id) for r in out.collect())
    # g1: scores [100,99,98,100,99,98] for ids 0..5 -> top2 = ids 0,3 (ties
    # broken by id asc); g2: ids 6..8 scores [100,99,98] -> ids 6,7
    assert got == [("g1", 0), ("g1", 3), ("g2", 6), ("g2", 7)]
    with pytest.raises(ValueError):
        cap_per_group(df, "src", "score", 0)


def test_cap_per_group_partitioning_invariant(spark, docs):
    from discoverx_spark.operators.sampling import cap_per_group
    a = sorted(r.doc_id for r in
               cap_per_group(docs, "source", "n_chars", 3,
                             tiebreak_col="doc_id").collect())
    b = sorted(r.doc_id for r in
               cap_per_group(docs.repartition(23), "source", "n_chars", 3,
                             tiebreak_col="doc_id").collect())
    assert a == b


def test_pack_sequences_tape_semantics(spark):
    rows = [(i, "w " * t) for i, t in
            enumerate([100, 100, 100, 50, 200, 6, 300])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the global (unpartitioned) tape is a single-task window — warned
    with pytest.warns(RuntimeWarning, match="ONE global tape"):
        packed = pack_sequences(df, "doc_id", "text", max_tokens=256)
    out = {r.id: r for r in packed.collect()}
    # offsets are the running sum in id order
    offs = [out[i].start_offset for i in range(7)]
    assert offs == [0, 100, 200, 300, 350, 550, 556]
    assert [out[i].bin_id for i in range(7)] == [0, 0, 0, 1, 1, 2, 2]
    # bin of a doc is where its FIRST token lands (doc 2 straddles 256)
    assert out[2].start_offset < 256 <= out[2].start_offset + out[2].n_tokens


def test_pack_sequences_partitioned_tapes(spark):
    rows = [(1, "a", "w " * 300), (2, "a", "w " * 10),
            (3, "b", "w " * 5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {(r.lang, r.id): r for r in
           pack_sequences(df, "doc_id", "text", max_tokens=256,
                          partition_col="lang").collect()}
    assert out[("a", 2)].start_offset == 300
    assert out[("b", 3)].start_offset == 0  # independent tape per partition


def test_pack_sequences_invariant_to_input_partitioning(spark, docs):
    a = sorted(tuple(r) for r in
               pack_sequences(docs, "doc_id", "text", 128,
                              partition_col="lang").collect())
    b = sorted(tuple(r) for r in
               pack_sequences(docs.repartition(13), "doc_id", "text", 128,
                              partition_col="lang").collect())
    assert a == b


def test_vocab_counts_and_topk(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "B a c")], "doc_id long, text string")
    counts = {r.token: r["count"] for r in token_counts(df, "text").collect()}
    assert counts == {"a": 3, "b": 2, "c": 1}
    top = [(r.token, r["count"]) for r in top_tokens(df, "text", k=2).collect()]
    assert top == [("a", 3), ("b", 2)]


def test_sampling_pushdown_reaches_scan(spark):
    """The hash filter is a pure projection predicate: no shuffle in the
    sampled-scan plan (the 100 TB property — sampling costs one pass)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = hash_sample(docs, "doc_id", 0.25) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_blocklist_suffix_matching(spark):
    from discoverx_spark.operators.sampling import domain_blocklist_filter
    rows = [
        (1, "read https://news.example.com/a"),        # subdomain of blocked
        (2, "read https://example.com/b"),             # blocked exactly
        (3, "read https://example.com.evil.net/c"),    # NOT a suffix match
        (4, "read https://safe.org/d and https://Example.COM/e"),  # any hit
        (5, "no urls at all"),
        (6, "read https://other.net/f"),
        (7, "read https://x@example.com/evade"),     # userinfo bypass
        (8, "read HTTPS://EXAMPLE.COM/shout"),       # uppercase scheme
        (9, "read https://example.com./dot"),        # trailing-dot host
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept = sorted(r["doc_id"] for r in
                  domain_blocklist_filter(df, "text", "doc_id", bl).collect())
    assert kept == [3, 5, 6]



def test_mixing_rates_binding_domain(spark):
    from discoverx_spark.operators.sampling import mixing_rates
    rows = ([("web", i) for i in range(100)]
            + [("code", i) for i in range(20)]
            + [("books", i) for i in range(30)]
            + [("ignored", i) for i in range(5)])
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = {r["source"]: r for r in
           mixing_rates(df, "source",
                        {"web": 0.5, "code": 0.25, "books": 0.25}).collect()}
    # code is binding: 20/0.25 = 80 total budget
    assert out["code"]["rate"] == 1.0
    assert out["web"]["rate"] == 0.4          # 0.5*80/100
    assert out["books"]["rate"] == round(20 / 30, 6)
    assert "ignored" not in out
    # realized mix matches the target shares exactly
    assert out["web"]["sampled_units"] == 40.0
    assert out["code"]["sampled_units"] == 20.0
    assert out["books"]["sampled_units"] == 20.0


def test_temperature_mix_tau1_recovers_proportional(spark):
    import pytest
    from discoverx_spark.operators.sampling import temperature_mix
    rows = ([("web", i) for i in range(90)]
            + [("code", i) for i in range(9)]
            + [("books", i) for i in range(1)])
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = {r["source"]: r for r in
           temperature_mix(df, "source", temperature=1.0).collect()}
    for src in ("web", "code", "books"):
        assert out[src]["temp_share"] == out[src]["raw_share"]
        assert out[src]["boost"] == 1.0
    # tau=2: tail upsampled, head downsampled, shares still sum to 1
    out2 = {r["source"]: r for r in
            temperature_mix(df, "source", temperature=2.0).collect()}
    assert out2["books"]["boost"] > 1.0
    assert out2["web"]["boost"] < 1.0
    assert abs(sum(r["temp_share"] for r in out2.values()) - 1.0) < 1e-4
    # sqrt formula spot check: p_d ∝ sqrt(n_d)
    import math
    denom = math.sqrt(90) + math.sqrt(9) + math.sqrt(1)
    assert out2["code"]["temp_share"] == round(3 / denom, 6)
    with pytest.raises(ValueError):
        temperature_mix(df, "source", temperature=0.0)


def test_temperature_mix_weighted(spark):
    from discoverx_spark.operators.sampling import temperature_mix
    from pyspark.sql import functions as F
    rows = [("a", 10), ("a", 30), ("b", 40)]
    df = spark.createDataFrame(rows, "source string, n_tok int")
    out = {r["source"]: r for r in
           temperature_mix(df, "source", temperature=1.0,
                           weight=F.col("n_tok")).collect()}
    assert out["a"]["n_units"] == 40 and out["b"]["n_units"] == 40
    assert out["a"]["raw_share"] == 0.5


def test_zipf_stats_known_slope(spark):
    """An exact power-law corpus (cnt = C / rank) must regress to -1."""
    from discoverx_spark.operators.packing import zipf_stats
    # token t{r} appears exactly 60//r times -> cnt = 60/rank
    rows = []
    did = 0
    for r in (1, 2, 3, 4, 5, 6):
        for _ in range(60 // r):
            rows.append((did, f"t{r}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = zipf_stats(df, "text", top_ranks=6).collect()[0]
    assert row["n_tokens"] == sum(60 // r for r in (1, 2, 3, 4, 5, 6))
    assert row["n_types"] == 6
    assert row["ranks_used"] == 6
    assert abs(row["zipf_slope"] - (-1.0)) < 1e-6


def test_zipf_stats_fewer_types_than_ranks(spark):
    from discoverx_spark.operators.packing import zipf_stats
    df = spark.createDataFrame(
        [(1, "a a a b")], "doc_id long, text string")
    row = zipf_stats(df, "text", top_ranks=1000).collect()[0]
    assert row["n_types"] == 2 and row["ranks_used"] == 2
    assert row["n_tokens"] == 4


def test_domain_divergence_hand_computed(spark):
    import math
    from discoverx_spark.operators.packing import domain_divergence
    # group a: [x, x, y]; group b: [y, z]; corpus: x:2 y:2 z:1, T=5
    df = spark.createDataFrame(
        [(1, "a", "x x y"), (2, "b", "y z")],
        "doc_id long, source string, text string")
    out = {r["group"]: r for r in
           domain_divergence(df, "source", "text").collect()}
    pa = {"x": 2 / 3, "y": 1 / 3}
    q = {"x": 0.4, "y": 0.4, "z": 0.2}
    kl_a = sum(p * math.log(p / q[t]) for t, p in pa.items())
    js_a = (sum(0.5 * (p * math.log(2 * p / (p + q[t]))
                       + q[t] * math.log(2 * q[t] / (p + q[t])))
                for t, p in pa.items())
            + 0.5 * (1 - sum(q[t] for t in pa)) * math.log(2))
    assert out["a"]["n_tokens"] == 3 and out["a"]["n_types"] == 2
    assert out["a"]["kl_vs_corpus"] == round(kl_a, 6)
    assert out["a"]["js_vs_corpus"] == round(js_a, 6)
    assert out["b"]["n_tokens"] == 2


def test_domain_divergence_single_group_is_zero(spark):
    from discoverx_spark.operators.packing import domain_divergence
    df = spark.createDataFrame(
        [(1, "only", "a b c a")], "doc_id long, source string, text string")
    row = domain_divergence(df, "source", "text").collect()[0]
    # P == Q -> both divergences exactly 0 (coverage term vanishes)
    assert row["kl_vs_corpus"] == 0.0 and row["js_vs_corpus"] == 0.0


def test_chunk_documents_coverage_and_overlap(spark):
    from discoverx_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4,
                          overlap_tokens=2)
    rows = {r["chunk_idx"]: r for r in out.collect()}
    # stride 2 over 10 tokens; trailing chunk at start 8 has no new
    # tokens beyond overlap? start 8 + overlap 2 = 10 >= n -> dropped
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t2 t3 t4 t5"
    assert rows[3]["chunk_text"] == "t6 t7 t8 t9"
    # every token appears in at least one chunk
    seen = set()
    for r in rows.values():
        seen.update(r["chunk_text"].split())
    assert seen == {f"t{i}" for i in range(10)}


def test_chunk_documents_no_overlap_and_validation(spark):
    import pytest as _pytest

    from discoverx_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=2)
    got = sorted((r["chunk_idx"], r["chunk_text"]) for r in out.collect())
    assert got == [(0, "a b"), (1, "c d"), (2, "e")]
    with _pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, "doc_id", "text", 4, 4)
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, "doc_id", "text", 0)
