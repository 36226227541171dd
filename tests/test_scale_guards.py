"""Web-scale guard rails: hot-bucket caps, null-text passthrough, and the
pigeonhole-recall fix for SimHash blocking.

The hot-bucket cap is the 100 TB survival property for LSH dedup: a
mega-cluster of m identical documents must emit O(m) candidate pairs
(representative star pairs), never m²/2.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from discoverx_spark.operators.dedup import (_bucket_pairs, dedup_exact,
                                             lsh_candidate_pairs,
                                             minhash_near_duplicates,
                                             minhash_signatures,
                                             simhash_expr,
                                             simhash_near_duplicates)
from discoverx_spark.operators.similarity import lsh_near_duplicates


@pytest.fixture(scope="module")
def hot_docs(spark):
    """10k identical docs (one mega-cluster) + 50 distinct docs."""
    clones = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("i agree to the terms and conditions of this service").alias("text"))
    distinct = spark.range(50).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id").cast("string"),
                 F.lit(" with its own words entirely")).alias("text"))
    return clones.unionByName(distinct)


def test_lsh_hot_bucket_cap_bounds_pairs(spark, hot_docs):
    sigs = minhash_signatures(hot_docs, "text", "doc_id", k=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, k=8, max_bucket=100)
    n = pairs.count()
    # star pairs: 9_999 for the mega-cluster (per band, deduped), linear not
    # quadratic (uncapped would be ~5*10^7)
    assert n <= 15_000
    # every clone stays connected to the min-id representative
    star = pairs.filter(F.col("id_a") == 0).count()
    assert star == 9_999


def test_lsh_cap_equivalent_when_under_cap(spark):
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") % 10).cast("string"),
                 F.lit(" shared body of text for grouping purposes")).alias("text"))
    sigs = minhash_signatures(docs, "text", "doc_id", k=8)
    uncapped = set(map(tuple, lsh_candidate_pairs(sigs, bands=4, k=8,
                                                  max_bucket=None).collect()))
    capped = set(map(tuple,
                     lsh_candidate_pairs(sigs, bands=4, k=8,
                                         max_bucket=1000).collect()))
    assert uncapped == capped


def test_minhash_neardup_capped_completes(spark, hot_docs):
    out = minhash_near_duplicates(hot_docs, "text", "doc_id", k=8, bands=4,
                                  threshold=0.9, max_bucket=100)
    rows = out.count()
    assert 9_999 <= rows <= 15_000


def test_simhash_hot_block_cap(spark, hot_docs):
    out = simhash_near_duplicates(hot_docs, "text", "doc_id",
                                  max_hamming=0, max_bucket=100)
    assert out.filter(F.col("id_a") == 0).count() == 9_999


def test_embedding_lsh_hot_bucket_cap(spark):
    vecs = spark.range(2_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i)) for i in [1.0, 0.5, 0.25, 0.125]]).alias("embedding"))
    out = lsh_near_duplicates(vecs, threshold=0.99, n_planes=6, dim=4,
                              max_bucket=50)
    n = out.count()
    assert n == 1_999  # star pairs only, not 2M/2
    assert out.filter(F.col("id_a") == 0).count() == 1_999


def test_dedup_exact_null_text_passthrough(spark):
    rows = [(1, "same text"), (2, "same text"), (3, None), (4, None),
            (5, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact(df, "text", "doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    # one survivor per dup group; BOTH null-text rows pass through
    assert kept == [1, 3, 4, 5]


def test_simhash_pigeonhole_recall(spark):
    """Blocking with max_hamming+1 fields must find every pair within the
    advertised Hamming radius — compare against the brute-force truth."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = [(i, base.replace(w, w + "x"))
             for i, w in enumerate(base.split()[:12])]
    texts.append((100, base))
    df = spark.createDataFrame(texts, "doc_id long, text string")

    blocked = {(r.id_a, r.id_b)
               for r in simhash_near_duplicates(df, "text", "doc_id",
                                                bits=64, max_hamming=3).collect()}

    sims = df.select(F.col("doc_id").alias("id"),
                     simhash_expr("text", bits=64).alias("sh")).collect()
    truth = set()
    for i, a in enumerate(sims):
        for b in sims[i + 1:]:
            lo, hi = sorted((a.id, b.id))
            if bin((a.sh ^ b.sh) & ((1 << 64) - 1)).count("1") <= 3:
                truth.add((lo, hi))
    assert blocked == truth


def test_lsh_and_simhash_defaults_are_capped(spark, hot_docs):
    """Default arguments must survive a mega-cluster: no m²/2 blowup."""
    sigs = minhash_signatures(hot_docs, "text", "doc_id", k=8)
    n = lsh_candidate_pairs(sigs, bands=4, k=8).count()  # defaults
    assert n <= 15_000
    out = simhash_near_duplicates(hot_docs, "text", "doc_id")  # defaults
    assert out.filter(F.col("id_a") == 0).count() == 9_999


def test_simhash_md5_bits_guard():
    with pytest.raises(ValueError, match="32 random bits"):
        simhash_expr("text", bits=64, hash_mode="md5")


@pytest.fixture(scope="module")
def capped_collision_docs(spark):
    """10 clones of text A + one text B that shares exactly ONE LSH band
    with A (k=8, bands=4) but only 3/8 signature agreement (est 0.375) —
    a banding collision of non-near docs inside an over-cap bucket."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_a = base + " tail1 word7 extra3"
    text_b = base + " tail7 word10 extra10"
    rows = [(i, text_a) for i in range(10)] + [(100, text_b)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capped_star_pairs_verified_by_default(spark, capped_collision_docs):
    """Documented guarantee (LIMITATIONS §8): a capped-bucket member is kept
    only if its (representative, member) star pair itself passes
    verification — the sub-threshold B is dropped by default."""
    from discoverx_spark.operators.dedup import minhash_near_duplicates
    out = {(r.id_a, r.id_b): r.est_jaccard
           for r in minhash_near_duplicates(
               capped_collision_docs, "text", "doc_id", k=8, bands=4,
               threshold=0.9, max_bucket=5).collect()}
    assert set(out) == {(0, i) for i in range(1, 10)}  # clones only
    assert all(v == 1.0 for v in out.values())


def test_capped_star_pairs_kept_when_requested(spark, capped_collision_docs):
    from discoverx_spark.operators.dedup import minhash_near_duplicates
    out = {(r.id_a, r.id_b): r.est_jaccard
           for r in minhash_near_duplicates(
               capped_collision_docs, "text", "doc_id", k=8, bands=4,
               threshold=0.9, max_bucket=5,
               keep_capped_star=True).collect()}
    assert (0, 100) in out          # star pair bypasses verification
    assert out[(0, 100)] < 0.9      # and reports its real estimate


def test_dedup_clusters_keep_capped_bucket_connected(spark,
                                                     capped_collision_docs):
    """dedup_clusters routes star pairs into the components unverified, so
    the banding-collision member stays in the mega-cluster's component
    (precision traded for connectivity — LIMITATIONS §8)."""
    from discoverx_spark.operators.dedup import dedup_clusters
    comp = {r.id: r.component
            for r in dedup_clusters(capped_collision_docs, "text", "doc_id",
                                    k=8, bands=4, threshold=0.9,
                                    max_bucket=5).collect()}
    assert comp[100] == 0


def test_connected_components_nonconvergence_warns(spark):
    from discoverx_spark.operators.dedup import connected_components
    # 400-node path: even with pointer jumping, 1 round cannot converge
    chain = spark.createDataFrame([(i, i + 1) for i in range(400)],
                                  "id_a long, id_b long")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(chain, max_iter=1).collect()


def test_connected_components_log_rounds_on_deep_chain(spark):
    """Pointer jumping: a 256-node path (diameter 255) must converge well
    inside the default max_iter=20 (plain propagation would need ~255
    rounds) and produce the single correct component."""
    import warnings
    from discoverx_spark.operators.dedup import connected_components
    chain = spark.createDataFrame([(i, i + 1) for i in range(255)],
                                  "id_a long, id_b long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        comp = {r.id: r.component
                for r in connected_components(chain).collect()}
    assert set(comp) == set(range(256))
    assert set(comp.values()) == {0}


def test_bucket_pairs_star_carries_extra_cols(spark):
    df = spark.createDataFrame(
        [(i, "k", i * 10) for i in range(5)], "id long, b string, v long")
    out = _bucket_pairs(df, key_cols=["b"], extra_cols=["v"], max_bucket=2)
    rows = {(r.id_a, r.id_b, r.v_a, r.v_b) for r in out.collect()}
    assert rows == {(0, i, 0, i * 10) for i in range(1, 5)}


def test_incremental_lsh_never_joins_index_with_itself(spark, hot_docs):
    """A mega-cluster in the INDEX must not explode an incremental run:
    with a 10-doc new batch, output is bounded by new×index collisions —
    never the index's internal m²/2."""
    from discoverx_spark.operators.dedup import (incremental_lsh_pairs,
                                                 minhash_signatures)
    idx = minhash_signatures(hot_docs, "text", "doc_id", k=8)
    new = hot_docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    new_sigs = minhash_signatures(new, "text", "doc_id", k=8)
    pairs = incremental_lsh_pairs(idx, new_sigs, bands=4, k=8)
    n = pairs.count()
    # 5 new clones × 10_000 index clones + within-new pairs ≈ 50_010;
    # the index's own 5·10⁷ pairs never appear
    assert 50_000 <= n <= 50_100
    # plan property: the index side is probed via a broadcast of the new
    # batch — no shuffle of the index bands
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sparse_neardup_df_cap_prunes_mega_postings(spark, hot_docs):
    """The high-df postings cap is the sparse family's m²/2 guard: the
    10k-clone mega-cluster's terms all have df≈10k and are pruned at
    max_df=100, so it contributes ZERO pairs (exact dedup owns identical
    docs) — while a planted rare-vocabulary near-dup pair is still found."""
    from discoverx_spark.operators.retrieval import sparse_near_duplicates
    planted = spark.createDataFrame(
        [(2_000_000, "zephyr quixotic marmalade flotilla syzygy"),
         (2_000_001, "zephyr quixotic marmalade flotilla parallax")],
        "doc_id long, text string")
    corpus = hot_docs.unionByName(planted)
    out = {(r.id_a, r.id_b)
           for r in sparse_near_duplicates(corpus, "text", "doc_id",
                                           threshold=0.5,
                                           max_df=100).collect()}
    assert (2_000_000, 2_000_001) in out
    # the 10k-clone block (ids < 1M) contributes no pairs at all — its
    # entire vocabulary was pruned at the cap. (The 50 'unique document
    # number N' docs at 1M+ legitimately pair: they share low-df terms.)
    assert not any(a < 1_000_000 or b < 1_000_000 for a, b in out)


def test_line_dedup_hot_boilerplate_line(spark):
    """One line shared by EVERY doc (cookie-banner shape): the removal
    set stays linear in corpus size (one removal per doc, not a pair
    blowup) and exactly the first occurrence survives."""
    from discoverx_spark.operators.dedup import line_dedup
    n = 3000
    rows = [(i, f"unique line {i}\nAccept all cookies") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(8)
    out = line_dedup(df, "text", "doc_id")
    removed_total = out.agg(F.sum("n_removed")).first()[0]
    assert removed_total == n - 1
    keeper = out.filter(F.col("clean_text").contains("cookies")).collect()
    assert [r["doc_id"] for r in keeper] == [0]
