"""Connected-components dedup clustering and IVF centroid training."""

from __future__ import annotations

from pyspark.sql import functions as F

from discoverx_spark.operators.dedup import (connected_components,
                                             dedup_clusters)
from discoverx_spark.operators.similarity import ivf_assign, ivf_train


def test_connected_components_basic(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "id_a long, id_b long")
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_connected_components_star_pairs_chain(spark):
    """Star pairs from a capped hot bucket + a bridge edge must still fold
    into one component (the property the cap relies on)."""
    star = [(0, i) for i in range(1, 50)]          # capped mega-bucket
    bridge = [(49, 100), (100, 101)]               # chains to another group
    pairs = spark.createDataFrame(star + bridge, "id_a long, id_b long")
    comp = connected_components(pairs)
    assert comp.select("component").distinct().count() == 1
    assert comp.count() == 52


def test_dedup_clusters_end_to_end(spark):
    clones = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the exact same boilerplate text appears everywhere").alias("text"))
    uniq = spark.range(5).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(F.lit("completely distinct document text number "),
                 F.col("id").cast("string")).alias("text"))
    comp = dedup_clusters(clones.unionByName(uniq), "text", "doc_id",
                          k=8, bands=4, threshold=0.9, max_bucket=50)
    rows = {r["id"]: r["component"] for r in comp.collect()}
    # all 200 clones in one component rooted at min id 0; uniques absent
    assert set(rows) == set(range(200))
    assert set(rows.values()) == {0}


def test_ivf_train_and_assign(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    centers = [np.eye(4)[i] for i in range(4)]
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + rng.randn(4) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train(df, n_centroids=4, n_iter=4)
    assert cents.count() == 4
    assigned = ivf_assign(df, cents.withColumnRenamed("centroid", "embedding")
                          .withColumnRenamed("centroid_id", "vec_id"))
    # every trained cell should be used and clusters should be pure-ish:
    # vectors near the same axis share a centroid
    joined = assigned.join(df.select(F.col("vec_id").alias("id"),
                                     (F.col("vec_id") % 4).alias("true_c")),
                           on="id")
    purity = (joined.groupBy("centroid_id", "true_c").count()
              .groupBy("centroid_id").agg(F.max("count").alias("top"),
                                          F.sum("count").alias("n"))
              .select((F.sum("top") / F.sum("n")).alias("p")).collect()[0]["p"])
    assert purity > 0.95


def test_ivf_train_high_dim_bounded_plan(spark):
    """At embedding dims (512 here, 1536+ in production) training must not
    build a dim-wide aggregate: the posexplode shape keeps the optimized
    plan dimension-oblivious (VERDICT r2 #9)."""
    import numpy as np
    dim, n = 512, 64
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in
                 np.eye(4)[i % 4].repeat(dim // 4) + rng.randn(dim) * 0.02])
            for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train(df, n_centroids=4, n_iter=2)
    got = cents.collect()
    assert len(got) == 4
    assert all(len(r.centroid) == dim for r in got)
    # plan size must not scale with dim: a 512-column aggregate would blow
    # far past this bound
    plan = cents._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000, len(plan)
    # means are genuinely per-dimension: each centroid tracks one axis block
    m = {r.centroid_id: np.array(r.centroid) for r in got}
    for cid, vec in m.items():
        blocks = vec.reshape(4, dim // 4).mean(axis=1)
        assert blocks.max() > 0.8 and sorted(blocks)[-2] < 0.2


def test_cluster_representatives_quality_and_singletons(spark):
    from discoverx_spark.operators.dedup import cluster_representatives
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest text wins"), (3, "mid text"),
         (4, "singleton doc"), (5, "tie a"), (6, "tie b")],
        "doc_id long, text string")
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)], "id long, component long")
    out = {r["id"]: r for r in cluster_representatives(
        docs, "doc_id", comp, quality=F.length("text")).collect()}
    # longest member elected in cluster 1
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    assert all(out[i]["rep_id"] == 2 for i in (1, 2, 3))
    assert out[1]["cluster_size"] == 3
    # doc 4 absent from components -> its own singleton representative
    assert out[4]["keep"] and out[4]["component"] == 4 \
        and out[4]["cluster_size"] == 1
    # equal quality ("tie a"/"tie b" same length) -> min id wins
    assert out[5]["keep"] and not out[6]["keep"]


def test_cluster_representatives_default_min_id(spark):
    from discoverx_spark.operators.dedup import cluster_representatives
    docs = spark.createDataFrame(
        [(7, "x"), (8, "yyyy"), (9, "zz")], "doc_id long, text string")
    comp = spark.createDataFrame(
        [(7, 7), (8, 7), (9, 7)], "id long, component long")
    out = {r["id"]: r for r in
           cluster_representatives(docs, "doc_id", comp).collect()}
    assert out[7]["keep"] and not out[8]["keep"] and not out[9]["keep"]
