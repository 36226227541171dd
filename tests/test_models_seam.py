"""Model-loading seam: external artifact files drop into the pipeline
with zero code change and byte-identical scores.

Proves the LIMITATIONS §1 claim concretely: a real fastText / KenLM /
DCLM export, converted offline to the portable formats in
``functions/models.py``, rides the exact same public parameters the
embedded stand-ins use.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from discoverx_spark.functions.models import (broadcast_model, load_char_lm,
                                              load_stopwords,
                                              load_term_weights, save_char_lm,
                                              save_stopwords,
                                              save_term_weights)


def test_char_lm_roundtrip_byte_identical_scores(spark, sf_dir, tmp_path):
    """train_char_lm → save → load → make_perplexity_udf: scores are
    bit-identical to the in-memory matrix, via both .npy and .json."""
    from discoverx_spark.functions.perplexity import (make_perplexity_udf,
                                                      train_char_lm)

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(50))
    lm = train_char_lm(docs, "text")

    for fname in ["lm.npy", "lm.json"]:
        path = str(tmp_path / fname)
        save_char_lm(lm, path)
        reloaded = load_char_lm(path)
        assert reloaded.dtype == np.float64
        assert np.array_equal(reloaded, lm), fname  # bit-exact

        direct = docs.select(
            "doc_id", make_perplexity_udf(lm)("text").alias("p")).collect()
        via_seam = docs.select(
            "doc_id",
            make_perplexity_udf(reloaded, spark=spark)("text").alias("p"),
        ).collect()
        d = {r["doc_id"]: r["p"] for r in direct}
        s = {r["doc_id"]: r["p"] for r in via_seam}
        assert d == s, fname  # exact float equality, not approx


def test_term_weights_roundtrip_and_classifier_drop_in(spark, tmp_path):
    from discoverx_spark.functions.text import quality_classifier_frame

    weights = {f"w{i}": (i - 50) / 17.0 for i in range(100)}
    weights["don't"] = 1.25  # quoting hazard
    for fname in ["w.json", "w.parquet"]:
        path = str(tmp_path / fname)
        save_term_weights(weights, path)
        reloaded = load_term_weights(path)
        assert reloaded == weights, fname  # exact doubles

    df = spark.createDataFrame(
        [(1, "w0 w99 don't unseen"), (2, "")], "doc_id long, text string")
    a = quality_classifier_frame(df, "doc_id", weights=weights,
                                 bias=0.0).collect()
    b = quality_classifier_frame(
        df, "doc_id",
        weights=load_term_weights(str(tmp_path / "w.parquet")),
        bias=0.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stopword_tables_roundtrip_and_langid_drop_in(spark, tmp_path):
    from discoverx_spark.functions.text import (LANG_STOPWORDS,
                                                langid_struct_expr,
                                                make_langid_udf)

    for fname in ["stop.json", "stop.parquet"]:
        path = str(tmp_path / fname)
        save_stopwords(LANG_STOPWORDS, path)
        assert load_stopwords(path) == {
            k: list(v) for k, v in LANG_STOPWORDS.items()}, fname

    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "der hund ist nicht da"),
         (3, "zzz qqq")], "doc_id long, text string")
    loaded = load_stopwords(str(tmp_path / "stop.json"))

    base = df.select("doc_id", langid_struct_expr("text").alias("l")).collect()
    seam = df.select(
        "doc_id", langid_struct_expr("text", stopwords=loaded).alias("l"),
    ).collect()
    assert [(r["doc_id"], r["l"]) for r in base] == \
        [(r["doc_id"], r["l"]) for r in seam]

    base_u = df.select("doc_id", make_langid_udf()("text").alias("l")).collect()
    seam_u = df.select(
        "doc_id", make_langid_udf(stopwords=loaded)("text").alias("l"),
    ).collect()
    assert [(r["doc_id"], r["l"]) for r in base_u] == \
        [(r["doc_id"], r["l"]) for r in seam_u]

    # a custom external table changes behavior through the same seam
    custom = {"xx": ["zzz", "qqq"]}
    got = {r["doc_id"]: r["l"]["lang"] for r in df.select(
        "doc_id", langid_struct_expr("text", stopwords=custom).alias("l"),
    ).collect()}
    assert got[3] == "xx" and got[1] == "und"


def test_broadcast_model_caches_per_session(spark, tmp_path):
    calls = []

    def loader():
        calls.append(1)
        return {"k": 1}

    b1 = broadcast_model(spark, "test_cache_key", loader)
    b2 = broadcast_model(spark, "test_cache_key", loader)
    assert b1 is b2 and len(calls) == 1
    assert b1.value == {"k": 1}


def test_broadcast_model_evicts_stopped_sessions(spark):
    from discoverx_spark.functions import models as m

    # simulate a handle left behind by a stopped session (only one
    # SparkContext can be active per process, so any foreign appId is
    # necessarily dead) — the next call must evict it, not accumulate
    m._BROADCASTS[("app-from-stopped-session", "old_key")] = object()
    b = broadcast_model(spark, "evict_probe_key", lambda: {"v": 2})
    assert ("app-from-stopped-session", "old_key") not in m._BROADCASTS
    assert b.value == {"v": 2}


def test_content_key_is_digest_not_hash():
    from discoverx_spark.functions.models import content_key

    k1 = content_key("m", b"payload-a")
    k2 = content_key("m", b"payload-b")
    assert k1 != k2 and k1.startswith("m_") and len(k1) > 40
    # deterministic across processes (unlike salted hash())
    assert k1 == content_key("m", b"payload-a")
