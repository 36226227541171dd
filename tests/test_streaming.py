"""Streaming pipeline tests: availableNow batch-parity, checkpoint resume,
watermarked windows, custom stateful operator."""

import os

import pytest
from pyspark.sql import functions as F

from discoverx_spark.pipeline import PipelineConfig, decide
from discoverx_spark.streaming import (conversation_state_stream,
                                       decide_stream, run_stream_once,
                                       windowed_keep_metrics)
from discoverx_spark.streaming.pipeline_stream import read_transcripts_stream
from discoverx_spark.transcripts import generate_transcripts

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "in")
    generate_transcripts(spark, 60, seed=21).write.mode("overwrite").parquet(path)
    return path


def test_stream_matches_batch(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_stream_once(spark, input_dir, out, ckpt, CFG)
    stream_rows = {(r["conv_id"], r["turn_idx"]): (r["keep"], r["scrubbed_text"])
                   for r in spark.read.parquet(out).collect()}
    batch_rows = {(r["conv_id"], r["turn_idx"]): (r["keep"], r["scrubbed_text"])
                  for r in decide(spark.read.parquet(input_dir), CFG).collect()}
    assert stream_rows == batch_rows


def test_stream_checkpoint_resume_no_duplicates(spark, input_dir, tmp_path):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    run_stream_once(spark, input_dir, out, ckpt, CFG)
    n1 = spark.read.parquet(out).count()
    # second run with the same checkpoint: no new input → no new rows
    run_stream_once(spark, input_dir, out, ckpt, CFG)
    assert spark.read.parquet(out).count() == n1


def test_tool_call_stats_stream_matches_batch(spark, input_dir, tmp_path):
    from discoverx_spark.operators.convagg import tool_call_stats
    from discoverx_spark.streaming import tool_call_stats_stream

    stream = read_transcripts_stream(spark, input_dir)
    q = (tool_call_stats_stream(stream)
         .writeStream.format("memory").queryName("toolstats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    cols = ("n_turns", "n_tool_calls", "n_distinct_tools", "max_tool_run",
            "tool_frac", "keep_tool_gate")
    got = {r["conv_id"]: tuple(r[c] for c in cols)
           for r in spark.sql("SELECT * FROM toolstats").collect()}
    exp = {r["conv_id"]: tuple(r[c] for c in cols)
           for r in tool_call_stats(
               spark.read.parquet(input_dir)).collect()}
    assert set(got) == set(exp)
    for conv in exp:
        assert got[conv] == exp[conv], conv
    # the generated corpus must actually exercise tool turns
    assert any(v[1] > 0 for v in exp.values())


def test_windowed_keep_metrics(spark, input_dir, tmp_path):
    stream = read_transcripts_stream(spark, input_dir)
    decisions = decide_stream(stream, CFG)
    # re-attach event time (ts survives in the input; decide drops it)
    src = read_transcripts_stream(spark, input_dir).select("conv_id", "turn_idx", "ts")
    joined = decisions.join(src, on=["conv_id", "turn_idx"])
    q = (windowed_keep_metrics(joined, window="1 hour")
         .writeStream.format("memory").queryName("winmetrics")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM winmetrics").collect()
    # append mode emits only watermark-closed windows; availableNow single
    # batch may close none — assert the query ran and schema is right
    assert {c for c in spark.table("winmetrics").columns} == {
        "window_start", "window_end", "n_turns", "keep_rate", "pii_rate"}


def test_conversation_state_stream(spark, input_dir, tmp_path):
    stream = read_transcripts_stream(spark, input_dir)
    decisions = decide_stream(stream, CFG).select("conv_id", "keep")
    q = (conversation_state_stream(decisions)
         .writeStream.format("memory").queryName("convstate")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["conv_id"]: (r["n_turns"], r["n_kept"])
           for r in spark.sql("SELECT * FROM convstate").collect()}
    exp = {r["conv_id"]: (r["n"], r["k"]) for r in
           decide(spark.read.parquet(input_dir), CFG)
           .groupBy("conv_id")
           .agg(F.count("*").alias("n"),
                F.sum(F.col("keep").cast("long")).alias("k")).collect()}
    # final state per conversation must equal the batch aggregate
    for conv, (n, k) in exp.items():
        assert got[conv] == (n, k), conv


def test_dedup_stream_drops_repeats(spark, input_dir, tmp_path):
    from discoverx_spark.streaming.pipeline_stream import dedup_stream

    stream = read_transcripts_stream(spark, input_dir)
    out_dir = str(tmp_path / "dedup_out")
    q = (dedup_stream(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    batch = spark.read.parquet(input_dir)
    # one survivor per distinct normalized text; null/blank rows preserved
    from discoverx_spark.functions.text import fingerprint_expr
    n_distinct = (batch.filter(F.col("text").isNotNull())
                  .select(fingerprint_expr("text").alias("f"))
                  .distinct().count())
    n_null = batch.filter(F.col("text").isNull()).count()
    assert got.count() == n_distinct + n_null


def test_minhash_signatures_stream_matches_batch(spark, input_dir, tmp_path):
    from discoverx_spark.operators.dedup import minhash_signatures
    from discoverx_spark.streaming import minhash_signatures_stream

    stream = read_transcripts_stream(spark, input_dir)
    out_dir = str(tmp_path / "sig_out")
    q = (minhash_signatures_stream(stream, k=8)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "sig_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    batch = spark.read.parquet(input_dir)
    want = {tuple(r) for r in
            minhash_signatures(batch, "text", "conv_id", k=8).collect()}
    assert got == want


def test_hash_sample_on_stream_matches_batch(spark, input_dir, tmp_path):
    """Deterministic sampling is a stateless projection filter, so it is
    stream-safe and its keep set equals the batch keep set — the property
    that makes a sampled ingest resumable (df.sample would give each
    micro-batch its own draw)."""
    from discoverx_spark.operators.sampling import stratified_hash_sample

    stream = read_transcripts_stream(spark, input_dir)
    out_dir = str(tmp_path / "sample_out")
    q = (stratified_hash_sample(stream, "conv_id", "role",
                                {"user": 1.0, "assistant": 0.3})
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "sample_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["conv_id"], r["turn_idx"])
           for r in spark.read.parquet(out_dir).collect()}
    want = {(r["conv_id"], r["turn_idx"]) for r in
            stratified_hash_sample(spark.read.parquet(input_dir),
                                   "conv_id", "role",
                                   {"user": 1.0, "assistant": 0.3}).collect()}
    assert got == want and len(got) > 0


def test_conversation_gates_stream_matches_batch(spark, input_dir, tmp_path):
    from discoverx_spark.operators.convagg import conversation_gates
    from discoverx_spark.streaming.pipeline_stream import \
        conversation_gates_stream

    stream = read_transcripts_stream(spark, input_dir)
    q = (conversation_gates_stream(stream)
         .writeStream.format("memory").queryName("convgates")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["conv_id"]: (r["n_turns"], r["toxic_frac"], r["pii_frac"],
                          r["n_alternation_violations"],
                          r["keep_conversation"])
           for r in spark.sql("SELECT * FROM convgates").collect()}
    exp = {r["conv_id"]: (r["n_turns"], r["toxic_frac"], r["pii_frac"],
                          r["n_alternation_violations"],
                          r["keep_conversation"])
           for r in conversation_gates(
               spark.read.parquet(input_dir)).collect()}
    assert set(got) == set(exp)
    for conv in exp:
        assert got[conv] == exp[conv], conv


def test_keyword_gate_stream_matches_batch(spark, input_dir, tmp_path):
    """The Aho-Corasick gate is a stateless Arrow-UDF projection filter,
    so the streaming keep set must equal the batch keep set."""
    from discoverx_spark.streaming.pipeline_stream import keyword_gate_stream

    kws = ["the", "hello", "tool"]
    stream = read_transcripts_stream(spark, input_dir)
    out_dir = str(tmp_path / "kw_out")
    q = (keyword_gate_stream(stream, kws, max_hits=1)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "kw_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["conv_id"], r["turn_idx"], r["kw_hits"])
           for r in spark.read.parquet(out_dir).collect()}
    want = {(r["conv_id"], r["turn_idx"], r["kw_hits"])
            for r in keyword_gate_stream(spark.read.parquet(input_dir),
                                         kws, max_hits=1).collect()}
    assert got == want
    full = spark.read.parquet(input_dir).count()
    assert 0 < len(got) < full
