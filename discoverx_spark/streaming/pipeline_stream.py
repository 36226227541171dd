"""Structured Streaming variant of the quality-filter pipeline.

The reference is batch-only (SURVEY §2.9: zero readStream/watermark hits);
this module is the rebuild's streaming extension: the same fused-UDF
``decide()`` plan (stateless, narrow) runs unchanged on a stream, plus
watermarked windowed keep-rate metrics and a custom stateful operator
(``applyInPandasWithState``) tracking per-conversation running state.

File source + ``availableNow`` trigger gives exactly-once batch-parity
runs in tests; swap the source/sink for Kafka/Iceberg in production — the
transformations are source-agnostic.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..pipeline import PipelineConfig, decide
from ..transcripts import TRANSCRIPTS_SCHEMA


def read_transcripts_stream(spark: SparkSession, input_path: str,
                            max_files_per_trigger: Optional[int] = None) -> DataFrame:
    reader = (spark.readStream.schema(TRANSCRIPTS_SCHEMA))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def decide_stream(stream_df: DataFrame,
                  cfg: PipelineConfig = PipelineConfig()) -> DataFrame:
    """decide() is stateless+narrow, so the exact batch plan runs on a
    stream — same fused Arrow UDF, same gates, same output schema."""
    return decide(stream_df, cfg)


def run_stream_once(spark: SparkSession, input_path: str, output_path: str,
                    checkpoint_path: str,
                    cfg: PipelineConfig = PipelineConfig()) -> None:
    """Process all available input files exactly once (availableNow),
    writing the decisions stream to parquet with a checkpoint — the
    streaming counterpart of the resumable batch runner: restarting after
    a kill resumes from the checkpoint without reprocessing."""
    stream = read_transcripts_stream(spark, input_path)
    q = (decide_stream(stream, cfg)
         .writeStream
         .format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def windowed_keep_metrics(decisions_with_ts: DataFrame,
                          window: str = "10 minutes",
                          watermark: str = "1 hour") -> DataFrame:
    """Watermarked windowed aggregation over the decision stream:
    keep-rate and PII density per event-time window (late rows beyond the
    watermark are dropped by the engine)."""
    return (
        decisions_with_ts
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(F.count("*").alias("n_turns"),
             F.avg(F.col("keep").cast("int")).alias("keep_rate"),
             F.avg((F.size(F.map_keys("pii_counts")) > 0).cast("int"))
             .alias("pii_rate"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "n_turns", "keep_rate", "pii_rate")
    )


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 watermark: str = "1 hour",
                 ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup: drop rows whose normalized-text fingerprint
    was already seen within the watermark horizon —
    ``dropDuplicatesWithinWatermark`` keys the engine's dedup state store
    on the fingerprint and expires state as event time advances, so the
    state size is bounded by the horizon's distinct-content volume (the
    ingest-side twin of the batch ``dedup_exact``).  Null-text rows get a
    whole-row-hash sentinel fingerprint (monotonically_increasing_id is
    not allowed on streams): distinct rows pass through, true full-row
    duplicates still dedup."""
    from ..functions.text import fingerprint_expr

    row_hash = F.sha2(F.to_json(F.struct(*[F.col(c)
                                           for c in stream_df.columns])), 256)
    fp = F.coalesce(fingerprint_expr(text_col),
                    F.concat(F.lit("__null__:"), row_hash))
    return (stream_df
            .withColumn("_fp", fp)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_fp"])
            .drop("_fp"))


def minhash_signatures_stream(stream_df: DataFrame, text_col: str = "text",
                              id_col: str = "conv_id", k: int = 16,
                              hash_mode: str = "xxhash64") -> DataFrame:
    """MinHash signature emission on ingest: the signature fold is a pure
    projection (zero shuffle), so the exact batch expression runs on the
    stream unchanged — write signatures alongside the raw turns and the
    downstream LSH dedup job never re-reads the text."""
    from ..operators.dedup import minhash_struct_expr, shingles_expr

    sh = shingles_expr(text_col, 3)
    return (stream_df
            .select(F.col(id_col).alias("id"),
                    minhash_struct_expr(sh, k, hash_mode).alias("_mh"))
            .select("id", *[F.col(f"_mh.m{i}").alias(f"mh_{i}")
                            for i in range(k)]))


_CONV_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_kept", T.LongType()),
])
_CONV_OUT_SCHEMA = ("conv_id string, n_turns long, n_kept long, "
                    "keep_rate double")


def conversation_state_stream(decisions_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-conversation totals via
    ``applyInPandasWithState`` (processing-time timeout) — the
    SURVEY §2.10 'custom stateful streaming op' slot."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        n_turns, n_kept = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_turns += len(pdf)
            n_kept += int(pdf["keep"].sum())
        state.update((n_turns, n_kept))
        yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n_turns],
                            "n_kept": [n_kept],
                            "keep_rate": [n_kept / max(n_turns, 1)]})

    return (decisions_stream
            .groupBy("conv_id")
            .applyInPandasWithState(
                update, outputStructType=_CONV_OUT_SCHEMA,
                stateStructType=_CONV_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_GATE_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_toxic", T.LongType()),
    T.StructField("n_pii", T.LongType()),
    T.StructField("n_viol", T.LongType()),
    T.StructField("last_idx", T.LongType()),
    T.StructField("last_role", T.StringType()),
])
_GATE_OUT_SCHEMA = ("conv_id string, n_turns long, toxic_frac double, "
                    "pii_frac double, n_alternation_violations long, "
                    "keep_conversation boolean")


def conversation_gates_stream(turns_stream: DataFrame, min_turns: int = 2,
                              max_turns: int = 512,
                              max_toxic_frac: float = 0.25,
                              max_pii_frac: float = 0.5,
                              max_alternation_violations: int = 0) -> DataFrame:
    """Streaming conversation-level gates: the running keep/drop verdict
    per conversation as its turns arrive (the ingest-side twin of the
    batch ``conversation_gates`` — same thresholds, same flag semantics
    via the shared ``conversation_turn_flags`` projection).

    The per-turn flags are computed JVM-side BEFORE the stateful stage,
    so the Python state update only counts; state is six scalars per
    live conversation.  All of a trigger's chunks for the group are
    concatenated and sorted by ``turn_idx`` ONCE (the engine splits a
    group into arbitrary-order Arrow chunks at maxRecordsPerBatch, so a
    per-chunk sort would interleave), then the stored boundary
    ``(last_idx, last_role)`` extends the alternation check across
    triggers — applied only when this trigger's first turn comes after
    the stored last one (in-order arrival), so out-of-order delivery
    degrades to skipping the one boundary comparison rather than
    inventing violations.  Exact for any conversation contained in one
    trigger (asserted by the batch-parity test)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from ..operators.convagg import conversation_turn_flags

    def _round6(x: float) -> float:
        # match Spark's F.round (BigDecimal HALF_UP on the double) —
        # Python's round() is half-even and diverges on exact halves
        return float(Decimal(x).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n_turns, n_toxic, n_pii, n_viol, last_idx, last_role = state.get
        else:
            n_turns, n_toxic, n_pii, n_viol, last_idx, last_role = \
                0, 0, 0, 0, -1, ""
        chunks = list(pdfs)
        pdf = (pd.concat(chunks, ignore_index=True) if chunks
               else pd.DataFrame(columns=["turn_idx", "role",
                                          "is_toxic", "has_pii"]))
        if len(pdf):
            pdf = pdf.sort_values("turn_idx")
            roles = pdf["role"].tolist()
            idxs = pdf["turn_idx"].tolist()
            n_turns += len(pdf)
            n_toxic += int(pdf["is_toxic"].fillna(0).sum())
            n_pii += int(pdf["has_pii"].fillna(0).sum())
            if (last_role != "" and int(idxs[0]) > last_idx
                    and roles[0] == last_role):
                n_viol += 1
            for j in range(1, len(roles)):
                if roles[j] == roles[j - 1]:
                    n_viol += 1
            last_idx, last_role = int(idxs[-1]), roles[-1]
        state.update((n_turns, n_toxic, n_pii, n_viol, last_idx, last_role))
        toxic_frac = _round6(n_toxic / max(n_turns, 1))
        pii_frac = _round6(n_pii / max(n_turns, 1))
        keep = (min_turns <= n_turns <= max_turns
                and toxic_frac <= max_toxic_frac
                and pii_frac <= max_pii_frac
                and n_viol <= max_alternation_violations)
        yield pd.DataFrame({
            "conv_id": [key[0]], "n_turns": [n_turns],
            "toxic_frac": [toxic_frac], "pii_frac": [pii_frac],
            "n_alternation_violations": [n_viol],
            "keep_conversation": [keep]})

    return (conversation_turn_flags(turns_stream)
            .groupBy("conv_id")
            .applyInPandasWithState(
                update, outputStructType=_GATE_OUT_SCHEMA,
                stateStructType=_GATE_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_TOOL_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_tool", T.LongType()),
    T.StructField("tools", T.StringType()),      # \x1f-joined distinct set
    T.StructField("last_idx", T.LongType()),
    T.StructField("last_tool", T.StringType()),
    T.StructField("run", T.LongType()),
    T.StructField("max_run", T.LongType()),
])
_TOOL_OUT_SCHEMA = ("conv_id string, n_turns long, n_tool_calls long, "
                    "n_distinct_tools long, max_tool_run int, "
                    "tool_frac double, keep_tool_gate boolean")


def tool_call_stats_stream(turns_stream: DataFrame,
                           max_tool_frac: float = 0.8,
                           max_tool_run: int = 8) -> DataFrame:
    """Streaming twin of ``operators.convagg.tool_call_stats``: the
    running tool-usage profile + runaway-loop verdict per conversation
    as its turns arrive — an agent executor can cut a looping trace off
    at ingest instead of after the fact.

    State per live conversation is seven scalars (the distinct-tool set
    rides as one joined string — tool vocabularies are small by nature).
    Chunks are concatenated and sorted by ``turn_idx`` once per trigger
    (the gates-stream discipline); the stored ``(last_idx, last_tool,
    run)`` boundary extends same-tool runs across triggers only when
    this trigger's first turn arrives after the stored last one, so
    out-of-order delivery degrades to starting a fresh run rather than
    inventing loops.  Exact for any conversation contained in one
    trigger (batch-parity asserted in tests)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    def _round6(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            (n_turns, n_tool, tools_s, last_idx, last_tool,
             run, max_run) = state.get
        else:
            n_turns, n_tool, tools_s, last_idx, last_tool, run, max_run = \
                0, 0, "", -1, "", 0, 0
        tools = set(tools_s.split("\x1f")) if tools_s else set()
        chunks = list(pdfs)
        pdf = (pd.concat(chunks, ignore_index=True) if chunks
               else pd.DataFrame(columns=["turn_idx", "role", "tool"]))
        if len(pdf):
            pdf = pdf.sort_values("turn_idx")
            n_turns += len(pdf)
            in_order = int(pdf["turn_idx"].iloc[0]) > last_idx
            if not in_order:
                last_tool, run = "", 0
            for _, row in pdf.iterrows():
                if row["role"] != "tool":
                    continue
                # "\x00" encodes a NULL tool name: the batch twin's
                # eqNullSafe chains consecutive NULLs into ONE run but
                # count_distinct excludes them — mirror both
                tool = row["tool"] if isinstance(row["tool"], str) \
                    else "\x00"
                n_tool += 1
                if tool != "\x00":
                    tools.add(tool)
                run = run + 1 if (last_tool != "" and tool == last_tool) \
                    else 1
                max_run = max(max_run, run)
                last_tool = tool
            last_idx = int(pdf["turn_idx"].iloc[-1])
        state.update((n_turns, n_tool, "\x1f".join(sorted(tools)),
                      last_idx, last_tool, run, max_run))
        tool_frac = _round6(n_tool / max(n_turns, 1))
        keep = tool_frac <= max_tool_frac and max_run <= max_tool_run
        yield pd.DataFrame({
            "conv_id": [key[0]], "n_turns": [n_turns],
            "n_tool_calls": [n_tool], "n_distinct_tools": [len(tools)],
            "max_tool_run": [int(max_run)], "tool_frac": [tool_frac],
            "keep_tool_gate": [keep]})

    return (turns_stream.select("conv_id", "turn_idx", "role", "tool")
            .groupBy("conv_id")
            .applyInPandasWithState(
                update, outputStructType=_TOOL_OUT_SCHEMA,
                stateStructType=_TOOL_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def keyword_gate_stream(stream_df: DataFrame,
                        keywords,
                        text_col: str = "text",
                        max_hits: int = 0) -> DataFrame:
    """Streaming blocklist gate: Aho-Corasick multi-keyword matching on
    ingest — rows whose total (greedy non-overlapping) match count
    exceeds ``max_hits`` are dropped, the rest pass through annotated
    with ``kw_hits``.  The automaton kernel is the SAME Arrow UDF the
    batch ``keyword_match`` query uses (per-worker build, O(text) per
    row, stateless), so the stream/batch decision parity holds by
    construction — verified in tests by running the identical frame both
    ways."""
    from ..functions.keywords import make_keyword_match_udf

    udf = make_keyword_match_udf(keywords)
    hits = F.aggregate(udf(F.col(text_col)), F.lit(0),
                       lambda acc, m: acc + m["cnt"])
    return (stream_df
            .withColumn("kw_hits", F.coalesce(hits, F.lit(0)))
            .filter(F.col("kw_hits") <= max_hits))
