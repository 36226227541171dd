"""Sequence packing and corpus vocabulary — pretraining-prep operators.

``pack_sequences`` implements the standard concat-then-chunk packing used
to fill fixed context windows: documents are laid out on one token tape in
a deterministic total order (ORDER BY id), and each document is assigned
the context window in which its first token lands
(``bin_id = floor(start_offset / max_tokens)``).  Spark shape: one
running-sum window — a range-partitioned sort, the minimal machinery for a
global order.  At 100 TB pass ``partition_col`` (shard/language) so the
sort and the window stay within partitions (one tape per partition, no
global coordination).

``token_counts`` / ``top_tokens`` build the corpus vocabulary: explode →
groupBy(token) with map-side partial aggregation (the shuffle carries one
row per distinct token per task, not per occurrence); top-k is a
TakeOrdered, never a full sort collect.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count_expr, tokens_sql_expr


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   max_tokens: int,
                   partition_col: Optional[str] = None) -> DataFrame:
    """(id, n_tokens, start_offset, bin_id[, partition]) — concat-then-chunk
    window assignment under a deterministic (partition, id) total order.

    ``partition_col=None`` means ONE global tape: Spark executes an
    unpartitioned running-sum window on a single task, so it only fits
    inputs that fit one executor — a ``RuntimeWarning`` flags it.  At
    scale always pass a tape key (shard, language, date bucket)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if partition_col is None:
        import warnings

        warnings.warn(
            "pack_sequences(partition_col=None) builds ONE global tape — "
            "the running-sum window executes on a single task; pass a "
            "partition_col (shard/language) for inputs beyond one executor",
            RuntimeWarning, stacklevel=2)
    w = (Window.partitionBy(partition_col) if partition_col
         else Window.partitionBy()).orderBy("id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = df.select(
        *([partition_col] if partition_col else []),
        F.col(id_col).alias("id"),
        F.coalesce(token_count_expr(text_col), F.lit(0))
        .cast("long").alias("n_tokens"))
    cum = base.withColumn("_cum", F.sum("n_tokens").over(w))
    return (cum.withColumn("start_offset", F.col("_cum") - F.col("n_tokens"))
            .withColumn("bin_id",
                        F.floor(F.col("start_offset") / max_tokens))
            .drop("_cum"))


def token_counts(df: DataFrame, text_col: str,
                 min_count: int = 1) -> DataFrame:
    """(token, count) over lowercased whitespace tokens."""
    toks = df.select(F.explode(tokens_sql_expr(text_col)).alias("token"))
    out = toks.groupBy("token").agg(F.count("*").alias("count"))
    return out.filter(F.col("count") >= min_count) if min_count > 1 else out


def top_tokens(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Top-k vocabulary with a deterministic total order (count desc,
    token asc)."""
    return (token_counts(df, text_col)
            .orderBy(F.desc("count"), F.asc("token")).limit(k))


def zipf_stats(df: DataFrame, text_col: str,
               top_ranks: int = 1000) -> DataFrame:
    """One-row corpus health check: token/type totals and the Zipf
    log-log slope over the head of the rank-frequency curve (natural
    text sits near −1; templated or machine-generated corpora drift
    hard — a cheap first-look diagnostic before heavier quality gates).

    ``zipf_slope = regr_slope(ln cnt, ln rank)`` over the ``top_ranks``
    most frequent tokens with the deterministic (count desc, token asc)
    ranking.  Scale shape: one vocabulary-bounded groupBy, then a
    TakeOrdered-sized head (``top_ranks`` rows) feeds the single-row
    regression — the corpus itself is scanned once (the counts frame is
    lazily ``localCheckpoint``-ed so the totals branch and the head
    branch share one computed shuffle instead of re-scanning)."""
    counts = token_counts(df, text_col).localCheckpoint(eager=False)
    totals = counts.agg(F.sum("count").alias("n_tokens"),
                        F.count(F.lit(1)).alias("n_types"))
    head = (counts.orderBy(F.desc("count"), F.asc("token"))
            .limit(top_ranks)
            .withColumn("rank", F.row_number().over(
                Window.partitionBy().orderBy(F.desc("count"),
                                             F.asc("token")))))
    slope = head.agg(
        F.round(F.regr_slope(F.log("count"), F.log("rank")), 6)
        .alias("zipf_slope"),
        F.count(F.lit(1)).cast("int").alias("ranks_used"))
    return totals.crossJoin(slope)


def domain_divergence(df: DataFrame, group_col: str,
                      text_col: str) -> DataFrame:
    """Per-domain unigram distribution drift vs the whole corpus:
    (group, n_tokens, n_types, kl_vs_corpus, js_vs_corpus), nats.

    ``kl_vs_corpus = KL(P_g ‖ Q)`` needs no smoothing (every group token
    exists in the corpus, so q > 0 wherever p > 0).  The Jensen-Shannon
    term is computed WITHOUT materializing the |groups| × |vocab| cross
    frame: tokens absent from a group contribute exactly
    ``q·ln(2q/(0+q)) = q·ln 2``, so
    ``JS = ½·Σ_{t∈g}[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
         + ½·(1 − Σ_{t∈g} q)·ln 2`` — only (group, token) rows that
    actually occur are ever created.

    Scale shape: one (group, token) groupBy (map-side combined), a
    vocabulary-bounded corpus rollup, broadcast joins for the G-row
    group totals and the 1-row corpus total, and a G-bounded final
    aggregate.  The (group, token) counts frame is lazily checkpointed
    so its three consumers share one computed shuffle."""
    from pyspark.sql.functions import broadcast
    gt = df.select(F.col(group_col).alias("group"),
                   F.explode(tokens_sql_expr(text_col)).alias("token"))
    gcnt = (gt.groupBy("group", "token")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=False))
    corpus = gcnt.groupBy("token").agg(F.sum("c").alias("cc"))
    totals = gcnt.groupBy("group").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"))
    t_row = gcnt.agg(F.sum("c").cast("double").alias("t"))
    j = (gcnt.join(corpus, "token")
         .join(broadcast(totals), "group")
         .crossJoin(broadcast(t_row)))
    p = F.col("c") / F.col("n_tokens").cast("double")
    q = F.col("cc") / F.col("t")
    kl_term = p * F.log(p / q)
    js_term = 0.5 * (p * F.log(2 * p / (p + q))
                     + q * F.log(2 * q / (p + q)))
    ln2 = float(__import__("math").log(2.0))
    return (j.groupBy("group")
            .agg(F.max("n_tokens").alias("n_tokens"),
                 F.max("n_types").alias("n_types"),
                 F.round(F.sum(kl_term), 6).alias("kl_vs_corpus"),
                 F.round(F.sum(js_term)
                         + 0.5 * (1.0 - F.sum(q)) * ln2, 6)
                 .alias("js_vs_corpus")))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int, overlap_tokens: int = 0) -> DataFrame:
    """Split long documents into token chunks of ``chunk_tokens`` with
    ``overlap_tokens`` carried between consecutive chunks — the chunking
    step of an embedding / retrieval-indexing pipeline.

    ZERO-SHUFFLE formulation: chunking is a per-document projection, so
    no exchange is fundamentally required — each document explodes into
    its chunk indices and every chunk is a ``slice`` of the document's
    token array.  Two Catalyst hazards are engineered around:

    * the token array is produced BY a Generate (``explode(array(toks))``,
      one row per document) so downstream references are to a generated
      attribute — an aliased projection would be re-inlined by
      CollapseProject and re-tokenize the text once per chunk (the
      shingles_expr lesson);
    * the chunk-index explode carries the token array through as a
      column; inside whole-stage codegen the array is a reference into
      the incoming row, so per-chunk cost is O(chunk_tokens), not
      O(document).

    (The previous formulation posexploded every token to a row and
    rebuilt chunks with a groupBy (id, chunk) sorted fold — one full
    shuffle of the corpus text plus a per-chunk sort, removed outright;
    guide §2.4.)

    Chunks are left-aligned: chunk c covers positions
    ``[c*stride, c*stride + chunk_tokens)``.  A trailing chunk that
    contributes no NEW tokens (its fresh region ``c*stride + overlap``
    starts at or past the end) is dropped, so every token appears in at
    least one chunk and the final chunk is never a strict subset of its
    predecessor.

    Returns ``(id, chunk_idx, n_chunk_tokens, chunk_text)``.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got "
            f"{overlap_tokens}")
    stride = chunk_tokens - overlap_tokens
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"(\S+)"), 1)
    # Generate barrier: _toks is the explode's OUTPUT attribute, so the
    # regexp tokenization runs exactly once per document no matter how
    # many chunk rows reference it below
    tokd = df.select(F.col(id_col).alias("id"),
                     F.explode(F.array(toks)).alias("_toks"))
    n = F.size("_toks")
    # documents with no tokens (NULL or whitespace-only text) emit no
    # chunks — the exact behaviour of exploding an empty token array
    chunks = (tokd
              .filter(F.col("_toks").isNotNull() & (n >= 1))
              .select("id", "_toks", n.alias("_n"),
                      F.explode(F.sequence(
                          F.lit(0).cast("long"),
                          F.floor((n - 1) / F.lit(stride)).cast("long")))
                      .alias("chunk_idx"))
              # drop a trailing chunk that would only replay the overlap:
              # it contributes a new token iff the document extends past
              # its overlap region (chunk_idx*stride + overlap < n)
              .filter((F.col("chunk_idx") == 0)
                      | (F.col("chunk_idx") * stride + overlap_tokens
                         < F.col("_n")))
              .select(
                  "id",
                  F.col("chunk_idx").cast("int").alias("chunk_idx"),
                  F.least(F.lit(chunk_tokens).cast("long"),
                          F.col("_n") - F.col("chunk_idx") * stride)
                  .alias("n_chunk_tokens"),
                  F.array_join(
                      F.slice(F.col("_toks"),
                              (F.col("chunk_idx") * stride + 1).cast("int"),
                              chunk_tokens),
                      " ").alias("chunk_text")))
    return chunks
