"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public method).

The insight that makes BPE Spark-friendly: training never touches the
corpus after the first pass — it operates on the WORD FREQUENCY TABLE
(distinct words + counts), which is vocabulary-shaped.  So:

* **Pass 1 (corpus-sized, once)**: explode tokens → ``groupBy(word)``
  count, with map-side combine — the only job whose input scales with
  the corpus.  Each word becomes its symbol array (characters + the
  ``</w>`` end-of-word marker).
* **Merge loop (vocabulary-sized, num_merges times)**: count weighted
  adjacent symbol pairs over the word table (one groupBy per
  iteration), pick the most frequent pair with a deterministic
  tie-break (count desc, pair asc — the driver pulls ONE row), then
  rewrite every word's symbol array with a left-to-right greedy merge
  fold.  The iteration state is the word table; ``localCheckpoint``
  every few rounds truncates the growing lineage (the
  connected-components discipline, dedup.py:540).

The greedy rewrite is a single ``aggregate`` fold with a
(output-array, carry) struct accumulator — one pass per word, no
Python.  Overlap semantics match the reference implementation: in
"aaa" with merge (a,a), the FIRST pair merges and the third ``a``
stays (left-to-right, no re-scan within the same merge step).

``learned merges`` come back as a small driver-side list (rank order);
``bpe_segment_expr`` applies them in rank order to tokenize new text —
num_merges chained folds, fine for the few-hundred-merge vocabularies
the tests use; a production tokenizer with 30k+ merges would compile
the merge table into a linear-time Arrow UDF instead (the documented
UDF escape hatch, pipeline.py pattern).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_sql_expr
from .packing import token_counts

END_OF_WORD = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) — the one corpus-sized pass (packing.token_counts
    under vocabulary-table column names)."""
    return (token_counts(df, text_col)
            .withColumnRenamed("token", "word")
            .withColumnRenamed("count", "freq"))


def _symbols_expr(word) -> Column:
    w = F.col(word) if isinstance(word, str) else word
    return F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD)))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair struct<l,r>, cnt): adjacent symbol pairs weighted by word
    frequency.  The pair is a STRUCT, not a joined string — symbols may
    contain ANY character after a few merges (including any separator a
    string encoding would pick: real web corpora do contain C0 control
    chars, which \\S+ keeps inside tokens), and struct equality/ordering
    gives collision-free grouping plus tuple-order tie-breaks for
    free."""
    syms = F.col("symbols")
    n = F.size(syms)
    zipped = F.zip_with(syms, F.slice(syms, 2, F.greatest(n, F.lit(1))),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")))
    pairs = F.when(n >= 2, F.slice(zipped, 1, n - 1)) \
        .otherwise(F.slice(zipped, 1, 0))
    return (words.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair").agg(F.sum("freq").alias("cnt")))


def _merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — an ``aggregate`` fold with (out, carry) state plus a finish
    lambda that flushes the trailing carry."""
    merged = left + right
    empty = F.slice(syms, 1, 0)

    def step(acc, s):
        flush_then_carry = F.struct(
            F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
            s.alias("carry"))
        return (
            F.when(acc["carry"].isNull(),
                   F.struct(acc["out"].alias("out"), s.alias("carry")))
            .when((acc["carry"] == left) & (s == right),
                  F.struct(F.concat(acc["out"],
                                    F.array(F.lit(merged))).alias("out"),
                           F.lit(None).cast("string").alias("carry")))
            .otherwise(flush_then_carry))

    init = F.struct(empty.alias("out"),
                    F.lit(None).cast("string").alias("carry"))
    return F.aggregate(
        syms, init, step,
        lambda acc: F.when(acc["carry"].isNull(), acc["out"])
        .otherwise(F.concat(acc["out"], F.array(acc["carry"]))))


def bpe_train(df: DataFrame, text_col: str, num_merges: int,
              checkpoint_every: int = 8) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.  Returns the
    ranked merge list [(left, right), ...].  Driver traffic is ONE row
    per iteration (the argmax pair); the word table stays distributed
    throughout."""
    words = (word_frequencies(df, text_col)
             .select(_symbols_expr("word").alias("symbols"), "freq")
             .localCheckpoint(eager=True))
    merges: List[Tuple[str, str]] = []
    for i in range(num_merges):
        # struct asc ordering = (l, r) tuple order — the deterministic
        # tie-break the reference implementation mirrors
        top = (_pair_counts(words)
               .orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect())
        if not top:
            break
        left, right = top[0]["pair"]["l"], top[0]["pair"]["r"]
        merges.append((left, right))
        if i == num_merges - 1:
            break  # the rewritten table would never be read
        words = words.select(
            _merge_pair_expr(F.col("symbols"), left, right).alias("symbols"),
            "freq")
        # truncate the per-iteration fold lineage (CC discipline): the
        # plan otherwise nests num_merges aggregate folds
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_segment_expr(col, merges: List[Tuple[str, str]]) -> Column:
    """Tokenize text with learned merges: per word, apply every merge in
    rank order (the reference algorithm), then emit the flattened symbol
    sequence.  Plan size grows linearly with len(merges) — fine for the
    few-hundred-merge range; compile to an Arrow UDF beyond that."""
    toks = tokens_sql_expr(col)

    def segment_word(w):
        syms = F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD)))
        for left, right in merges:
            syms = _merge_pair_expr(syms, left, right)
        return syms

    return F.flatten(F.transform(toks, segment_word))
