"""Distributed-build Bloom filter + membership pre-filter for
incremental dedup.

Reference context: discoverx re-scans whole tables per run
(``scanner.py:268-276``); the incremental operators in this repo
(incremental_exact_dedup, incremental_line_dedup) instead anti-join each
new batch against a persisted key index.  At 10¹² accumulated keys that
anti-join shuffles the ENTIRE index every run even when almost every
batch key is genuinely new.  The classic fix is a Bloom filter over the
index: definitely-new keys (the common case) skip the join entirely; only
the ``fpp`` fraction of maybe-members pays for exact verification — and
the final output is EXACT, because the filter only routes rows, never
decides them.

Build is fully distributed and idiomatic Spark: each key projects to its
``k`` bit positions JVM-side (``pmod(xxhash64(key, seed_i), m)``), the
positions fold into 64-bit words with a ``bit_or`` aggregate keyed by
word index, and the driver assembles the (sparse) word list into the
dense ``m/8``-byte artifact — the same driver-sized-model pattern as
centroids and the LM counts.  Probe recomputes the identical positions
with the repo's pure-Python XXH64 (``functions/xxh.py``, byte-for-byte
equal to ``F.xxhash64`` — the property the MinHash VALUES oracle already
certifies) inside an Arrow UDF over the broadcast word array, so there
are NO false negatives by construction.

Sizing: ``m ≈ -n·ln(fpp)/ln(2)²`` bits, ``k ≈ (m/n)·ln(2)``; 10⁸ keys at
1% ≈ 114 MiB — a broadcast-sized artifact.  Past broadcast scale,
partition the filter by key range and probe per-partition.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_items: int, fpp: float) -> Tuple[int, int]:
    """Optimal (num_bits, num_hashes), num_bits rounded up to a word."""
    if expected_items < 1:
        raise ValueError(f"expected_items must be >= 1, got {expected_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = max(64, int(math.ceil(-expected_items * math.log(fpp)
                              / (math.log(2) ** 2))))
    m = (m + 63) // 64 * 64
    k = max(1, int(round(m / expected_items * math.log(2))))
    return m, k


def bloom_build(index: DataFrame, key_col: str, num_bits: int,
                num_hashes: int) -> np.ndarray:
    """Distributed Bloom build: returns the filter as a uint64 word
    array of length ``num_bits/64``.  One shuffle, keyed by word index
    (≤ ``num_bits/64`` groups), ``bit_or`` partials map-side."""
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    pos = [F.pmod(F.xxhash64(F.col(key_col).cast("string"), F.lit(i)),
                  F.lit(num_bits))
           for i in range(num_hashes)]
    words = (index
             .select(F.explode(F.array(*pos)).alias("_p"))
             # python-API shiftleft only takes a literal shift count; the
             # SQL form accepts the column expression
             .select(F.expr("_p div 64").alias("_w"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(_p % 64 AS INT))").alias("_b"))
             .groupBy("_w").agg(F.bit_or("_b").alias("_word")))
    arr = np.zeros(num_bits // 64, dtype=np.uint64)
    for r in words.collect():
        arr[int(r["_w"])] = np.uint64(int(r["_word"]) & ((1 << 64) - 1))
    return arr


def make_might_contain_udf(spark, words: np.ndarray, num_bits: int,
                           num_hashes: int):
    """Arrow UDF testing membership against the broadcast word array,
    recomputing the build's exact positions with the pure-Python XXH64
    twin — zero false negatives by construction."""
    from ..functions.xxh import spark_xxhash64_string

    bc = spark.sparkContext.broadcast(words)

    @F.pandas_udf("boolean")
    def might_contain(keys: pd.Series) -> pd.Series:
        w = bc.value

        def test(s):
            if s is None:
                return False
            for i in range(num_hashes):
                p = spark_xxhash64_string(str(s), i) % num_bits
                if not (int(w[p >> 6]) >> (p & 63)) & 1:
                    return False
            return True

        return keys.map(test)

    return might_contain


def bloom_prefilter_novel(batch: DataFrame, index: DataFrame, key_col: str,
                          expected_items: int = 1 << 20,
                          fpp: float = 0.01) -> DataFrame:
    """EXACT novel-key extraction, Bloom-accelerated: rows of ``batch``
    whose key is not in ``index``.  Definitely-new rows (Bloom-negative)
    bypass the anti-join; only maybe-members are verified exactly, so
    the join's probe side shrinks to ``old + fpp·new`` rows while the
    result stays identical to a plain left-anti join."""
    m, k = bloom_params(expected_items, fpp)
    words = bloom_build(index.select(key_col), key_col, m, k)
    mc = make_might_contain_udf(batch.sparkSession, words, m, k)
    # lazy checkpoint: both output branches reference `flagged` — without
    # the lineage cut each branch re-runs the probe UDF over the batch
    flagged = (batch.withColumn("_maybe", mc(F.col(key_col).cast("string")))
               .localCheckpoint(eager=False))
    definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    verified_new = (flagged.filter(F.col("_maybe")).drop("_maybe")
                    .join(index.select(key_col).distinct(),
                          on=key_col, how="left_anti"))
    return definite_new.unionByName(verified_new)
