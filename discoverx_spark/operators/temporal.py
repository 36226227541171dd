"""Temporal joins Spark lacks as primitives: as-of join and range join.

Reference context: discoverx's housekeeping join graph
(``delta_housekeeping.py:55-92``) aligns per-table maintenance events by
"the latest OPTIMIZE/VACUUM at or before now" — an as-of alignment it can
afford to do with full-outer merges because its input is one row per
table.  At transcript scale ("attribute each turn/purchase to the most
recent preceding session event") the same semantics need a real as-of
join, which Spark's DataFrame API does not provide.

Both operators here are single-shuffle, no-range-explosion formulations:

* :func:`asof_join` — union + partitioned window, the classic scalable
  as-of: tag the two inputs, sort each key's timeline once, and carry the
  most recent right-side payload forward with ``last(ignorenulls)``.
  Cost: ONE shuffle of (|L|+|R|) rows keyed by the join key; no
  inequality-join cross product, no BroadcastNestedLoop.  Skewed keys
  cost what any window over that key costs — at 100 TB the hot-key
  mitigation is range-partitioning within key by time (documented below),
  not a different algorithm.
* :func:`range_join_binned` — interval-containment join via time
  binning: intervals explode to the (few) fixed-width bins they cover,
  points map to exactly one bin, and the join runs as an equi-join on
  (key, bin).  Spark executes a plain inequality join as
  BroadcastNestedLoopJoin (quadratic); the binned form is the standard
  O(points + intervals × bins_per_interval) reformulation that survives
  scale, with the bin width chosen near the typical interval length so
  the explosion factor stays ~2.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_order: Optional[str] = None,
    tolerance: Optional[Column] = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_ts] <= left[left_ts]`` on the same ``on`` key.

    Union + window formulation (single shuffle on ``on``):

    1. tag rows ``_is_left`` 0/1 and union the two sides positionally
       (right payload columns NULL on left rows and vice versa);
    2. one window per key ordered ``(ts, _is_left, right_order)`` —
       right rows sort before left rows at equal timestamps, so an
       exactly-simultaneous right row IS visible to the left row, and
       among simultaneous right rows the one with the greatest
       ``right_order`` wins (deterministic tie-break);
    3. ``last(payload, ignorenulls=True)`` over
       ``rowsBetween(unboundedPreceding, currentRow)`` carries the most
       recent right payload onto every left row; filter ``_is_left``.

    ``tolerance`` (a Column producing an interval / duration in the same
    unit as the timestamps) optionally nulls out matches older than
    ``left_ts - tolerance`` — applied as a post-filter on the matched
    timestamp, so it does not change the plan shape.

    Left rows with no eligible right row keep NULL payload (left-outer
    as-of).  Left duplicates are preserved.

    100 TB note: the one shuffle is keyed by ``on`` alone; a pathological
    hot key (one user with 10^9 turns) serializes in one task.  The
    standard fix composes with this operator unchanged: pre-split the hot
    key by coarse time range (e.g. day), run the as-of per (key, day),
    and patch each day's first rows with the previous day's closing
    state — a second, tiny as-of on the per-day boundaries.
    """
    if right_order is None:
        raise ValueError(
            "asof_join needs right_order (a unique right-side column) so "
            "ties among simultaneous right rows break deterministically")
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    # the whole right payload rides as ONE struct: carrying each column
    # with its own last(ignorenulls) would skip a legitimately-NULL
    # payload field in the true match and splice in a staler row's value
    # (a chimera of two right rows); the struct is null exactly on left
    # rows, so row-atomic carry is preserved
    rtype = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload]
        + [StructField("_rts", right.schema[right_ts].dataType)])
    tagged_l = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rtype).alias("_r"),
        F.lit(1).alias("_is_left"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast("long").alias("_ord"),
    )
    # SQL join semantics: a NULL key never matches, so null-key right
    # rows are dropped (null-key left rows land in their own partition
    # with no right rows and keep a NULL match)
    tagged_r = right.filter(F.col(on).isNotNull()).select(
        *[(F.col(on) if c == on else
           F.lit(None).cast(left.schema[c].dataType)).alias(c)
          for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in payload],
                 F.col(right_ts).alias("_rts")).alias("_r"),
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_ts"),
        F.col(right_order).cast("long").alias("_ord"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    w = (Window.partitionBy(on)
         .orderBy(F.col("_ts").asc(), F.col("_is_left").asc(),
                  F.col("_ord").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        *lcols, "_is_left", "_ts",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        stale = F.col("_m._rts") < (F.col("_ts") - tolerance)
        out = out.withColumn(
            "_m", F.when(stale, F.lit(None).cast(rtype))
            .otherwise(F.col("_m")))
    return out.select(*lcols,
                      *[F.col(f"_m.{c}").alias(f"matched_{c}")
                        for c in payload],
                      F.col("_m._rts").alias("matched_ts"))


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start: str,
    end: str,
    bin_seconds: int,
) -> DataFrame:
    """Equi-join reformulation of the interval-containment join
    ``points.ts >= intervals.start AND points.ts < intervals.end``
    (closed-open, so back-to-back intervals never double-match a point).

    Each interval explodes to the fixed-width time bins it covers
    (``sequence(floor(start/w), floor((end - epsilon)/w))``); each point
    maps to exactly ONE bin, so a point meets each covering interval
    exactly once and no post-join dedup is needed.  The join is then a
    plain shuffled (or broadcast) hash join on ``(on, bin)`` with the
    exact containment predicate as a cheap residual filter.

    Pick ``bin_seconds`` near the typical interval length: explosion
    factor is ``1 + ceil(len/bin)`` ≈ 2.  A naive Spark inequality join
    on the same predicate plans as BroadcastNestedLoopJoin — quadratic
    per key — which this formulation replaces.

    Column name collisions between the two inputs (other than ``on``)
    must be resolved by the caller.
    """
    # microsecond arithmetic: unix_timestamp() TRUNCATES to seconds, and
    # a truncated bin computation drops the final bin exactly when the
    # (fractional) end falls in a second that starts a new bin — a
    # point between bin-start and end would silently never match
    usec = 1_000_000 * bin_seconds

    def _us(c):
        # unix_micros rejects TIMESTAMP_NTZ (parquet's default); the cast
        # interprets NTZ in the session zone — applied uniformly to both
        # sides, so bin alignment (all that matters) is unaffected
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn("_bin", F.floor(_us(point_ts) / usec))
    # guard inverted/empty intervals BEFORE the explode: sequence() with
    # hi < lo defaults to step -1 and would generate an unbounded
    # DESCENDING bin list per bad row (the residual filter would discard
    # the rows, but only after the explosion)
    intervals = intervals.filter(F.col(end) > F.col(start))
    iv = intervals.withColumn(
        "_bins",
        F.sequence(
            F.floor(_us(start) / usec),
            # end is exclusive: a bin is covered only if the interval
            # extends strictly past the bin's start
            F.floor((_us(end) - F.lit(1)) / usec),
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")
    joined = p.join(iv, on=[on, "_bin"], how="inner").filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
    return joined.drop("_bin")
