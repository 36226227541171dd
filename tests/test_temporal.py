"""As-of join and binned range join: semantics and edge cases."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from discoverx_spark.operators.temporal import asof_join, range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-01 10:00:00")),
         (2, "k1", _ts("2024-01-01 11:00:00")),
         (3, "k1", _ts("2024-01-01 09:00:00")),   # before any right row
         (4, "k2", _ts("2024-01-01 10:30:00")),
         (5, "k3", _ts("2024-01-01 10:00:00"))],  # key with no right rows
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "k1", _ts("2024-01-01 09:30:00"), "a"),
         (11, "k1", _ts("2024-01-01 10:00:00"), "b"),   # simultaneous w/ lid 1
         (12, "k1", _ts("2024-01-01 10:00:00"), "c"),   # same ts, higher id
         (13, "k1", _ts("2024-01-01 10:45:00"), "d"),
         (14, "k2", _ts("2024-01-01 08:00:00"), "e")],
        "rid long, k string, rts timestamp, payload string")
    return left, right


def test_asof_basic_semantics(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    payload=["rid", "payload"], right_order="rid")
    got = {r["lid"]: (r["matched_rid"], r["matched_payload"])
           for r in out.collect()}
    assert got[1] == (12, "c")      # simultaneous right row visible; max rid
    assert got[2] == (13, "d")      # most recent preceding
    assert got[3] == (None, None)   # nothing at or before 09:00
    assert got[4] == (14, "e")      # cross-key isolation
    assert got[5] == (None, None)   # key with no right rows
    assert out.count() == left.count()


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    payload=["rid"], right_order="rid",
                    tolerance=F.expr("INTERVAL 30 MINUTES"))
    got = {r["lid"]: r["matched_rid"] for r in out.collect()}
    assert got[1] == 12             # 0 min old: kept
    assert got[2] == 13             # 15 min old: kept
    assert got[4] is None           # 2.5 h old: nulled by tolerance


def test_asof_requires_right_order(frames):
    left, right = frames
    with pytest.raises(ValueError, match="right_order"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  payload=["rid"])


def test_range_join_exact_containment(spark):
    points = spark.createDataFrame(
        [("k1", _ts("2024-01-01 10:00:00"), 1),
         ("k1", _ts("2024-01-01 10:09:59"), 2),
         ("k1", _ts("2024-01-01 10:10:00"), 3),   # == end: excluded
         ("k2", _ts("2024-01-01 10:05:00"), 4)],  # other key
        "k string, ts timestamp, pid int")
    intervals = spark.createDataFrame(
        [("k1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:10:00"), 100)],
        "k string, w_start timestamp, w_end timestamp, wid int")
    out = range_join_binned(points, intervals, on="k", point_ts="ts",
                            start="w_start", end="w_end", bin_seconds=600)
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_range_join_no_duplicate_matches_across_bins(spark):
    # interval spans 3 bins; each contained point must appear ONCE
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:01:00"), i) for i in range(5)],
        "k string, ts timestamp, pid int")
    intervals = spark.createDataFrame(
        [("k", _ts("2024-01-01 09:55:00"), _ts("2024-01-01 10:15:00"), 1)],
        "k string, w_start timestamp, w_end timestamp, wid int")
    out = range_join_binned(points, intervals, on="k", point_ts="ts",
                            start="w_start", end="w_end", bin_seconds=600)
    assert out.count() == 5
    assert out.select("pid").distinct().count() == 5


def test_range_join_subsecond_end_boundary(spark):
    # end has fractional seconds: a point in end's SECOND but before end
    # must still match (the unix_micros formulation; a seconds-truncated
    # bin coverage would drop the final bin when end_sec % bin == 0)
    end = _ts("2024-01-01 10:10:00.500000")
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:10:00.400000"), 1),
         ("k", _ts("2024-01-01 10:10:00.600000"), 2)],
        "k string, ts timestamp, pid int")
    intervals = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00.500000"), end, 9)],
        "k string, w_start timestamp, w_end timestamp, wid int")
    out = range_join_binned(points, intervals, on="k", point_ts="ts",
                            start="w_start", end="w_end", bin_seconds=600)
    assert [r["pid"] for r in out.collect()] == [1]


def test_asof_null_payload_not_overwritten_by_staler_row(spark):
    # the true as-of match has a NULL payload field; a per-column
    # ignorenulls carry would splice in the older row's value
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 10:30:00"))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "k", _ts("2024-01-01 09:00:00"), "stale"),
         (11, "k", _ts("2024-01-01 10:00:00"), None)],
        "rid long, k string, rts timestamp, payload string")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    payload=["rid", "payload"], right_order="rid").collect()[0]
    assert out["matched_rid"] == 11
    assert out["matched_payload"] is None      # NOT 'stale'


def test_asof_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-01 10:00:00"))],
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(10, None, _ts("2024-01-01 09:00:00"), "x")],
        "rid long, k string, rts timestamp, payload string")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    payload=["payload"], right_order="rid").collect()
    assert len(out) == 1 and out[0]["matched_payload"] is None


def test_range_join_inverted_interval_guarded(spark):
    points = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 1)], "k string, ts timestamp, pid int")
    intervals = spark.createDataFrame(
        [("k", _ts("2025-01-01 00:00:00"), _ts("2024-01-01 00:00:00"), 1)],
        "k string, w_start timestamp, w_end timestamp, wid int")
    out = range_join_binned(points, intervals, on="k", point_ts="ts",
                            start="w_start", end="w_end", bin_seconds=600)
    assert out.count() == 0   # and no 50k-bin descending explosion
