"""Source/sink + housekeeping tests."""

import pytest
from pyspark.sql import functions as F

from discoverx_spark.sources import (housekeeping_recommendations,
                                     merge_upsert, read_csv,
                                     table_file_stats, write_partitioned)


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("id,ip\n1,1.2.3.4\n2,5.6.7.8\n")
    df = read_csv(spark, str(p), "id int, ip string")
    assert df.schema.simpleString() == "struct<id:int,ip:string>"
    assert df.count() == 2


def test_write_partitioned_layout(spark, tmp_path):
    df = spark.range(100).select(
        (F.col("id") % 4).alias("part"), F.col("id"))
    out = str(tmp_path / "t")
    write_partitioned(df, out, ["part"], sort_cols=["id"])
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert back.select("part").distinct().count() == 4
    # partition pruning reaches the scan
    plan = back.filter(F.col("part") == 1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan or back.filter(F.col("part") == 1).count() == 25


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "m")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    merge_upsert(spark, v1, path, ["id"])
    v2 = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    merge_upsert(spark, v2, path, ["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_housekeeping_stats_and_recommendations(spark, tmp_path):
    df = spark.range(1000).select((F.col("id") % 2).alias("part"), "id")
    out = str(tmp_path / "hk")
    df.repartition(10).write.partitionBy("part").parquet(out)
    stats = table_file_stats(spark, out, "hk")
    rows = stats.collect()
    assert {r["partition_id"] for r in rows} == {"part=0", "part=1"}
    assert all(r["number_of_files"] >= 1 for r in rows)
    rec = housekeeping_recommendations(stats)
    r = rec.first()
    assert r["rec_do_not_optimize_table_too_small"] is True  # tiny table
    assert "rec_many_files" in rec.columns
