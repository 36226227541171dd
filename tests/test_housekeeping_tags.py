"""Round-2 feature coverage: history-based housekeeping gates, NaN repair,
column-level governance tags, and search auto-classification.

Reference semantics: delta_housekeeping.py:186-363 (gates + thresholds),
table_info.py:15-33 (column tags), dx.py:236-260 (search inference).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from discoverx_spark.dx import DX
from discoverx_spark.scanner import TableRegistry
from discoverx_spark.sources import (housekeeping_recommendations_full,
                                     maintenance_history_latest, nan_to_null,
                                     table_summary_stats)


def _gates_fixture(spark):
    from discoverx_spark.queries import q_housekeeping_gates
    return {r["table_name"]: r.asDict()
            for r in q_housekeeping_gates(spark, "").collect()}


def test_housekeeping_gate_semantics(spark):
    g = _gates_fixture(spark)
    big = g["t_big_never_opt"]
    assert big["rec_not_optimized"] and big["rec_not_vacuumed"]
    assert not big["rec_do_not_need_optimize"]
    small = g["t_small_freq_opt"]
    assert small["rec_do_not_need_optimize"] and small["rec_optimized_too_freq"]
    assert small["rec_vacuumed_too_freq"] and not small["rec_not_optimized"]
    stale = g["t_stale"]
    assert stale["rec_not_optimized_last_days"]
    assert stale["rec_not_vacuumed_last_days"]
    assert stale["rec_to_analyze"]  # p50 below small-file threshold
    zo = g["t_zorder_few_files"]
    assert zo["rec_zorder_not_effective"]
    assert not zo["rec_to_analyze"]  # p50 is large


def test_maintenance_history_full_outer(spark):
    history = spark.createDataFrame(
        [("only_opt", "OPTIMIZE", "2025-01-02 00:00:00"),
         ("only_vac", "VACUUM", "2025-01-03 00:00:00")],
        "table_name string, operation string, ts_s string"
    ).select("table_name", "operation",
             F.col("ts_s").cast("timestamp").alias("ts"))
    rows = {r["table_name"]: r for r in
            maintenance_history_latest(history).collect()}
    assert rows["only_opt"]["max_optimize_timestamp"] is not None
    assert rows["only_opt"]["max_vacuum_timestamp"] is None
    assert rows["only_vac"]["max_vacuum_timestamp"] is not None
    assert rows["only_vac"]["max_optimize_timestamp"] is None


def test_nan_to_null(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double") \
        .withColumn("x", F.when(F.col("x") > 1.5,
                                F.lit(float("nan"))).otherwise(F.col("x")))
    out = nan_to_null(df).collect()
    vals = sorted((r["x"] is None, r["x"]) for r in out)
    assert vals[0] == (False, 1.0) and vals[1][0] is True


def test_table_summary_stats_p50(spark, tmp_path):
    df = spark.range(1000).withColumn("part", F.pmod("id", F.lit(4)))
    df.repartition(4, "part").write.mode("overwrite") \
        .partitionBy("part").parquet(str(tmp_path / "t"))
    stats = table_summary_stats(spark, str(tmp_path / "t"), "t").collect()[0]
    assert stats["number_of_files"] >= 4
    assert stats["min_file_size"] <= stats["p50_file_size"] <= stats["max_file_size"]


@pytest.fixture()
def dx_tagged(spark):
    dx = DX(spark)
    users = spark.createDataFrame(
        [(1, "a@b.com", "1.2.3.4")], "id long, email string, ip string")
    logs = spark.createDataFrame([(1, "hello")], "id long, msg string")
    dx.registry.register("main.default.users", users,
                         tags={"domain": "crm"},
                         column_tags={"email": {"pii": "email"},
                                      "ip": {"pii": "network"}})
    dx.registry.register("main.default.logs", logs, tags={"domain": "ops"})
    return dx


def test_column_tags_lookup(dx_tagged):
    reg = dx_tagged.registry
    assert reg.columns_with_tag("main.default.users", "pii") == ["email", "ip"]
    assert reg.columns_with_tag("main.default.users", "pii", "email") == ["email"]
    assert reg.columns_with_tag("main.default.logs", "pii") == []
    assert reg.column_tags("main.default.users")["ip"] == {"pii": "network"}


def test_explorer_having_column_tag(dx_tagged):
    names = dx_tagged.from_tables("main.*.*") \
        .having_column_tag("pii").table_names()
    assert names == ["main.default.users"]
    none = dx_tagged.from_tables("main.*.*") \
        .having_column_tag("pii", "ssn").table_names()
    assert none == []


def test_catalog_and_schema_level_tags(dx_tagged):
    """Reference attaches tags at four levels (table_info.py:15-33);
    having_tag must match any level, most specific winning on conflicts."""
    reg = dx_tagged.registry
    reg.tag_catalog("main", {"env": "prod", "domain": "platform"})
    reg.tag_schema("main.default", {"owner": "data-eng"})

    eff = reg.effective_tags("main.default.logs")
    assert eff["env"] == "prod" and eff["owner"] == "data-eng"
    assert eff["domain"] == "ops"  # table-level overrides catalog-level
    assert reg.effective_tags("main.default.users")["domain"] == "crm"

    # catalog-level tag matches every table in the catalog
    names = dx_tagged.from_tables("main.*.*").having_tag("env", "prod") \
        .table_names()
    assert names == ["main.default.logs", "main.default.users"]
    # schema-level tag
    assert dx_tagged.from_tables("*.*.*").having_tag("owner").table_names() \
        == ["main.default.logs", "main.default.users"]
    # specificity: domain=platform (catalog) is shadowed by both tables
    assert dx_tagged.from_tables("*.*.*") \
        .having_tag("domain", "platform").table_names() == []
    # table-level value still reachable
    assert dx_tagged.from_tables("*.*.*") \
        .having_tag("domain", "ops").table_names() == ["main.default.logs"]


def test_search_auto_classification(dx_tagged):
    dx = dx_tagged
    dx.scan(from_tables="main.default.users", sample_size=None)
    # "1.2.3.4" matches exactly the ip_v4 rule -> inferred automatically
    rows = dx.search("1.2.3.4").collect()
    assert len(rows) == 1
    assert rows[0]["classified"] == {"ip_v4": "1.2.3.4"}
    # ambiguous term (integer also matches decimal_number) -> must raise
    with pytest.raises(ValueError, match="Multiple classes"):
        dx.search("123")
    with pytest.raises(ValueError, match="Could not infer"):
        dx.search("certainly not classifiable §§")
