"""IO round-trip tests: partitioned writes, snapshot-filtered reads, the
SURVEY §3.4 multi-snapshot regression, catalog registration, and the SQL
surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.catalog import (
    register_layer,
    register_testdata,
)
from home_credit_data_engineering_spark.plans.bronze import (
    ingest_dataframe,
    read_bronze_snapshot,
)
from home_credit_data_engineering_spark.plans.silver import with_snapshot_partitions
from home_credit_data_engineering_spark.schema import APPLICATION, TESTDATA_TABLES
from home_credit_data_engineering_spark.sources.readers import read_snapshot
from home_credit_data_engineering_spark.sources.sinks import write_parquet


@pytest.fixture()
def app_rows(spark):
    return spark.createDataFrame(
        [
            (1, 0, 100000.0, 500000.0, 25000.0, -15000, "M"),
            (2, 1, 200000.0, 600000.0, None, -20000, "F"),
        ],
        APPLICATION,
    )


def test_multi_snapshot_read_does_not_multiply(spark, app_rows, tmp_path):
    """SURVEY §3.4: re-ingesting on a new date must NOT multiply snapshot
    reads (the reference's Silver counts grew 2x/3x/4x across runs)."""
    path = str(tmp_path / "bronze_app")
    for date in ("2026-08-11", "2026-08-12", "2026-08-13"):
        ingest_dataframe(app_rows, path, date, "test")
    # Base-path read sees all three snapshots...
    assert spark.read.parquet(path).count() == 6
    # ...but the snapshot reader prunes to exactly one.
    snap = read_bronze_snapshot(spark, path, "2026-08-12")
    assert snap.count() == 2
    assert set(snap.select("ingest_date").distinct().toPandas()["ingest_date"]) == {
        "2026-08-12"
    }
    # Partition pruning is visible in the physical plan, not a post-filter.
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "ingest_date" in plan


def test_dynamic_partition_overwrite_keeps_other_snapshots(spark, app_rows, tmp_path):
    path = str(tmp_path / "bronze_dyn")
    ingest_dataframe(app_rows, path, "2026-08-11", "test")
    ingest_dataframe(app_rows, path, "2026-08-12", "test")
    # Re-ingest one date: only that partition is replaced.
    ingest_dataframe(app_rows.limit(1), path, "2026-08-12", "test")
    assert read_bronze_snapshot(spark, path, "2026-08-11").count() == 2
    assert read_bronze_snapshot(spark, path, "2026-08-12").count() == 1


def test_year_month_day_snapshot_roundtrip(spark, app_rows, tmp_path):
    path = str(tmp_path / "silver_app")
    out = with_snapshot_partitions(app_rows, "2026-08-13")
    write_parquet(out, path, partition_by=["year", "month", "day"])
    back = read_snapshot(spark, path, {"year": 2026, "month": 8, "day": 13})
    assert back.count() == 2
    missing = read_snapshot(spark, path, {"year": 2026, "month": 8, "day": 14})
    assert missing.count() == 0


def test_catalog_views_and_sql_surface(spark, sf_dir, tmp_path):
    """S6: register layer views + run a query through spark.sql."""
    path = str(tmp_path / "gold_profile")
    df = spark.createDataFrame(
        [(1, "HIGH"), (2, "LOW")], "SK_ID_CURR long, risk_segment string"
    )
    write_parquet(df, path)
    views = register_layer(spark, {"gold_client_risk_profile": path}, prefix="gold_")
    assert "gold_gold_client_risk_profile" in views
    got = spark.sql(
        "SELECT risk_segment, count(*) AS n FROM gold_gold_client_risk_profile "
        "GROUP BY risk_segment ORDER BY risk_segment"
    ).collect()
    assert [(r["risk_segment"], r["n"]) for r in got] == [("HIGH", 1), ("LOW", 1)]

    register_testdata(spark, sf_dir, TESTDATA_TABLES)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0


def test_text_reader_lines_and_wholetext(spark, tmp_path):
    from home_credit_data_engineering_spark.sources.readers import read_text

    p = tmp_path / "raw"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("single doc body\n")
    lines = {r.value for r in read_text(spark, str(p)).collect()}
    assert lines == {"line one", "line two", "single doc body"}
    whole = {r.value for r in read_text(spark, str(p), wholetext=True).collect()}
    assert whole == {"line one\nline two\n", "single doc body\n"}


def test_orc_roundtrip_pushes_filters(spark, sf_dir, tmp_path):
    from home_credit_data_engineering_spark.sources.readers import (
        read_orc,
        read_testdata,
    )
    from home_credit_data_engineering_spark.sources.sinks import write_orc

    supplier = read_testdata(spark, sf_dir, "supplier")
    out = str(tmp_path / "supplier_orc")
    write_orc(supplier, out)
    back = read_orc(spark, out, columns=["s_suppkey", "s_nationkey"]).filter(
        "s_nationkey = 3"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # same pushdown/pruning posture as parquet: filter reaches the scan,
    # ReadSchema carries only the projected columns
    assert "PushedFilters: [" in plan and "s_nationkey" in plan.split("PushedFilters")[1][:120]
    assert "s_name" not in plan.split("ReadSchema")[1][:200]
    expected = supplier.filter("s_nationkey = 3").count()
    assert back.count() == expected


def test_json_writer_is_compressed_and_lossless(spark, sf_dir, tmp_path):
    import gzip
    import pathlib

    from home_credit_data_engineering_spark.sources.readers import (
        read_json,
        read_testdata,
    )
    from home_credit_data_engineering_spark.sources.sinks import write_json

    nation = read_testdata(spark, sf_dir, "nation")
    out = tmp_path / "nation_json"
    write_json(nation, str(out))
    parts = list(pathlib.Path(out).glob("*.json.gz"))
    assert parts, "default write should gzip its parts"
    with gzip.open(parts[0], "rt") as fh:
        assert fh.readline().startswith("{")
    back = read_json(
        spark, str(out),
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
