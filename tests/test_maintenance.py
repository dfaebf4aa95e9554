"""Storage maintenance tests: compaction preserves data and restores
clustering; retention removes exactly the non-kept snapshot partitions."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from home_credit_data_engineering_spark.sources.maintenance import (
    compact_parquet,
    expire_snapshots,
)


def test_compact_parquet_preserves_rows_and_bounds_files(spark, tmp_path):
    path = str(tmp_path / "many_small")
    # 40 small files (the streaming-sink shape)
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) >= 30

    stats = compact_parquet(spark, path, target_files=4)
    assert stats["rows"] == 10_000
    assert stats["files_after"] <= 4 < stats["files_before"]
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__old")


def test_compact_parquet_recluster_restores_locality(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "declustered")
    spark.range(20_000).withColumn("k", F.col("id")).repartition(16).write.parquet(
        path
    )
    compact_parquet(spark, path, target_files=8, cluster_by=["k"])
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mn = mx = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == "k" and c.statistics is not None:
                    mn = c.statistics.min if mn is None else min(mn, c.statistics.min)
                    mx = c.statistics.max if mx is None else max(mx, c.statistics.max)
        spans.append((mn, mx))
    spans.sort()
    # re-clustered files cover disjoint key ranges
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_expire_snapshots_allowlist(spark, tmp_path):
    base = str(tmp_path / "snapshots")
    df = spark.range(10)
    for y, m, d in [(2026, 8, 11), (2026, 8, 12), (2026, 8, 13)]:
        df.write.parquet(f"{base}/year={y}/month={m}/day={d}")
    removed = expire_snapshots(base, keep_dates={(2026, 8, 12), (2026, 8, 13)})
    assert len(removed) == 1 and removed[0].endswith("day=11")
    kept = spark.read.parquet(base)
    # partition values stay strings (type inference disabled by design)
    assert sorted(r["day"] for r in kept.select("day").distinct().collect()) == ["12", "13"]
    # empty allowlist removes nothing? no — allowlist semantics: keeps only
    # listed dates; an EMPTY set would drop all. The safety property is
    # that the caller passes keeps, so a buggy cutoff yields keeps=all.
    assert expire_snapshots(base, keep_dates={(2026, 8, 12), (2026, 8, 13)}) == []


def test_maintenance_cli(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs.maintenance import main as m

    path = str(tmp_path / "cli_data")
    spark.range(5_000).repartition(20).write.parquet(path)
    assert m(["compact", "--path", path, "--target-files", "2"]) == 0
    assert len(glob.glob(path + "/*.parquet")) <= 2
    assert spark.read.parquet(path).count() == 5_000

    base = str(tmp_path / "cli_snaps")
    for y, m_, d in [(2026, 8, 1), (2026, 8, 12), (2026, 8, 13)]:
        spark.range(3).write.parquet(f"{base}/year={y}/month={m_}/day={d}")
    assert m(["expire", "--path", base, "--keep-days", "7", "--as-of", "2026-08-13"]) == 0
    assert not os.path.exists(f"{base}/year=2026/month=8/day=1")
    assert os.path.exists(f"{base}/year=2026/month=8/day=12")


def test_state_swap_happy_path(spark, tmp_path):
    from home_credit_data_engineering_spark.sources.maintenance import (
        recover_state_swap,
        staged_state_path,
        swap_in_state,
    )

    state = str(tmp_path / "state")
    spark.range(5).write.parquet(state)
    spark.range(5, 12).write.parquet(staged_state_path(state))
    swap_in_state(state)
    assert not os.path.isdir(staged_state_path(state))
    got = {r["id"] for r in spark.read.parquet(state).collect()}
    assert got == set(range(5, 12))
    # nothing staged -> recovery is a no-op
    assert recover_state_swap(state) is None


def test_state_swap_refuses_incomplete(spark, tmp_path):
    import pytest

    from home_credit_data_engineering_spark.sources.maintenance import (
        staged_state_path,
        swap_in_state,
    )

    state = str(tmp_path / "state")
    spark.range(5).write.parquet(state)
    spark.range(7).write.parquet(staged_state_path(state))
    os.remove(os.path.join(staged_state_path(state), "_SUCCESS"))
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        swap_in_state(state)
    # old state untouched
    assert spark.read.parquet(state).count() == 5


def test_state_swap_recovery_finishes_orphan(spark, tmp_path):
    """Crash between rmtree(state) and rename: only the completed staged
    dir survives -> recovery must promote it."""
    from home_credit_data_engineering_spark.sources.maintenance import (
        recover_state_swap,
        staged_state_path,
    )

    state = str(tmp_path / "state")
    spark.range(9).write.parquet(staged_state_path(state))
    assert recover_state_swap(state) == "finished"
    assert spark.read.parquet(state).count() == 9
    assert not os.path.isdir(staged_state_path(state))


def test_state_swap_recovery_discards_when_state_alive(spark, tmp_path):
    """Completed staged dir but live state still present: the swap never
    started -> the retry will re-run the batch, so discard the stage
    (finishing would make the retry fold the batch twice)."""
    from home_credit_data_engineering_spark.sources.maintenance import (
        recover_state_swap,
        staged_state_path,
    )

    state = str(tmp_path / "state")
    spark.range(5).write.parquet(state)
    spark.range(9).write.parquet(staged_state_path(state))
    assert recover_state_swap(state) == "discarded"
    assert spark.read.parquet(state).count() == 5
    assert not os.path.isdir(staged_state_path(state))


def test_state_swap_recovery_discards_incomplete(spark, tmp_path):
    from home_credit_data_engineering_spark.sources.maintenance import (
        recover_state_swap,
        staged_state_path,
    )

    state = str(tmp_path / "state")
    spark.range(9).write.parquet(staged_state_path(state))
    os.remove(os.path.join(staged_state_path(state), "_SUCCESS"))
    assert recover_state_swap(state) == "discarded"
    assert not os.path.isdir(state)
    assert not os.path.isdir(staged_state_path(state))
