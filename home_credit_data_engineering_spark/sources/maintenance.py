"""Storage maintenance: small-file compaction and snapshot retention.

The two background chores a parquet lake accumulates at scale:

- **Compaction** — streaming sinks and per-batch appends produce many
  small files; scans then pay per-file open/footer costs and lose
  row-group statistics quality. ``compact_parquet`` rewrites a dataset
  to a bounded file count (optionally re-clustering while it's being
  rewritten anyway — compaction is the free moment to restore sort
  locality).
- **Retention** — daily-snapshot tables grow one partition per day
  forever; ``expire_snapshots`` drops partitions older than a cutoff
  (driver-side directory removal AFTER a successful listing, never a
  recursive delete of the root).

On a table format (Delta/Iceberg) these map onto OPTIMIZE and
VACUUM/expire_snapshots; on plain parquet they are explicit jobs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    cluster_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet dataset to ``target_files`` files.

    With ``cluster_by`` the rewrite range-partitions + sorts on those
    columns (restoring data-skipping locality); without it a plain
    ``coalesce`` avoids the shuffle entirely. The rewrite goes through a
    sibling temp dir and an atomic-ish swap (rename), so a crash leaves
    either the old or the new dataset, never a half-written mix.
    Returns ``{"files_before", "files_after", "rows"}``.
    """

    def parquet_files(p: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(p):
            out.extend(
                os.path.join(root, f) for f in files if f.endswith(".parquet")
            )
        return out

    before = len(parquet_files(path))
    df = spark.read.parquet(path)
    rows = df.count()
    tmp = path.rstrip("/") + "__compacting"
    if cluster_by:
        out = df.repartitionByRange(target_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.coalesce(target_files)
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": before,
        "files_after": len(parquet_files(path)),
        "rows": rows,
    }


def expire_snapshots(
    base_path: str,
    keep_dates: set[tuple[int, int, int]],
) -> list[str]:
    """Drop ``year=Y/month=M/day=D`` partitions not in ``keep_dates``.

    Deliberately allowlist-shaped (pass the dates to KEEP, computed by
    the caller's retention policy): a wrong cutoff then deletes nothing
    rather than everything. Returns the removed partition paths.
    """
    removed: list[str] = []
    if not os.path.isdir(base_path):
        return removed
    for ydir in sorted(os.listdir(base_path)):
        if not ydir.startswith("year="):
            continue
        year = int(ydir.split("=", 1)[1])
        ypath = os.path.join(base_path, ydir)
        for mdir in sorted(os.listdir(ypath)):
            if not mdir.startswith("month="):
                continue
            month = int(mdir.split("=", 1)[1])
            mpath = os.path.join(ypath, mdir)
            for ddir in sorted(os.listdir(mpath)):
                if not ddir.startswith("day="):
                    continue
                day = int(ddir.split("=", 1)[1])
                if (year, month, day) in keep_dates:
                    continue
                dpath = os.path.join(mpath, ddir)
                shutil.rmtree(dpath)
                removed.append(dpath)
            if not os.listdir(mpath):
                os.rmdir(mpath)
        if not os.listdir(ypath):
            os.rmdir(ypath)
    return removed
