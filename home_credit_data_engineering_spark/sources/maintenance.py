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

A third shared chore lives here too: the **two-phase state swap**
(:func:`staged_state_path` / :func:`recover_state_swap` /
:func:`swap_in_state`) that every read-modify-write state job needs on
plain parquet — the incremental plan READS yesterday's state files, so
an in-place overwrite would consume its own input. Write the new state
to ``{state}__next``, then swap. The swap itself has a crash window
(between removing the old state and renaming the new one in), so every
job calls :func:`recover_state_swap` on startup; the recovery rules are
documented on that function and tested directly in
``tests/test_maintenance.py``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def staged_state_path(state_path: str) -> str:
    """Where a two-phase state swap stages its next version."""
    return state_path.rstrip("/") + "__next"


def recover_state_swap(state_path: str) -> str | None:
    """Crash recovery for :func:`swap_in_state` — call on job startup.

    A leftover ``{state}__next`` means a prior run died mid-swap:

    - its write COMPLETED (``_SUCCESS`` marker) and the live state is
      gone (crash between the old state's removal and the rename) →
      **finish** the swap: that run's output was durable, and
      re-running its batch against a state that no longer exists is
      impossible anyway;
    - anything else → **discard** it: either the write never finished
      (the batch was never applied and will be re-run), or it finished
      but the live state still exists (the swap never started, so the
      retry re-runs the same batch against the same old state and
      produces the same staged output — finishing instead would make
      the retry fold the batch twice).

    Returns ``"finished"`` / ``"discarded"`` for observability, or
    ``None`` when there was nothing to recover.
    """
    next_path = staged_state_path(state_path)
    if not os.path.isdir(next_path):
        return None
    complete = os.path.exists(os.path.join(next_path, "_SUCCESS"))
    if complete and not os.path.isdir(state_path):
        os.rename(next_path, state_path)
        return "finished"
    shutil.rmtree(next_path)
    return "discarded"


def swap_in_state(state_path: str) -> None:
    """Promote a fully-written ``{state}__next`` to ``state_path``.

    Raises if the staged dir is missing its ``_SUCCESS`` marker — an
    incomplete write must never be swapped in. A crash between the
    old state's removal and the rename leaves only the completed
    staged dir, which :func:`recover_state_swap` finishes on the next
    run — so the pair is crash-safe end to end.
    """
    next_path = staged_state_path(state_path)
    if not os.path.exists(os.path.join(next_path, "_SUCCESS")):
        raise RuntimeError(
            f"{next_path} has no _SUCCESS marker — refusing to swap in "
            "an incomplete state write"
        )
    if os.path.isdir(state_path):
        shutil.rmtree(state_path)
    os.rename(next_path, state_path)


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

    recover_state_swap(path)
    before = len(parquet_files(path))
    df = spark.read.parquet(path)
    rows = df.count()
    if cluster_by:
        out = df.repartitionByRange(target_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.coalesce(target_files)
    out.write.mode("overwrite").parquet(staged_state_path(path))
    swap_in_state(path)
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
