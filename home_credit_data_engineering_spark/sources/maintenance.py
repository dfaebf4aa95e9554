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

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def pending_state_swap(state_path: str) -> str | None:
    """Read-only twin of :func:`recover_state_swap`: report what recovery
    WOULD do (``"finish"`` / ``"discard"``), or ``None`` when the tree is
    clean. Touches nothing — the ``sweep --dry-run`` primitive."""
    next_path = staged_state_path(state_path)
    if not os.path.isdir(next_path):
        return None
    complete = os.path.exists(os.path.join(next_path, "_SUCCESS"))
    if complete and not os.path.isdir(state_path):
        return "finish"
    return "discard"


def pending_fold_commits(state_root: str) -> list[str]:
    """Read-only twin of :func:`recover_fold_commits`: fingerprints whose
    fold crashed between ``begin_fold_commit`` and ``finish_fold_commit``
    (a ``.committing`` marker is present). Touches nothing."""
    d = ledger_dir(state_root)
    if not os.path.isdir(d):
        return []
    return sorted(
        name[: -len(".committing")]
        for name in os.listdir(d)
        if name.endswith(".committing")
    )


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


# ---------------------------------------------------------------------------
# Processed-delta ledger: replay-idempotent batch index folds
# ---------------------------------------------------------------------------
#
# The streaming index maintainers (streaming/ann.py, streaming/bm25.py)
# are replay-safe by layout: a redelivered micro-batch overwrites its own
# (…, batch) partitions. The BATCH fold CLIs (jobs/ann_index.py
# --state-dir, jobs/bm25_index.py --increment) append into a shared tree
# instead, so an at-least-once orchestrator that re-runs a COMPLETED fold
# would double-count. The ledger below makes a completed fold a no-op on
# re-run, and makes the fold itself crash-atomic:
#
# - the delta is identified by a CONTENT fingerprint (row count + an
#   order-independent xor of per-row xxhash64) — the same content-keyed
#   replay-marker discipline plans/corpus_pipeline.py uses;
# - data appends are published by renaming deterministically-named files
#   (``delta-{fp}-NNNNN.parquet``) out of a staged ``_incoming/{fp}``
#   directory, so a crashed half-publish is overwritten, not duplicated;
# - the read-modify-write sidecar legs are staged with the two-phase
#   ``__next`` swap, and the swap set commits under a two-state marker:
#   ``{fp}.committing`` (created only after EVERY staged leg is complete)
#   → swap legs → rename to ``{fp}``. :func:`recover_fold_commits`
#   finishes an interrupted commit on the next run — so every crash
#   point either replays the whole fold (appends idempotent, sidecars
#   untouched) or completes it (marker present), never half-applies it.
#
# The ledger survives index rebuilds (the rebuild sources include every
# folded delta, so replaying an old fold post-rebuild must still no-op);
# rebuild paths copy ``_delta_ledger/`` into their staged sibling.


def ledger_dir(state_root: str) -> str:
    """Processed-delta ledger directory (underscore-prefixed: hidden
    from Spark's file listing, like the ``.npy`` sidecars)."""
    return os.path.join(state_root, "_delta_ledger")


def delta_fingerprint(df: DataFrame, cols: list[str]) -> str:
    """Order-independent content fingerprint of a delta frame: row count
    + xor of per-row ``xxhash64`` over ``cols``. One delta-sized scan;
    no shuffle (both aggregates combine map-side to one row)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("x"),
    ).first()
    n = int(row["n"] or 0)
    x = int(row["x"] or 0) & 0xFFFFFFFFFFFFFFFF
    return f"{n:x}-{x:016x}"


def read_fold_marker(state_root: str, fingerprint: str) -> dict | None:
    """Payload of a COMPLETED fold for this delta, or ``None``."""
    p = os.path.join(ledger_dir(state_root), fingerprint)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def begin_fold_commit(state_root: str, fingerprint: str, payload: dict) -> None:
    """Create the ``{fp}.committing`` marker (atomic write+rename).

    Call ONLY after every staged sidecar leg is fully written (has its
    ``_SUCCESS``): from this point the fold is promised, and
    :func:`recover_fold_commits` will finish the swaps after a crash.
    """
    d = ledger_dir(state_root)
    os.makedirs(d, exist_ok=True)
    target = os.path.join(d, fingerprint + ".committing")
    tmp = target + ".__tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, target)


def finish_fold_commit(state_root: str, fingerprint: str) -> None:
    """Promote ``{fp}.committing`` → ``{fp}`` after the swaps landed."""
    d = ledger_dir(state_root)
    os.replace(
        os.path.join(d, fingerprint + ".committing"),
        os.path.join(d, fingerprint),
    )


def recover_fold_commits(state_root: str, swap_paths: list[str]) -> list[str]:
    """Finish folds that crashed between ``begin_fold_commit`` and
    ``finish_fold_commit``: swap in any completed ``__next`` of the
    fold's sidecar legs, then mark the fold done.

    MUST run before any generic :func:`recover_state_swap` on the same
    paths — the generic rule discards a completed ``__next`` while the
    live dir exists, which is exactly the committed-but-unswapped state
    this recovery exists to finish. Returns the finished fingerprints.
    """
    d = ledger_dir(state_root)
    finished: list[str] = []
    if not os.path.isdir(d):
        return finished
    for name in sorted(os.listdir(d)):
        if name.endswith(".__tmp"):
            os.remove(os.path.join(d, name))
            continue
        if not name.endswith(".committing"):
            continue
        for leg in swap_paths:
            nxt = staged_state_path(leg)
            if os.path.isdir(nxt) and os.path.exists(
                os.path.join(nxt, "_SUCCESS")
            ):
                swap_in_state(leg)
        fp = name[: -len(".committing")]
        finish_fold_commit(state_root, fp)
        finished.append(fp)
    return finished


def incoming_delta_path(state_root: str, fingerprint: str) -> str:
    """Staging directory for a fold's data append (hidden from scans)."""
    return os.path.join(state_root, "_incoming", fingerprint)


def publish_delta_files(
    incoming_dir: str, dest_root: str, fingerprint: str
) -> int:
    """Move a staged delta's parquet files into the live tree under
    deterministic names — the idempotent-append half of a fold.

    Handles one level of ``key=value`` partition subdirectories (the
    staged write's ``partitionBy``): each partition's files land in the
    matching live partition directory. Files are named
    ``delta-{fp}-NNNNN.parquet``; any same-fingerprint files already at
    the destination (a crashed earlier attempt) are removed first, so
    re-publishing converges on exactly the staged set. Returns the
    number of files published.
    """

    def _flat(src: str, dest: str) -> int:
        os.makedirs(dest, exist_ok=True)
        prefix = f"delta-{fingerprint}-"
        for f in os.listdir(dest):
            if f.startswith(prefix):
                os.remove(os.path.join(dest, f))
        files = sorted(
            f for f in os.listdir(src) if f.endswith(".parquet")
        )
        for i, f in enumerate(files):
            os.replace(
                os.path.join(src, f),
                os.path.join(dest, f"{prefix}{i:05d}.parquet"),
            )
        return len(files)

    part_dirs = sorted(
        d
        for d in os.listdir(incoming_dir)
        if "=" in d and os.path.isdir(os.path.join(incoming_dir, d))
    )
    n = 0
    if part_dirs:
        for d in part_dirs:
            n += _flat(
                os.path.join(incoming_dir, d), os.path.join(dest_root, d)
            )
    else:
        n = _flat(incoming_dir, dest_root)
    shutil.rmtree(incoming_dir)
    parent = os.path.dirname(incoming_dir)
    if os.path.isdir(parent) and not os.listdir(parent):
        os.rmdir(parent)
    return n


def unpublish_delta_files(dest_root: str, fingerprint: str) -> None:
    """Remove a fingerprint's published files — the exact inverse of
    :func:`publish_delta_files`' deterministic names. Crash-replay
    hygiene for increments that READ the legs they append to: a partial
    publish from a crashed earlier attempt of the SAME delta must be
    swept before recompute, or the delta's own rows look like accepted
    state."""
    if not os.path.isdir(dest_root):
        return
    prefix = f"delta-{fingerprint}-"
    for f in os.listdir(dest_root):
        if f.startswith(prefix):
            os.remove(os.path.join(dest_root, f))


def reconcile_orphan_delta_files(
    state_root: str, legs: tuple[str, ...], dry_run: bool = False
) -> int:
    """Remove (or in ``dry_run`` count) published ``delta-*`` files and
    ``_incoming`` staging dirs whose fingerprint has NO ledger entry —
    the residue of a pre-marker crash whose delta was then amended
    (different content → different fingerprint → the retry's own
    un-publish never matches). Returns the number of orphan fingerprints
    handled. Run only with no fold in flight (single-maintainer
    contract): a fold between publish and marker-commit looks exactly
    like residue.
    """
    d = ledger_dir(state_root)
    ledgered: set[str] = set()
    if os.path.isdir(d):
        for name in os.listdir(d):
            ledgered.add(
                name.removesuffix(".committing").removesuffix(".__tmp")
            )
    orphan_fps: set[str] = set()
    for leg in legs:
        leg_dir = os.path.join(state_root, leg)
        if not os.path.isdir(leg_dir):
            continue
        for f in os.listdir(leg_dir):
            # delta-{fp}-NNNNN.parquet, fp = "{count:x}-{xor:016x}"
            if f.startswith("delta-") and f.endswith(".parquet"):
                fp = f[len("delta-"):].rsplit("-", 1)[0]
                if fp not in ledgered:
                    orphan_fps.add(fp)
                    if not dry_run:
                        os.remove(os.path.join(leg_dir, f))
    incoming_root = os.path.join(state_root, "_incoming")
    if os.path.isdir(incoming_root):
        for fp in os.listdir(incoming_root):
            if fp not in ledgered:
                orphan_fps.add(fp)
                if not dry_run:
                    shutil.rmtree(
                        os.path.join(incoming_root, fp), ignore_errors=True
                    )
    return len(orphan_fps)


def published_delta_fingerprints(leg_dir: str) -> set[str]:
    """Fingerprints that have published ``delta-{fp}-NNNNN.parquet``
    files in this leg directory (driver-side listing, no Spark)."""
    out: set[str] = set()
    if not os.path.isdir(leg_dir):
        return out
    for f in os.listdir(leg_dir):
        if f.startswith("delta-") and f.endswith(".parquet"):
            out.add(f[len("delta-"):].rsplit("-", 1)[0])
    return out


def delta_file_count(
    state_root: str, legs: tuple[str, ...], ledgered_only: bool = False
) -> int:
    """Largest per-leg count of published ``delta-*`` files — the
    small-files pressure gauge the sweep compares to its window.
    ``ledgered_only`` excludes unledgered (orphan/in-flight) files:
    what a compaction would actually fold after reconciliation."""
    ledgered: set[str] | None = None
    if ledgered_only:
        ledgered = set()
        d = ledger_dir(state_root)
        if os.path.isdir(d):
            for name in os.listdir(d):
                ledgered.add(
                    name.removesuffix(".committing").removesuffix(".__tmp")
                )
    worst = 0
    for leg in legs:
        p = os.path.join(state_root, leg)
        if not os.path.isdir(p):
            continue
        n = 0
        for f in os.listdir(p):
            if not (f.startswith("delta-") and f.endswith(".parquet")):
                continue
            if ledgered is not None:
                fp = f[len("delta-"):].rsplit("-", 1)[0]
                if fp not in ledgered:
                    continue
            n += 1
        worst = max(worst, n)
    return worst


def compact_ledgered_legs(
    spark: SparkSession,
    state_root: str,
    legs: tuple[str, ...],
    target_files: int = 4,
) -> dict:
    """Small-files compaction for ledger-maintained APPEND-ONLY state
    legs (the exact-Jaccard / containment prefix states): rewrite each
    leg to ``target_files`` files through the two-phase ``__next`` swap,
    keeping the processed-fingerprint ledger untouched — a replayed fold
    still no-ops on its marker after its delta files are folded into the
    base.

    Run with NO fold in flight (single-maintainer contract — a
    concurrent fold both reads the legs this rewrites and publishes
    files the rewrite would drop). REFUSES when UNLEDGERED delta files
    exist (``{"skipped": "unledgered-delta-residue", ...}``): those are
    either a fold mid-publish or crash residue of an abandoned
    fingerprint, and baking them into the compacted base would make the
    phantom rows permanent and unreconcilable — reconcile first
    (``reconcile_orphan_deltas`` / ``sweep --reconcile``), then compact.

    Crash-safe: each leg goes through ``compact_parquet``'s staged swap,
    and the state families' increment preambles recover a died leg swap
    (discard a staged dir when the live leg survives; finish the rename
    when it doesn't). A crash between the two legs' swaps leaves one leg
    compacted and one not — both content-identical to before, so the
    next run just re-compacts. Returns per-leg
    ``{"files_before", "files_after", "rows"}``.
    """
    ledgered: set[str] = set()
    d = ledger_dir(state_root)
    if os.path.isdir(d):
        for name in os.listdir(d):
            ledgered.add(
                name.removesuffix(".committing").removesuffix(".__tmp")
            )
    published: set[str] = set()
    for leg in legs:
        published |= published_delta_fingerprints(
            os.path.join(state_root, leg)
        )
    orphans = published - ledgered
    if orphans:
        return {
            "skipped": "unledgered-delta-residue",
            "orphan_fingerprints": sorted(orphans),
        }
    return {
        leg: compact_parquet(
            spark, os.path.join(state_root, leg), target_files
        )
        for leg in legs
    }


def carry_ledger(state_root: str, staged_root: str) -> None:
    """Copy the processed-delta ledger into a rebuild's staged sibling
    (completed markers only — a ``.committing`` from a crashed fold is
    finished by recovery before any rebuild starts)."""
    src = ledger_dir(state_root)
    if not os.path.isdir(src):
        return
    dst = ledger_dir(staged_root)
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if name.endswith((".committing", ".__tmp")):
            continue
        shutil.copy2(os.path.join(src, name), os.path.join(dst, name))


# ---------------------------------------------------------------------------
# Layout marker: batch-maintained vs streaming-maintained index trees
# ---------------------------------------------------------------------------


def _layout_path(state_root: str) -> str:
    return os.path.join(state_root, "_layout.json")


def write_state_layout(state_root: str, maintainer: str, kind: str) -> None:
    """Record who maintains this index tree (``batch`` appends into
    cell/bucket partitions vs ``streamed`` dynamic-overwrite
    ``(…, batch)`` partitions — the two layouts conflict at partition
    discovery, so mixing maintainers must raise, not corrupt)."""
    os.makedirs(state_root, exist_ok=True)
    tmp = _layout_path(state_root) + ".__tmp"
    with open(tmp, "w") as fh:
        json.dump({"maintainer": maintainer, "kind": kind, "version": 1}, fh)
    os.replace(tmp, _layout_path(state_root))


def read_state_layout(state_root: str) -> dict | None:
    """The ``_layout.json`` marker, or ``None`` for legacy trees."""
    p = _layout_path(state_root)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _raise_on_marker_mismatch(
    state_root: str, data: dict, maintainer: str, kind: str
) -> None:
    if data.get("maintainer") != maintainer:
        raise ValueError(
            f"{state_root} is a {data.get('maintainer')}-maintained "
            f"{data.get('kind')} index; refusing a {maintainer} "
            "operation — the batch and streamed layouts conflict at "
            "partition discovery (see streaming/ann.py module doc)"
        )
    if data.get("kind") not in (None, kind):
        raise ValueError(
            f"{state_root} holds a {data.get('kind')} index, "
            f"expected {kind}"
        )


def assert_layout_if_marked(
    state_root: str, maintainer: str, kind: str
) -> bool:
    """Phase-1 guard — run BEFORE any crash recovery: an EXPLICIT
    ``_layout.json`` mismatch raises immediately, because running the
    generic swap recovery on a foreign tree can destroy its state (a
    batch tree mid fold-commit has promised ``__next`` legs that the
    streamed maintainers' generic recovery would discard — and the
    fold's own recovery would then finalize the ledger marker with
    nothing left to swap). Returns True when a marker was present and
    checked; False for legacy trees, whose full inference+adoption runs
    via :func:`check_state_layout` AFTER recovery (the inference must
    never read a leg that is mid-swap)."""
    data = read_state_layout(state_root)
    if data is None:
        return False
    _raise_on_marker_mismatch(state_root, data, maintainer, kind)
    return True


def check_state_layout(
    state_root: str,
    maintainer: str,
    kind: str,
    inferred_maintainer: str | None = None,
) -> None:
    """Raise unless this tree is (or can be adopted as) ``maintainer``-
    maintained. ``inferred_maintainer`` is the caller's on-disk-shape
    detection for legacy trees without a marker (e.g. a
    ``_cell_stats_deltas/`` dir ⇒ streamed); a legacy tree matching the
    expectation is adopted by writing the marker. Pair with
    :func:`assert_layout_if_marked` before recovery."""
    data = read_state_layout(state_root)
    if data is not None:
        _raise_on_marker_mismatch(state_root, data, maintainer, kind)
        return
    effective = inferred_maintainer or maintainer
    if effective != maintainer:
        raise ValueError(
            f"{state_root} looks {effective}-maintained (no _layout.json "
            f"marker; inferred from the on-disk tree); refusing a "
            f"{maintainer} operation"
        )
    write_state_layout(state_root, maintainer, kind)


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
