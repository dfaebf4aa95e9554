"""Persisted per-run operational metrics (JSONL).

The reference appends per-job log files that double as its operational
record (``/root/reference/spark/common/logger.py:48-56`` — "logs exported
to .txt file per run"). This engine returns metrics objects from
orchestration (better for a library), and this module adds the persisted
leg: one **structured JSONL line per pipeline run** — machine-parseable
where the reference's text logs need grepping, and append-only so a file
accumulates run history that regression checks can diff.

Driver-side file I/O only (a few hundred bytes per run) — nothing here
touches executors or the data path.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager


def append_run_log(path: str, record: dict) -> dict:
    """Append ``record`` as one JSON line to ``path`` (dirs created).

    A ``ts`` epoch-seconds field is stamped if absent. Returns the record
    as written.
    """
    out = {"ts": round(time.time(), 3), **record}
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with open(path, "a", encoding="utf-8") as fh:
        fh.write(json.dumps(out, sort_keys=True, default=str) + "\n")
    return out


def read_run_log(path: str) -> list[dict]:
    """All records of a JSONL run log (empty list if the file is absent)."""
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as fh:
        return [json.loads(line) for line in fh if line.strip()]


@contextmanager
def timed(into: dict, key: str):
    """Record wall seconds of the block under ``into[key]``."""
    t0 = time.monotonic()
    try:
        yield
    finally:
        into[key] = round(time.monotonic() - t0, 3)
