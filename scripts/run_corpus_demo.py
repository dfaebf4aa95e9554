#!/usr/bin/env python3
"""End-to-end training-data pipeline demo through the job CLIs.

Runs the four corpus stages a 100 TB pipeline schedules, in order, on
the driver's documents table:

1. ``jobs.quality``    — Gopher-style keep/drop filter (single pass);
2. ``jobs.dedup``      — whole-document exact + MinHash-LSH near dedup
                         with removal-list audit;
3. ``jobs.perplexity`` — CCNet-style LM scoring + head/middle/tail
                         buckets over the deduped corpus; persists the
                         unigram count state so the NEXT run refreshes
                         the model O(delta) (``--counts-out``);
4. ``jobs.corpus_prep``— exact-substring span dedup (Lee et al.,
                         arXiv:2107.06499) + sequence packing; also
                         writes the window-hash state that makes the
                         NEXT run O(delta) (``--state``).

Each stage reads the previous stage's parquet — the same handoff a
scheduler (Airflow/cron/streaming foreachBatch) would wire. One JSONL
run log accumulates all three records.

Usage: python scripts/run_corpus_demo.py [sf_dir] [workdir]
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    work = pathlib.Path(workdir)
    log = str(work / "runs.jsonl")

    from home_credit_data_engineering_spark.jobs.corpus_prep import (
        main as corpus_prep_main,
    )
    from home_credit_data_engineering_spark.jobs.dedup import main as dedup_main
    from home_credit_data_engineering_spark.jobs.perplexity import (
        main as perplexity_main,
    )
    from home_credit_data_engineering_spark.jobs.quality import main as quality_main

    print(f"== corpus pipeline over {sf_dir}/documents.parquet -> {workdir}")

    rc = quality_main(
        [
            "--input", f"{sf_dir}/documents.parquet",
            "--output", str(work / "q_kept"),
            "--dropped-output", str(work / "q_dropped"),
            "--min-tokens", "3",
            "--run-log", log,
        ]
    )
    if rc:
        return rc

    rc = dedup_main(
        [
            "--input", str(work / "q_kept"),
            "--output", str(work / "deduped"),
            "--removals-output", str(work / "removals"),
            "--near-threshold", "0.8",
            "--run-log", log,
        ]
    )
    if rc:
        return rc

    rc = perplexity_main(
        [
            "--input", str(work / "deduped"),
            "--output", str(work / "ppl_buckets"),
            "--counts-out", str(work / "lm_counts"),
            "--run-log", log,
        ]
    )
    if rc:
        return rc

    rc = corpus_prep_main(
        [
            "--input", str(work / "deduped"),
            "--output", str(work / "prepared"),
            "--spans-output", str(work / "span_audit"),
            "--window", "8",
            "--budget", "512",
            "--state-output", str(work / "window_state"),
            "--run-log", log,
        ]
    )
    if rc:
        return rc

    print("== run log")
    for line in pathlib.Path(log).read_text().splitlines():
        rec = json.loads(line)
        print("  ", {k: rec[k] for k in list(rec)[:8]})
    print(f"== artifacts under {workdir}: "
          "q_kept q_dropped deduped removals ppl_buckets lm_counts prepared "
          "span_audit window_state")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
