#!/usr/bin/env python3
"""Driver-sim stress: oracle parity under varied parallelism/scan splits.

The driver's correctness gate hashes values exactly, so any aggregate whose
bits depend on accumulation order (scan splits × shuffle partitions ×
AQE re-planning) is a latent flake even when one run matches. This harness
re-runs the driver contract (``__spark_entry__.queries()`` vs
``oracle_sql()``) under deliberately different SparkSessions — thread
count, shuffle partitions, ``files.maxPartitionBytes`` (controls scan
splits and therefore partial-aggregation order), AQE on/off — and compares
**bit-exactly** every time. The DuckDB oracle is re-executed per config so
its own multi-threaded accumulation variance is sampled too.

Green across all configs is the evidence that the _stable.py discipline
(exact decimal sums + fixed double formulas) removed the order dependence,
not just that one environment happened to agree.

Usage:
  python scripts/driver_sim_stress.py [sf_dir] [--repeats N] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

#: (master, shuffle.partitions, files.maxPartitionBytes, AQE) — spread over
#: the axes that change float accumulation order.
CONFIGS = [
    ("local[2]", "7", "134217728", "false"),
    ("local[8]", "8", "4194304", "true"),
    ("local[16]", "32", "1048576", "true"),
    ("local[32]", "200", "524288", "true"),
    ("local[4]", "1", "134217728", "false"),
    ("local[32]", "64", "2097152", "true"),
]


def run_config(idx: int, cfg, sf_dir: str, only: set[str]) -> list[str]:
    from pyspark.sql import SparkSession

    master, parts, max_bytes, aqe = cfg
    spark = (
        SparkSession.builder.appName(f"driver-sim-stress-{idx}")
        .master(master)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.files.maxPartitionBytes", max_bytes)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tests.parity import assert_frames_match, run_oracle

    queries = e.queries()
    oracles = e.oracle_sql()
    failures: list[str] = []
    t0 = time.time()
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            oracle_pdf = run_oracle(oracles[name], sf_dir)
            assert_frames_match(spark_pdf, oracle_pdf, name)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            msg = str(exc).splitlines()[0] if str(exc) else repr(exc)
            print(f"  FAIL [{idx}] {name}: {msg}", flush=True)
    print(
        f"config[{idx}] master={master} parts={parts} maxPartitionBytes={max_bytes} "
        f"aqe={aqe}: {len(failures)} failures in {time.time() - t0:.0f}s",
        flush=True,
    )
    spark.stop()
    return failures


def main() -> int:
    args = [a for a in sys.argv[1:]]
    repeats = 1
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    config_ids = list(range(len(CONFIGS)))
    if "--configs" in args:
        # e.g. --configs 0,3 — the CI-shape subset (tests/test_stress_ci.py)
        # runs the two extreme configs instead of all six.
        i = args.index("--configs")
        config_ids = [int(x) for x in args[i + 1].split(",")]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    all_failures: dict[str, int] = {}
    for r in range(repeats):
        for idx in config_ids:
            for name in run_config(idx, CONFIGS[idx], sf_dir, only):
                all_failures[name] = all_failures.get(name, 0) + 1
    total_runs = repeats * len(config_ids)
    print(f"\n{total_runs} config-runs done; flaky queries: {all_failures or 'none'}")
    return 1 if all_failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
