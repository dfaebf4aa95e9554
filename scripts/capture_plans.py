#!/usr/bin/env python3
"""Capture .explain('formatted') output for named declared queries.

Usage: python scripts/capture_plans.py OUT_DIR SUFFIX QUERY [QUERY...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Plan capture only —
no timed execution (builds may still run eager-checkpoint setup jobs).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from home_credit_data_engineering_spark.session import get_session

    import home_credit_data_engineering_spark.plans.declared  # noqa: F401
    from home_credit_data_engineering_spark.plans.registry import (
        REGISTRY,
        prep,
    )

    spark = get_session(
        app_name="hcde-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    prep(spark)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
