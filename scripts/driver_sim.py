#!/usr/bin/env python3
"""Simulate the driver's verify flow against __spark_entry__.py.

Builds a PLAIN SparkSession (no engine defaults — like the driver would),
then: (1) smoke-runs entry(), (2) runs every queries() entry at the given
sf against its oracle_sql() in DuckDB, comparing row count, column names,
and values. Exit code 0 = all match.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Deliberately NOT the engine session factory: the driver builds its own.
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as e
    from tests.parity import assert_frames_match, run_oracle

    out = e.entry(spark)
    rows = out.collect()
    print(f"entry(): {len(rows)} rows, schema={out.columns}")
    assert len(rows) > 0

    queries = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            out_df = fn(spark, sf_dir)
            from pyspark.sql.types import ArrayType, MapType, StructType

            complex_cols = [
                f"{f.name}: {f.dataType.simpleString()}"
                for f in out_df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                raise TypeError(
                    "driver-incompatible output schema (the driver "
                    f"canonicalizer cannot sort complex values): {complex_cols}"
                )
            spark_pdf = out_df.toPandas()
            if name in oracles:
                oracle_pdf = run_oracle(oracles[name], sf_dir)
                # queries() IS the driver set — use the driver's strict
                # canonicalization (non-scalar cell values hard-error).
                assert_frames_match(
                    spark_pdf, oracle_pdf, name, driver_strict=True
                )
                print(f"  OK   {name}: {len(spark_pdf)} rows == oracle")
            else:
                print(f"  ROWS {name}: {len(spark_pdf)} rows (no oracle)")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  FAIL {name}: {exc}")
    print(f"{len(queries)} queries, {len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
