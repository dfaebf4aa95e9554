"""Probe cross-engine bit-level agreement of combo_agg_suite measures.

Runs the Spark build and the DuckDB oracle at a given sf dir, prints every
float measure with %.17g so 1-ulp drift is visible, across several
shuffle-partition settings. Used to choose hash-stable roundings.
"""

from __future__ import annotations

import struct
import sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import duckdb
import pandas as pd

from home_credit_data_engineering_spark.session import get_session
import home_credit_data_engineering_spark.plans.declared  # noqa: F401
from home_credit_data_engineering_spark.plans.registry import REGISTRY, prep
from tests.parity import run_oracle

NAME = sys.argv[2] if len(sys.argv) > 2 else "combo_agg_suite"

q = REGISTRY[NAME]
oracle = run_oracle(q.oracle, sf_dir).sort_values("l_returnflag").reset_index(drop=True)

spark = get_session()


def bits(x):
    if pd.isna(x):
        return "nan"
    return struct.pack(">d", float(x)).hex()


for parts in ("1", "7", "32", "200"):
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    pdf = (
        q.build(prep(spark), sf_dir)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    print(f"=== shuffle.partitions={parts}")
    for col in pdf.columns:
        if pdf[col].dtype.kind != "f":
            continue
        for i in range(len(pdf)):
            s, o = pdf[col][i], oracle[col][i]
            same = bits(s) == bits(o)
            flag = "" if same else "  <-- DIFF"
            print(f"  {col}[{i}] spark={s!r:<24} oracle={o!r:<24}{flag}")
spark.stop()
