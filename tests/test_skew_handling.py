"""Skew posture tests: AQE splits a skewed join partition at runtime, and
the explicit salting operator remains correct for keys beyond AQE's reach.

(The salted_join ≡ plain-join equivalence is in test_operators_unit; this
file proves the AQE path actually engages on a hot key.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONF = {
    # Scaled-down thresholds so the local hot key (≈12 MB of incompressible
    # shuffle bytes) crosses the same ratios a hot client would at 100 TB.
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1048576",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1048576",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        # 50% of 400k rows share key 0; payload is high-entropy so the hot
        # shuffle partition exceeds the skew threshold uncompressed.
        left = spark.range(400000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 500).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(500).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, on="k").select(F.sum(F.length("pad")).alias("s"))
        [row] = j.collect()
        assert row["s"] == 400000 * 64  # sha2-256 hex = 64 chars, all rows kept

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # The join node is the stable marker; the AQEShuffleRead label
        # varies ("skewed" vs "coalesced and skewed") across runs.
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
