#!/usr/bin/env python3
"""Capture .explain('formatted') for the r14 cluster-operator rework:
kmeans (checkpoint=False so the full iteration lineage is visible —
the declared query's production plan is checkpoint-truncated) and
embedding_covariance, each under impl='explode' (before) and
impl='array' (after).

Usage: python scripts/capture_cluster_plans.py OUT_DIR
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out_dir = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from home_credit_data_engineering_spark.operators.cluster import (
        embedding_covariance,
        kmeans,
    )
    from home_credit_data_engineering_spark.session import get_session
    from home_credit_data_engineering_spark.sources.readers import (
        read_testdata,
    )

    spark = get_session(
        app_name="hcde-cluster-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    emb = read_testdata(spark, sf_dir, "embeddings")
    os.makedirs(out_dir, exist_ok=True)
    frames = {
        "sim_kmeans_clusters_op_before": kmeans(
            emb, k=8, iterations=3, checkpoint=False, impl="explode"
        ),
        "sim_kmeans_clusters_op_after": kmeans(
            emb, k=8, iterations=3, checkpoint=False, impl="array"
        ),
        "sim_pca_whitening_cov_before": embedding_covariance(
            emb, "vec_id", "embedding", impl="explode"
        ),
        "sim_pca_whitening_cov_after": embedding_covariance(
            emb, "vec_id", "embedding", impl="array"
        ),
    }
    for name, df in frames.items():
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
