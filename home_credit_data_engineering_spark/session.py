"""SparkSession factory with scale-appropriate defaults.

The reference builds bare sessions per job
(reference ``spark/common/spark_session.py``, ``spark/bronze/feeder_csv.py:86-89``)
and inherits every default. This engine centralizes session construction so
every entry point gets:

- **AQE** (adaptive query execution) with partition coalescing and skew-join
  splitting — the runtime re-planner that makes one static config survive a
  100× scale-up.
- **UTC session timezone** — required for timestamp parity with external
  oracles (DuckDB timestamps are UTC-naive).
- **Arrow** for any pandas interchange (extension operators only).
- Shuffle partitions sized to the local core count by default; on a real
  cluster callers pass ``shuffle_partitions`` ≈ 2-3× total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every session. Callers can override any of them.
DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime stats re-plan joins, coalesce small
    # shuffle partitions, and split skewed ones. Essential at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp semantics for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    # Arrow-accelerated pandas interchange for the extension operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Partition values keep their written (string) type — the reference's
    # ingest_date lineage column is a string, and silent string→date
    # inference would change snapshot-filter semantics.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # Columnar scan hygiene (defaults in modern Spark, pinned explicitly).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Broadcast threshold: 64 MB. Dimension tables (region/nation/customer
    # analogues) stay broadcastable well past sf0.1.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Runtime filtering: inject bloom-filter / semi-join reductions from
    # the small side of a join into the large side's scan, and prune
    # partitions from join keys at runtime (DPP). At 100 TB these skip
    # row groups/partitions for rows that cannot survive the join —
    # pinned explicitly (defaults drift across Spark minors).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    # Cost-based optimizer: with catalog statistics (catalog.analyze_table)
    # Catalyst reorders multi-way joins and picks build sides from NDV/size
    # estimates BEFORE execution — AQE can only react to stage sizes after
    # the join order is fixed. No-op on tables without stats.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Quiet the UI in test/bench runs.
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
}


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_session(
    app_name: str = "home-credit-data-engineering-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    Parameters
    ----------
    master:
        Defaults to ``local[N]`` where N comes from ``$SPARK_GRAFT_CPUS``
        or the machine core count. On a cluster pass e.g. ``yarn``.
    shuffle_partitions:
        Post-shuffle partition count. Defaults to the core count locally;
        at 100 TB scale set ~2-3× total executor cores and let AQE coalesce.
    """
    # An already-active session is returned UNTOUCHED: getOrCreate would
    # otherwise silently rewrite the live session's runtime conf (e.g.
    # shuffle partitions) — in-process callers like the job CLIs under
    # test, a notebook, or an orchestrator own their session's settings.
    # Every production entry point runs in a fresh process, where this
    # branch never fires and the defaults below apply in full.
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    parallelism = _default_parallelism()
    if master is None:
        master = f"local[{parallelism}]"
    if shuffle_partitions is None:
        shuffle_partitions = parallelism

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
