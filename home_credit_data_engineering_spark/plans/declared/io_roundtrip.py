"""IO round-trip declared queries: the write paths (partitioned parquet,
CSV) exercised inside the driver's correctness gate.

Each query writes to a process-local temp dir through the engine's sink,
reads back through the engine's snapshot reader, and aggregates; the
oracle aggregates the original table directly — so a lossy or
row-multiplying write/read path fails the hash compare. Columns are chosen
so the round-trip is exactly lossless (integers/strings for CSV).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import (
    read_csv,
    read_snapshot,
    read_testdata,
)
from home_credit_data_engineering_spark.plans.declared._stable import ssum, xsum
from home_credit_data_engineering_spark.sources.sinks import write_parquet


@register(
    "io_partitioned_parquet_roundtrip",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {ssum("o_totalprice", 2)} AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    operators=("K1", "S4"),
    doc="K1+S4 under the correctness gate: partition the orders table by "
    "status, write parquet (dynamic overwrite), read ONE partition back "
    "per status via the pruned snapshot reader, union, aggregate. Any "
    "row multiplication or partition leakage breaks the hash.",
)
def io_partitioned_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="io_roundtrip_")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    parts = [
        read_snapshot(spark, out, {"o_orderstatus": status})
        for status in ("F", "O", "P")
    ]
    back = parts[0]
    for p in parts[1:]:
        back = back.unionByName(p)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        xsum("o_totalprice", 2).alias("total_price"),
    )


@register(
    "io_csv_roundtrip",
    oracle="""
    SELECT n_regionkey AS region_key, COUNT(*) AS n_nations,
           MIN(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    """,
    operators=("S2", "K-csv"),
    doc="S2 under the correctness gate: write nation to CSV (header), read "
    "back with a DECLARED schema (no inference), aggregate. Integer/string "
    "columns only, so the text round-trip is exactly lossless.",
)
def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_testdata(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="io_csv_") + "/nation_csv"
    nation.write.mode("overwrite").option("header", "true").csv(out)
    back = read_csv(
        spark,
        out,
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    return back.groupBy(F.col("n_regionkey").alias("region_key")).agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_nation"),
    )


@register(
    "io_json_orc_roundtrip",
    oracle="""
    SELECT 'json' AS src, c_mktsegment AS key, COUNT(*) AS n_rows,
           CAST(MIN(c_custkey) AS VARCHAR) AS detail
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'orc', CAST(s_nationkey AS VARCHAR), COUNT(*), MIN(s_name)
    FROM supplier GROUP BY s_nationkey
    """,
    operators=("S-json", "K-json", "S-orc", "K-orc"),
    doc="JSON-Lines and ORC round-trips under the correctness gate: "
    "customer → gzip JSONL write → declared-schema read → aggregate; "
    "supplier → ORC write → read → aggregate. Columns are ints/strings "
    "so both trips are exactly lossless; any row loss/multiplication or "
    "type drift breaks the hash. Driver-covered via combo_io_roundtrip's "
    "json/orc legs.",
)
def io_json_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tempfile

    from home_credit_data_engineering_spark.sources.readers import (
        read_json,
        read_orc,
    )
    from home_credit_data_engineering_spark.sources.sinks import (
        write_json,
        write_orc,
    )

    out = _tempfile.mkdtemp(prefix="io_json_orc_")
    customer = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    write_json(customer, out + "/customer_json")
    back_json = read_json(
        spark, out + "/customer_json", schema="c_custkey bigint, c_mktsegment string"
    )
    json_leg = back_json.groupBy(F.col("c_mktsegment").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("c_custkey").cast("string").alias("detail"),
    ).select(F.lit("json").alias("src"), "key", "n_rows", "detail")

    supplier = read_testdata(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    write_orc(supplier, out + "/supplier_orc")
    orc_leg = read_orc(spark, out + "/supplier_orc").groupBy(
        F.col("s_nationkey").cast("string").alias("key")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("s_name").alias("detail"),
    ).select(F.lit("orc").alias("src"), "key", "n_rows", "detail")
    return json_leg.unionByName(orc_leg)


_FP_COLS = [
    "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus",
]
# Mirrors reconcile._encode_value: length-prefixed values + 'N' null tag,
# injective even when values contain separator/control bytes (ADVICE r4).
_FP_ENC_SQL = " || chr(31) || ".join(
    f"CASE WHEN {c} IS NULL THEN 'N' ELSE 'V' || "
    f"CAST(length(CAST({c} AS VARCHAR)) AS VARCHAR) || ':' || "
    f"CAST({c} AS VARCHAR) END"
    for c in _FP_COLS
)


@register(
    "table_fingerprint_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST('0x' || substr(md5({_FP_ENC_SQL}), 1, 15) AS BIGINT))
                AS VARCHAR) AS fingerprint
    FROM orders
    """,
    operators=("Rec-ext:fingerprint",),
    doc="Cross-engine table fingerprint (operators/reconcile.py): "
    "order-insensitive sum of per-row md5-derived 60-bit digests over a "
    "canonical column encoding — the migration-validation primitive that "
    "proves a table copied from the reference engine (or any SQL engine) "
    "arrived intact, without collecting either side. The oracle computes "
    "the identical arithmetic in DuckDB; a hash match here IS the "
    "cross-engine guarantee. Float columns are excluded by contract "
    "(engine-specific textual forms).",
)
def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.reconcile import (
        table_fingerprint,
    )

    orders = read_testdata(spark, sf_dir, "orders")
    return table_fingerprint(orders, _FP_COLS)


#: DuckDB twin of ``operators/reconcile.py:snapshot_drift`` over the
#: declared mutation of documents — ``drift_out(column, metric,
#: old_value, new_value, changed)``. The "new snapshot" is derived
#: identically in both engines: drop ``source``, null ``lang`` where
#: doc_id % 7 = 0, keep only doc_id % 11 != 0. The dtype rows assert
#: the EXPECTED Spark schema strings — that is the drift contract (a
#: type change on either side flips `changed`).
DRIFT_SQL_CTES = """
    dr_new AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
             n_chars
      FROM documents WHERE doc_id % 11 != 0),
    dr_meta(column_name, metric, old_value, new_value) AS (VALUES
      ('doc_id', 'present', 'true', 'true'),
      ('doc_id', 'dtype', 'bigint', 'bigint'),
      ('lang', 'present', 'true', 'true'),
      ('lang', 'dtype', 'string', 'string'),
      ('n_chars', 'present', 'true', 'true'),
      ('n_chars', 'dtype', 'bigint', 'bigint'),
      ('source', 'present', 'true', 'false'),
      ('source', 'dtype', 'string', CAST(NULL AS VARCHAR)),
      ('text', 'present', 'true', 'true'),
      ('text', 'dtype', 'string', 'string')),
    dr_old_p AS (
      SELECT CAST(COUNT(*) AS VARCHAR) AS rc,
             CAST(COUNT(doc_id) AS VARCHAR) AS nn_doc_id,
             CAST(COUNT(DISTINCT doc_id) AS VARCHAR) AS nd_doc_id,
             CAST(COUNT(lang) AS VARCHAR) AS nn_lang,
             CAST(COUNT(DISTINCT md5(lang)) AS VARCHAR) AS nd_lang,
             CAST(COUNT(n_chars) AS VARCHAR) AS nn_n_chars,
             CAST(COUNT(DISTINCT n_chars) AS VARCHAR) AS nd_n_chars,
             CAST(COUNT(text) AS VARCHAR) AS nn_text,
             CAST(COUNT(DISTINCT md5(text)) AS VARCHAR) AS nd_text
      FROM documents),
    dr_new_p AS (
      SELECT CAST(COUNT(*) AS VARCHAR) AS rc,
             CAST(COUNT(doc_id) AS VARCHAR) AS nn_doc_id,
             CAST(COUNT(DISTINCT doc_id) AS VARCHAR) AS nd_doc_id,
             CAST(COUNT(lang) AS VARCHAR) AS nn_lang,
             CAST(COUNT(DISTINCT md5(lang)) AS VARCHAR) AS nd_lang,
             CAST(COUNT(n_chars) AS VARCHAR) AS nn_n_chars,
             CAST(COUNT(DISTINCT n_chars) AS VARCHAR) AS nd_n_chars,
             CAST(COUNT(text) AS VARCHAR) AS nn_text,
             CAST(COUNT(DISTINCT md5(text)) AS VARCHAR) AS nd_text
      FROM dr_new),
    dr_counts AS (
      SELECT '__table__' AS column_name, 'row_count' AS metric,
             o.rc AS old_value, n.rc AS new_value
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'doc_id', 'non_null', o.nn_doc_id, n.nn_doc_id
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'doc_id', 'n_distinct', o.nd_doc_id, n.nd_doc_id
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'lang', 'non_null', o.nn_lang, n.nn_lang
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'lang', 'n_distinct', o.nd_lang, n.nd_lang
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'n_chars', 'non_null', o.nn_n_chars, n.nn_n_chars
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'n_chars', 'n_distinct', o.nd_n_chars, n.nd_n_chars
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'text', 'non_null', o.nn_text, n.nn_text
      FROM dr_old_p o CROSS JOIN dr_new_p n
      UNION ALL SELECT 'text', 'n_distinct', o.nd_text, n.nd_text
      FROM dr_old_p o CROSS JOIN dr_new_p n),
    dr_out AS (
      SELECT column_name AS "column", metric, old_value, new_value,
             NOT (old_value IS NOT DISTINCT FROM new_value) AS changed
      FROM (SELECT * FROM dr_meta UNION ALL SELECT * FROM dr_counts) u)"""


@register(
    "quality_snapshot_drift",
    oracle=f"""
    WITH {DRIFT_SQL_CTES}
    SELECT * FROM dr_out
    """,
    operators=("Q-ext:drift",),
    doc="Schema + profile drift between table snapshots (operators/"
    "reconcile.py:snapshot_drift — the pre-promotion contract check): "
    "the 'new' snapshot deterministically drops the source column, "
    "nulls lang for doc_id % 7 = 0, and removes doc_id % 11 = 0 rows; "
    "the drift report must flag exactly those — presence/dtype rows "
    "from schema metadata (zero data passes), row_count/non_null/"
    "n_distinct exact counts from ONE aggregate pass per side "
    "(multi-distinct planned via expand — a constant factor over one "
    "scan), NULL-safe string comparison for `changed`. The dtype rows "
    "pin the EXPECTED Spark type strings, so an upstream type change "
    "fails the oracle — that is the point.",
)
def quality_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.reconcile import (
        snapshot_drift,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    new = (
        docs.filter(F.col("doc_id") % 11 != 0)
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
                F.col("lang")
            ),
        )
        .drop("source")
    )
    return snapshot_drift(docs, new)
