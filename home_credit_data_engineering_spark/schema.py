"""Declared-schema registry.

The reference relies on ``inferSchema=true`` for CSV and JDBC metadata for
Postgres (reference ``spark/bronze/feeder_csv.py:95-100``,
``spark/bronze/feeder_postgres.py:68-77``), which makes every run's types a
function of the data. This engine declares ``StructType`` schemas up front
(SURVEY §1.2/§1.3): scans stay vectorized, column pruning is exact, and a
schema drift is an error at read time instead of a silent type change at
100 TB.

Two families live here:

- The home-credit pipeline input tables (FIXTURES.md §A) — the reference's
  semantic data model.
- The driver's TPC-H-ish synthetic tables (TESTDATA.md) used by the
  operator-parity test suite.

Readers use :func:`tolerant` mode: extra columns in the data are allowed
(the reference is explicitly schema-tolerant —
``spark/silver/processor.py:96,108,614-623``), missing nullable columns
surface as nulls via ``unionByName(allowMissingColumns=True)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Home-credit pipeline schemas (FIXTURES.md §A; reference semantics)
# ---------------------------------------------------------------------------

#: All Bronze-input fields are nullable: dirty input is expected and the
#: Silver validation rules are what enforce key presence.
#: application_train / application_test (grain: SK_ID_CURR).
#: TARGET is nullable — test rows have no label
#: (reference ``spark/gold/processor.py:143``).
APPLICATION = T.StructType(
    [
        T.StructField("SK_ID_CURR", T.LongType(), True),
        T.StructField("TARGET", T.IntegerType(), True),
        T.StructField("AMT_INCOME_TOTAL", T.DoubleType(), True),
        T.StructField("AMT_CREDIT", T.DoubleType(), True),
        T.StructField("AMT_ANNUITY", T.DoubleType(), True),
        T.StructField("DAYS_BIRTH", T.IntegerType(), True),
        T.StructField("CODE_GENDER", T.StringType(), True),
    ]
)

#: bureau (grain: SK_ID_BUREAU; FK SK_ID_CURR).
BUREAU = T.StructType(
    [
        T.StructField("SK_ID_CURR", T.LongType(), True),
        T.StructField("SK_ID_BUREAU", T.LongType(), True),
        T.StructField("CREDIT_ACTIVE", T.StringType(), True),
        T.StructField("CREDIT_DAY_OVERDUE", T.IntegerType(), True),
        T.StructField("AMT_CREDIT_SUM_DEBT", T.DoubleType(), True),
        T.StructField("AMT_CREDIT_SUM_OVERDUE", T.DoubleType(), True),
    ]
)

#: bureau_balance (grain: SK_ID_BUREAU × MONTHS_BALANCE; the one time-series).
BUREAU_BALANCE = T.StructType(
    [
        T.StructField("SK_ID_BUREAU", T.LongType(), True),
        T.StructField("MONTHS_BALANCE", T.IntegerType(), True),
        T.StructField("STATUS", T.StringType(), True),
    ]
)

#: installments_payments (grain: one row per payment).
INSTALLMENTS_PAYMENTS = T.StructType(
    [
        T.StructField("SK_ID_PREV", T.LongType(), True),
        T.StructField("SK_ID_CURR", T.LongType(), True),
        T.StructField("NUM_INSTALMENT_NUMBER", T.IntegerType(), True),
        T.StructField("DAYS_INSTALMENT", T.IntegerType(), True),
        T.StructField("DAYS_ENTRY_PAYMENT", T.IntegerType(), True),
        T.StructField("AMT_INSTALMENT", T.DoubleType(), True),
        T.StructField("AMT_PAYMENT", T.DoubleType(), True),
    ]
)

#: previous_application (grain: SK_ID_PREV; FK SK_ID_CURR).
PREVIOUS_APPLICATION = T.StructType(
    [
        T.StructField("SK_ID_PREV", T.LongType(), True),
        T.StructField("SK_ID_CURR", T.LongType(), True),
        T.StructField("NAME_CONTRACT_STATUS", T.StringType(), True),
        T.StructField("AMT_APPLICATION", T.DoubleType(), True),
        T.StructField("AMT_CREDIT", T.DoubleType(), True),
    ]
)

#: Stable pivot domain for NAME_CONTRACT_STATUS. The reference lets
#: ``pivot()`` infer values from data (``spark/silver/processor.py:623-634``)
#: which makes the output schema data-dependent; the engine pins it
#: (SURVEY §7.4.2).
CONTRACT_STATUS_VALUES = ["Approved", "Refused", "Canceled", "Unused offer"]

HOME_CREDIT_SCHEMAS: dict[str, T.StructType] = {
    "application": APPLICATION,
    "bureau": BUREAU,
    "bureau_balance": BUREAU_BALANCE,
    "installments_payments": INSTALLMENTS_PAYMENTS,
    "previous_application": PREVIOUS_APPLICATION,
}

# ---------------------------------------------------------------------------
# Driver testdata schemas (TESTDATA.md; TPC-H-ish star + events/docs/vectors)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    # events.ts is physically TIMESTAMP(NANOS) parquet, which Spark cannot
    # read as TimestampType (micros). It is declared LongType here and read
    # with spark.sql.legacy.parquet.nanosAsLong=true; the reader converts it
    # to a microsecond timestamp exactly (see sources.readers.read_testdata).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


def conform(df, schema: T.StructType):
    """Conform a DataFrame to a declared schema: add missing nullable
    columns as typed NULLs, cast mistyped columns, drop extras, order
    columns per the schema.

    The tolerant-ingestion primitive for heterogeneous 100 TB sources:
    upstream schema drift becomes an explicit, lossless normalization
    instead of a runtime surprise (pairs with
    ``unionByName(allowMissingColumns=True)`` — SURVEY §1.2 tolerance).
    """
    from pyspark.sql import functions as F

    existing = {f.name: f for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        if field.name not in existing:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif existing[field.name].dataType != field.dataType:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)
