"""Merge / upsert / SCD2 / snapshot-diff operators.

Lakehouse write patterns for daily-snapshot pipelines, emulated with pure
DataFrame algebra (MERGE INTO needs Delta/Iceberg jars, absent here; on a
table format these same semantics map 1:1 onto ``MERGE WHEN MATCHED …``):

- :func:`upsert` — updates win over current rows on the key (anti-join +
  union).
- :func:`scd2_apply` — slowly-changing-dimension type 2: changed keys close
  their current version (``valid_to`` set) and append a new open version;
  unchanged rows are untouched. The client-dimension historization a daily
  application snapshot needs.
- :func:`snapshot_diff` — CDC between two snapshots: added / removed /
  changed keys with both sides' payloads (full-outer join).

All three are key-partitioned joins — one shuffle each on the merge key,
no driver involvement, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(current: DataFrame, updates: DataFrame, key: str | list[str]) -> DataFrame:
    """Updates replace current rows with the same key; new keys append.

    Equivalent of ``MERGE … WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
    INSERT`` with whole-row updates.
    """
    keys = [key] if isinstance(key, str) else list(key)
    kept = current.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def _hash_payload(df: DataFrame, keys: list[str]) -> DataFrame:
    # Sorted column order: history and updates may carry the same payload
    # columns in different physical order, and the comparison must not
    # depend on it. Each column is hashed individually (fixed-width hex
    # token, NULL marked with a non-hex sentinel) before the combining
    # hash, so NULL vs literal-sentinel strings and values containing a
    # would-be delimiter cannot collide across column boundaries.
    payload = sorted(c for c in df.columns if c not in keys)
    tokens = [
        F.coalesce(F.sha2(F.col(c).cast("string"), 256), F.lit("∅")) for c in payload
    ]
    return df.withColumn("__payload_hash", F.sha2(F.concat_ws("", *tokens), 256))


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    effective_date: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 merge of a new snapshot into a versioned dimension.

    ``history`` carries ``valid_from/valid_to/is_current`` columns;
    ``updates`` is the raw new snapshot (no version columns). Rows whose
    payload is unchanged keep their open version; changed/new keys close
    the old version at ``effective_date`` and open a new one. Payload
    comparison is a sha2 over all non-key columns (null-safe), computed
    once per side.
    """
    keys = [key] if isinstance(key, str) else list(key)
    version_cols = [valid_from_col, valid_to_col, current_col]

    open_rows = history.filter(F.col(current_col))
    closed_rows = history.filter(~F.col(current_col))

    u = _hash_payload(updates, keys)
    o = _hash_payload(open_rows.drop(*version_cols), keys).select(
        *keys, F.col("__payload_hash").alias("__open_hash")
    )
    flagged = u.join(o, on=keys, how="left").withColumn(
        "__is_new_version",
        F.col("__open_hash").isNull() | (F.col("__open_hash") != F.col("__payload_hash")),
    )
    changed_keys = flagged.filter(F.col("__is_new_version")).select(*keys)

    # Open rows for unchanged keys stay open; for changed keys they close.
    still_open = open_rows.join(changed_keys, on=keys, how="left_anti")
    newly_closed = (
        open_rows.join(changed_keys, on=keys, how="left_semi")
        .withColumn(valid_to_col, F.lit(effective_date))
        .withColumn(current_col, F.lit(False))
    )
    new_versions = (
        flagged.filter(F.col("__is_new_version"))
        .drop("__payload_hash", "__open_hash", "__is_new_version")
        .withColumn(valid_from_col, F.lit(effective_date))
        .withColumn(valid_to_col, F.lit(None).cast("string"))
        .withColumn(current_col, F.lit(True))
    )
    return (
        closed_rows.unionByName(still_open)
        .unionByName(newly_closed)
        .unionByName(new_versions)
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str | list[str]
) -> DataFrame:
    """CDC between snapshots: (key columns…, change ∈ {added, removed,
    changed}) — unchanged rows are dropped. Payloads compared null-safely
    via sha2 over non-key columns."""
    keys = [key] if isinstance(key, str) else list(key)
    o = _hash_payload(old, keys).select(*keys, F.col("__payload_hash").alias("__old_h"))
    n = _hash_payload(new, keys).select(*keys, F.col("__payload_hash").alias("__new_h"))
    joined = o.join(n, on=keys, how="full_outer")
    return (
        joined.withColumn(
            "change",
            F.when(F.col("__old_h").isNull(), F.lit("added"))
            .when(F.col("__new_h").isNull(), F.lit("removed"))
            .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed")),
        )
        .filter(F.col("change").isNotNull())
        .drop("__old_h", "__new_h")
    )
