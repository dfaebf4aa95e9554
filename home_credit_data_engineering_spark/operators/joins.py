"""Join operators (SURVEY §2.4 J1-J3 + the general join surface).

The reference uses only single-key left-outer equi joins
(``spark/silver/processor.py:309-313``, ``spark/gold/processor.py:160-163``)
and lets Catalyst pick the strategy. This engine keeps that declarative
style and adds the joins the reference lacks (inner/semi/anti/full, range,
as-of) plus the two scale tools that matter at 100 TB: explicit broadcast
for dimension joins and key-salting for skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1-J3: equi join; optionally force a broadcast of the right side.

    AQE already converts to broadcast-hash when runtime stats allow; the
    explicit hint is for dimension tables known small a priori (skips the
    shuffle stage entirely instead of discovering it at runtime).
    """
    right_side = F.broadcast(right) if broadcast_right else right
    return left.join(right_side, on=on, how=how)


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str | list[str]]],
    how: str = "left",
) -> DataFrame:
    """J2: fan-in star assembly — fact ⟕ dim1 ⟕ dim2 ⟕ … (the
    gold_client_risk_profile shape, ``spark/gold/processor.py:160-163``).

    All joins share the fact's key partitioning, so Catalyst reuses one
    exchange when the keys match; per-client summary sides are typically
    much smaller than the fact and broadcast under AQE.
    """
    out = fact
    for dim, keys in dims:
        out = out.join(dim, on=keys, how=how)
    return out


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS: keep left rows with a match; never duplicates left rows."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS: keep left rows without a match."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: str | list[str] | None,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Theta/range join: equi keys (if any) + an inequality condition.

    With ``equi_keys`` Catalyst still plans a hash/sort-merge join on the
    equi part and evaluates the range predicate as a post-join filter — the
    scalable shape. A pure range join (no equi key) degrades to
    broadcast-nested-loop: acceptable only when one side is small.
    """
    if equi_keys is None:
        return left.join(right, on=condition, how=how)
    keys = [equi_keys] if isinstance(equi_keys, str) else list(equi_keys)
    cond = condition
    for k in keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, on=cond, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single latest right row with
    ``right_time <= left_time`` (direction='backward') or earliest with
    ``right_time >= left_time`` ('forward'), per ``on`` key.

    Implemented as range-join + window top-1 — pure DataFrame ops, so it
    shuffles once on the key and stays in whole-stage codegen (no
    ``merge_asof`` pandas fallback needed). Right columns keep their names;
    the right time column is suffixed ``_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    time_col = right_time + "_asof"
    # Rename the right side's key and time so the join condition references
    # unambiguous names (the left and right may share lineage — a self-join).
    r = right.withColumnRenamed(right_time, time_col).withColumnRenamed(
        on, "__asof_key"
    )
    l = left.withColumn("__lid", F.monotonically_increasing_id())
    if direction == "backward":
        time_cond = F.col(time_col) <= F.col(left_time)
        order = F.col(time_col).desc_nulls_last()
    else:
        time_cond = F.col(time_col) >= F.col(left_time)
        order = F.col(time_col).asc_nulls_last()
    # The time bound lives INSIDE the left join: a left row with only
    # out-of-range right rows still survives (with nulls), matching SQL
    # ASOF LEFT JOIN semantics.
    joined = l.join(
        r, on=(F.col(on) == F.col("__asof_key")) & time_cond, how="left"
    ).drop("__asof_key")
    # Top-1 per left row: __lid is unique, so each window partition holds
    # only that row's candidate matches.
    w = Window.partitionBy("__lid").orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lid")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi join: salt the (large, skewed) left side into
    ``salt_buckets`` sub-keys and explode the right side across all salts.

    At 100 TB a single hot key (one client with millions of events) turns a
    shuffle join into one straggler task; salting spreads the hot key over
    ``salt_buckets`` tasks at the cost of replicating the right side's
    matching rows. AQE's skew-join split handles moderate skew
    automatically; salting is for pathological keys known in advance.

    ``how`` is restricted to ``inner``/``left``: the right side is
    replicated across all salt buckets, so right/full-outer would emit up
    to ``salt_buckets - 1`` spurious null-extended rows per right row
    (each replica whose salt bucket holds no matching left row). Use a
    plain join (AQE skew split) when right/full-outer semantics are
    needed.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner'/'left' only: the right side is "
            f"replicated per salt bucket, so {how!r} would emit spurious "
            "null-extended rows for replicated right rows"
        )
    salt = (F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    left_s = left.withColumn("__salt", salt)
    right_s = right.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    return left_s.join(right_s, on=[on, "__salt"], how=how).drop("__salt")
