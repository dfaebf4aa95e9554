"""Streaming entity resolution: stream of record micro-batches ==
one-shot batch resolution on the union (the stream==batch discipline),
plus snapshot retention/idempotency mechanics."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from home_credit_data_engineering_spark.operators.linkage import (
    blocked_pairs,
    resolve_entities,
)
from home_credit_data_engineering_spark.streaming.linkage import (
    foreach_batch_entity_resolution,
    read_entity_state,
)

_ROWS = [
    # wave 1
    (1, "B", "ann smith"),
    (2, "B", "ann smyth"),
    (7, "C", "bob ray"),
    # wave 2: 4 bridges 2 and 5-to-come? no — 4 matches 2 only here
    (4, "B", "ann smythe"),
    (9, "C", "bob raye"),
    # wave 3: 5 bridges the B-entity and its own spelling; 8 isolated
    (5, "B", "ann smythe"),
    (8, "D", "zoe quinn"),
]
_WAVES = ((1, 2, 7), (4, 9), (5, 8))


def _matcher(pairs):
    return pairs.filter(
        F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1
    )


def test_streaming_er_equals_batch(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("blk", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, wave in enumerate(_WAVES):
        rows = [r for r in _ROWS if r[0] in wave]
        d = f"{src}/w{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:02d}.parquet")

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(flat)
    )
    foreach_batch_entity_resolution(
        stream,
        state,
        ckpt,
        id_col="id",
        block_cols=["blk"],
        compare_cols=["name"],
        matcher=_matcher,
    )

    got = {
        r["id"]: r["entity_id"]
        for r in read_entity_state(spark, state).collect()
    }

    union = spark.createDataFrame(_ROWS, schema)
    pairs = blocked_pairs(union, "id", ["blk"], carry_cols=["name"])
    want = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(
            union, _matcher(pairs), "id", "id_a", "id_b"
        ).collect()
    }
    assert got == want
    # every id present, entities merged across waves (4 and 5 joined 1's
    # entity; 9 joined 7's)
    assert got[4] == got[1] and got[5] == got[1] and got[9] == got[7]
    assert got[8] == 8

    # retention: only the last 2 snapshots remain
    snaps = sorted(os.listdir(f"{state}/entities"))
    assert len(snaps) == 2


def test_streaming_er_replay_is_idempotent(spark, tmp_path):
    # Re-applying the FINAL batch against its predecessor snapshot (the
    # at-least-once replay case) must rewrite an identical snapshot.
    from home_credit_data_engineering_spark.operators.linkage import (
        incremental_resolve_entities,
    )

    schema = "id long, blk string, name string"
    state = spark.createDataFrame(
        [(1, 1, "B", "ann smith"), (2, 1, "B", "ann smyth")],
        "id long, entity_id long, blk string, name string",
    )
    batch = spark.createDataFrame([(4, "B", "ann smythe")], schema)
    once = incremental_resolve_entities(
        state, batch, "id", ["blk"], ["name"], _matcher
    )
    twice = incremental_resolve_entities(
        state, batch, "id", ["blk"], ["name"], _matcher
    )
    assert sorted(once.collect()) == sorted(twice.collect())


def _run_er_stream(spark, schema, flat, state, ckpt, **kwargs):
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(flat)
    )
    foreach_batch_entity_resolution(
        stream,
        state,
        ckpt,
        id_col="id",
        block_cols=["blk"],
        compare_cols=["name"],
        matcher=_matcher,
        **kwargs,
    )


def _write_waves(spark, schema, tmp_path):
    src = str(tmp_path / "src")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, wave in enumerate(_WAVES):
        rows = [r for r in _ROWS if r[0] in wave]
        d = f"{src}/w{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:02d}.parquet")
    return flat


def test_streaming_er_crash_replay_recovers(spark, tmp_path):
    """At-least-once redelivery through the REAL checkpoint machinery:
    crash after entities/batch=N was written but before the offset
    committed means restart redelivers batch N with its snapshot already
    on disk. The batch must be treated as a replay (recompute from the
    predecessor), not a checkpoint reset."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("blk", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    flat = _write_waves(spark, schema, tmp_path)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _run_er_stream(spark, schema, flat, state, ckpt)

    # Simulate the crash window: the snapshot for the final batch exists
    # but its offset commit is gone -> restart replays that batch.
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run_er_stream(spark, schema, flat, state, ckpt)

    got = {
        r["id"]: r["entity_id"]
        for r in read_entity_state(spark, state).collect()
    }
    union = spark.createDataFrame(_ROWS, schema)
    pairs = blocked_pairs(union, "id", ["blk"], carry_cols=["name"])
    want = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(
            union, _matcher(pairs), "id", "id_a", "id_b"
        ).collect()
    }
    assert got == want


def test_streaming_er_checkpoint_reset_still_raises(spark, tmp_path):
    import pytest

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("blk", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    flat = _write_waves(spark, schema, tmp_path)
    state = str(tmp_path / "state")
    _run_er_stream(spark, schema, flat, state, str(tmp_path / "ckpt"))
    # Fresh checkpoint restarts batch ids at 0 while snapshots up to
    # batch=2 exist -> batch 0 < max snapshot id: refuse loudly.
    with pytest.raises(Exception, match="checkpoint was reset"):
        _run_er_stream(spark, schema, flat, state, str(tmp_path / "ckpt2"))


def test_streaming_er_maintains_serving_index(spark, tmp_path):
    """index_output: the per-batch incremental refresh must leave the
    serving index EXACTLY equal to a full write of the final state —
    including across a crash-replay of the last batch."""
    from home_credit_data_engineering_spark.operators.linkage import (
        entity_profile,
        write_entity_index,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("blk", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    flat = _write_waves(spark, schema, tmp_path)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "idx")
    _run_er_stream(
        spark, schema, flat, state, ckpt,
        index_output=idx, index_buckets=4,
    )

    full = str(tmp_path / "full")
    write_entity_index(read_entity_state(spark, state), full, "id",
                       n_buckets=4)
    for leg, part in (("by_record", "rbucket"), ("by_entity", "ebucket")):
        a = sorted(
            map(tuple, spark.read.parquet(f"{idx}/{leg}").drop(part).collect())
        )
        b = sorted(
            map(tuple, spark.read.parquet(f"{full}/{leg}").drop(part).collect())
        )
        assert a == b and len(a) == len(_ROWS)

    # crash window on the final batch: replay must converge the index too
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run_er_stream(
        spark, schema, flat, state, ckpt,
        index_output=idx, index_buckets=4,
    )
    for leg, part in (("by_record", "rbucket"), ("by_entity", "ebucket")):
        a = sorted(
            map(tuple, spark.read.parquet(f"{idx}/{leg}").drop(part).collect())
        )
        b = sorted(
            map(tuple, spark.read.parquet(f"{full}/{leg}").drop(part).collect())
        )
        assert a == b

    # serving endpoint works against the streamed index
    members = entity_profile(spark, idx, 5, "id", n_buckets=4)
    got = {r["id"] for r in members.collect()}
    assert {1, 2, 4, 5} <= got and 7 not in got
