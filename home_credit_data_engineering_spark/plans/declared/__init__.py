"""Declared queries, grouped by family. Importing this package populates
:data:`home_credit_data_engineering_spark.plans.registry.REGISTRY`."""

from home_credit_data_engineering_spark.plans.declared import (  # noqa: F401
    cluster,
    combos,
    core,
    corpus_prep,
    dedup,
    evaluate,
    events,
    graph,
    io_roundtrip,
    medallion,
    multimodal,
    packed,
    relational_ext,
    retrieval,
    similarity,
    sketches,
    stats_timeseries,
    text,
    text2,
    text3,
    tpch_classics,
    tpch_extra,
    tpch_full,
    tpch_more,
)
