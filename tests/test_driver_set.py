"""Driver-set curation invariants.

The driver's correctness gate records rows for the first ~50 ``queries()``
entries only, so ``registry.DRIVER_SET`` curates 50 slots that must cover
EVERY operator tag the full registry declares (combo queries pack whole
families into single slots). These tests keep that guarantee honest as
queries are added: a new registry tag without driver-set representation
fails here, before a round ships.
"""

from __future__ import annotations

import home_credit_data_engineering_spark.plans.declared  # noqa: F401
from home_credit_data_engineering_spark.plans.registry import (
    DRIVER_SET,
    REGISTRY,
    driver_oracles,
    driver_queries,
)

DRIVER_CAP = 50


def test_driver_set_within_cap_and_registered():
    assert len(DRIVER_SET) <= DRIVER_CAP
    assert len(set(DRIVER_SET)) == len(DRIVER_SET), "duplicate driver slots"
    unregistered = [n for n in DRIVER_SET if n not in REGISTRY]
    assert not unregistered, f"driver slots not in REGISTRY: {unregistered}"


def test_driver_set_covers_every_operator_tag():
    driver_tags: set[str] = set()
    for name in DRIVER_SET:
        driver_tags.update(REGISTRY[name].operators)
    all_tags: set[str] = set()
    for q in REGISTRY.values():
        all_tags.update(q.operators)
    # "tpch:qN" tags are benchmark-showcase labels, not operator families
    # — every OPERATOR tag such a query carries (joins, aggregates,
    # predicates) must still be driver-covered, but the label itself need
    # not occupy one of the 50 slots.
    uncovered = sorted(
        t for t in (all_tags - driver_tags) if not t.startswith("tpch:")
    )
    assert not uncovered, (
        f"operator tags with no driver-set representative: {uncovered} — "
        "add the tag to a driver-set query that genuinely certifies it, "
        "or add a combo slot"
    )


def test_driver_contract_dicts_follow_driver_set():
    qs = driver_queries()
    assert list(qs) == list(DRIVER_SET)  # insertion order IS driver order
    oracles = driver_oracles()
    assert set(oracles) <= set(qs)
    # Every driver slot is oracle-backed as of r4: the two genuinely
    # approximate slots (combo_approx_sketches, combo_ann_approx) emit
    # deterministic bound/recall VERDICTS whose expected values the
    # oracle computes, even though the underlying estimates are
    # engine-specific.
    no_oracle = [n for n in qs if n not in oracles]
    assert no_oracle == []


def test_most_driver_slots_are_oracle_backed():
    oracle_backed = sum(1 for n in DRIVER_SET if REGISTRY[n].oracle)
    assert oracle_backed == len(DRIVER_SET) == 50


def test_driver_set_schemas_are_scalar_only(spark, sf_dir):
    """No driver slot may emit array/map/struct columns.

    The driver's canonicalizer sorts result frames with a raw pandas
    ``sort_values`` over every column; a list-valued cell is unhashable
    and hard-errors the slot (r4's ``text_quality_filter`` red row). This
    gate builds every DRIVER_SET plan (schema only — nothing executes)
    and rejects complex output types before they can ship.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    from home_credit_data_engineering_spark.plans.registry import prep

    offenders = []
    prepped = prep(spark)
    for name in DRIVER_SET:
        df = REGISTRY[name].build(prepped, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(
                    f"{name}.{field.name}: {field.dataType.simpleString()}"
                )
    assert not offenders, (
        "driver-set queries must emit scalar columns only (the driver "
        f"canonicalizer cannot sort complex values): {offenders}"
    )


def test_doc_counts_match_registry():
    """README / COVERAGE / entry docstring registry counts must track
    len(REGISTRY): a query added without a doc sync fails here (VERDICT
    r10 #6 — count drift shipped in earlier rounds)."""
    import os
    import re

    n = len(REGISTRY)
    o = sum(1 for q in REGISTRY.values() if q.oracle)
    root = os.path.join(os.path.dirname(__file__), os.pardir)
    checks = [
        (
            "README.md",
            rf"declares {n} queries \({o} with ANSI-SQL DuckDB oracles\)",
        ),
        ("__spark_entry__.py", rf"covers the FULL {n}-query registry"),
        ("__spark_entry__.py", rf"FULL registry \({n} queries, {o} oracled\)"),
        (
            os.path.join("docs", "COVERAGE.md"),
            rf"the full registry \({n} queries as of r\d+, {o} with oracles\)",
        ),
    ]
    for fname, pat in checks:
        with open(os.path.join(root, fname), encoding="utf-8") as fh:
            text = fh.read()
        assert re.search(pat, text), (
            f"{fname}: no match for /{pat}/ — registry now declares "
            f"{n} queries ({o} oracled); re-sync the doc counts"
        )
