"""CI-shape stress gate: bit-exact float stability under varied configs.

``scripts/driver_sim_stress.py`` proves the _stable.py discipline (exact
decimal sums + fixed double formulas) removed accumulation-order
dependence by re-running the driver contract under 6 deliberately
different SparkSessions. The full sweep is a ~5 min pre-submission tool;
this test runs a 2-config / float-sensitive-query subset on every suite
invocation (VERDICT r3 #7) so a regression in the discipline fails CI,
not the next driver round.

Runs as a SUBPROCESS: the sweep builds and stops its own SparkSessions
(different masters/parallelism), which must not touch the suite's shared
session fixture.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Driver-set queries whose hashes depend on float/aggregate discipline:
#: the _stable.py double aggregates, percentile/zscore math, and the r4
#: deterministic sketch/ANN verdicts (seeded randomness + bound checks).
FLOAT_SENSITIVE = (
    "combo_agg_suite",
    "q1_pricing_summary",
    "a1_multi_measure_agg",
    "medallion_risk_profile",
    "combo_timeseries_fill",
    "pandas_grouped_zscore",
    "combo_approx_sketches",
    "combo_ann_approx",
)

#: The two extreme configs of the sweep: minimal parallelism + AQE off
#: (config 0) vs maximal parallelism + tiny scan splits + AQE on
#: (config 3) — the widest spread of accumulation orders per minute.
CI_CONFIGS = "0,3"


@pytest.mark.stress
def test_float_hash_stability_two_extreme_configs():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "driver_sim_stress.py"),
            "--configs",
            CI_CONFIGS,
            sf_dir,
            *FLOAT_SENSITIVE,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"stress subset found hash instability:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
    assert "flaky queries: none" in proc.stdout
