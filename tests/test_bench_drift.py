"""bench.py's per-kernel drift guard.

Round 3's close artifact (BENCH_r03.json) carried an unremarked 3.4x
pair-table deviation; the guard exists so a deviation on any headline
kernel prints a loud DRIFT stderr line instead of sailing into the
round artifact. Mirrors the reference's regression-test discipline
(reference tests/test_cmdline.rs) applied to perf numbers.
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_check_drift_flags_both_directions():
    bench = _bench_module()
    lines = []
    table = {
        "_measured": "2026-08-20",
        "fast_kernel": {"expect": 100.0},
        "slow_kernel": {"expect": 100.0},
        "ok_kernel": {"expect": 100.0},
        "wide_tolerance": {"expect": 100.0, "factor": 3.0},
        "not_measured": {"expect": 5.0},
    }
    measured = {
        "fast_kernel": 200.0,   # 2x up -> drift
        "slow_kernel": 29.0,    # 3.4x down -> drift (the round-3 case)
        "ok_kernel": 120.0,     # within 1.5x
        "wide_tolerance": 250.0,  # 2.5x but factor 3 -> ok
        "unlisted": 1.0,        # no table entry -> ignored
    }
    drifted = bench.check_drift(measured, table, log=lines.append)
    assert sorted(drifted) == ["fast_kernel", "slow_kernel"]
    assert sum("DRIFT:" in ln for ln in lines) == 2
    joined = "\n".join(lines)
    assert "slow_kernel" in joined and "0.29x" in joined


def test_expected_rates_table_parses_and_covers_kernels():
    with open(os.path.join(REPO, "benchmarks", "expected_rates.json")) as f:
        table = json.load(f)
    names = {k for k in table if not k.startswith("_")}
    # The headline + every stderr kernel bench must be guarded.
    for required in (
        "screen_production",
        "screen_matmul_int8",
        "verify_grouped",
        "verify_pairtable",
        "device_sketch",
    ):
        assert required in names, required
    for spec in (table[n] for n in names):
        assert float(spec["expect"]) > 0


def test_drift_clean_when_within_tolerance():
    bench = _bench_module()
    lines = []
    table = {"k": {"expect": 100.0}}
    assert bench.check_drift({"k": 100.0}, table, log=lines.append) == []
    assert not lines
