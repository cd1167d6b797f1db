"""tools/project_option4.py — the v5e-8 projection artifact (VERDICT r4 #5).

Pins that the projection is computable from the COMMITTED bench artifacts
(no hand arithmetic), that every named assumption is present in the output,
and that the model arithmetic matches an independent recomputation.
"""

import json
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import project_option4 as po  # noqa: E402


def test_load_bench_newest_complete():
    vals = po.load_bench()
    # r3's artifact is rc=124 (empty tail) — the loader must skip it and land
    # on a round that carries all three stages
    assert {"base_fps", "tsr_s", "vsr_s"} <= set(vals)
    assert vals["artifact"].startswith("BENCH_r")
    assert vals["base_fps"] > 0 and vals["tsr_s"] > 0 and vals["vsr_s"] > 0


@pytest.mark.parametrize("preset", list(po.PRESETS))
def test_projection_arithmetic(preset):
    vals = {"base_fps": 2.0, "tsr_s": 50.0, "vsr_s": 100.0, "vsr_tail_s": 90.0}
    out = po.project(vals, dp=8, preset=preset)
    eff_base, eff_tsr, host_s = po.PRESETS[preset]
    expect = (
        (po.BASE_FRAMES / 2.0) / (8 * eff_base)
        + 50.0 / (8 * eff_tsr)
        + 100.0  # max(window, tail): all windows concurrent (A1)
        + host_s
    )
    assert out["option4_v5e8_projection_s"] == pytest.approx(expect, abs=0.11)
    # every named assumption must appear
    for a in ("A1_window_dp_zero_collectives", "A2_per_chip_flops_le_1_over_dp",
              "A3_sharded_stage_efficiency", "A4_host_overhead_s"):
        assert a in out["assumptions"]


def test_vsr_wall_is_max_of_window_and_tail():
    vals = {"base_fps": 2.0, "tsr_s": 50.0, "vsr_s": 80.0, "vsr_tail_s": 95.0}
    out = po.project(vals, preset="conservative")
    assert out["terms_s"]["vsr_window_wall"] == 95.0


def test_cli_runs_against_committed_artifacts():
    """One command emits the number the README quotes."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "project_option4.py"),
         "--json"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "option4_v5e8_projection_s" in out
    assert out["conservative"]["option4_v5e8_projection_s"] >= \
        out["conservative"]["terms_s"]["vsr_window_wall"]
