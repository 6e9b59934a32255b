"""tools/: the roofline→constants tuning pipeline (pure python, no jax).

The tool turns ``benchmarks/roofline_kernels.py`` JSONs into the
recommended values for the refill-handoff and rim-continuation schedule
constants (VERDICT r3 #5 / r4 weak-#4); these tests pin its contracts on
synthetic artifacts shaped exactly like the real ones (ADVICE r4: per-file
``n_rays`` for the drift check, exact ``*_n_exit`` counts preferred over
the rounded fractions, and a 'no reference row' verdict instead of a
spurious DRIFT when the shipped (None, 4) row is absent).
"""

import json
import subprocess
import sys
from pathlib import Path

TOOL = str(Path(__file__).resolve().parent.parent
           / "tools" / "tune_from_rooflines.py")


def run_tool(*paths):
    r = subprocess.run([sys.executable, TOOL, *map(str, paths)],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    return r.stdout


def _sim_json(n_rays, with_reference=True):
    d = {"device": "fake", "n_rays": n_rays,
         "simulate_brdf_simple_rays_per_s": 25.0e6,
         "simulate_brdf_rim_fw16_sh2_rays_per_s": 21.5e6,
         "simulate_brdf_rim_fw16_sh2_exit_frac": 0.42572,
         "simulate_brdf_rim_fw16_sh2_n_exit": int(0.4257254 * n_rays)}
    if with_reference:
        d.update({
            "simulate_brdf_rim_fwNone_sh4_rays_per_s": 19.0e6,
            "simulate_brdf_rim_fwNone_sh4_exit_frac": 0.42573,
            "simulate_brdf_rim_fwNone_sh4_n_exit": int(0.4257312 * n_rays)})
    return d


class TestTuneFromRooflines:
    def test_recommends_schedule_on_measured_win(self, tmp_path):
        """>2% faster schedule with in-noise exit drift -> SET verdict,
        using the SIM file's own n_rays even when another artifact in the
        merge carries a different one (ADVICE r4)."""
        base = tmp_path / "base.json"
        sim = tmp_path / "sim.json"
        base.write_text(json.dumps(
            {"device": "fake", "n_rays": 16 * (1 << 20),
             "refill_prod_rays_per_s": 19.0e6,
             "refill_handoff_b4_f0.05_rays_per_s": 20.1e6}))
        sim.write_text(json.dumps(_sim_json(1 << 22)))
        out = run_tool(base, sim)
        assert "SET RIM_CONT_FIRST_WAVE=16, RIM_CONT_SHRINK=2" in out
        assert "SET _REFILL_BUDGET=4, _REFILL_HANDOFF=0.05" in out
        # drift 6e-6 at n=2^22 is far inside the 4-sigma binomial window
        # ONLY against the unrounded counts with the sim file's n_rays
        assert "DRIFT" not in out
        assert out.count("OK") >= 2

    def test_missing_reference_row_is_not_drift(self, tmp_path):
        sim = tmp_path / "sim.json"
        sim.write_text(json.dumps(_sim_json(1 << 22, with_reference=False)))
        out = run_tool(sim)
        assert "no reference row" in out
        assert "DRIFT" not in out
        assert "keep (None, 4)" in out

    def test_no_win_keeps_shipped_constants(self, tmp_path):
        d = _sim_json(1 << 22)
        d["simulate_brdf_rim_fw16_sh2_rays_per_s"] = 19.1e6  # <2% win
        sim = tmp_path / "sim.json"
        sim.write_text(json.dumps(d))
        out = run_tool(sim)
        assert "keep (None, 4)" in out
        assert "SET RIM_CONT" not in out
