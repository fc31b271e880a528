"""tools/aggregate_eval.py — the round's mandate-bearing EVAL artifact.

Fast tier (pure-python tool, no jax): the per-decode-mode merge must pick
the right headline, compute the bf16 gate deltas, and name exactly the
modes that clear both quality bars.
"""

import json
import subprocess
import sys
from pathlib import Path

TOOL = Path(__file__).resolve().parents[1] / "tools" / "aggregate_eval.py"


def _rec(t0, t05, extra=None):
    rec = {
        "protocol": "vid4_space_time_x4",
        "psnr_y_by_time": {"t0.0": t0, "t0.5": t05},
        "ssim_y_by_time": {"t0.0": 0.9, "t0.5": 0.7},
        "baseline_bicubic": {"t0_psnr": 35.405, "t0_ssim": 0.899,
                             "t05_psnr": 28.158, "t05_ssim": 0.692},
    }
    rec.update(extra or {})
    return rec


def test_aggregate(tmp_path):
    paths = {}
    cases = {
        "plain": _rec(35.1, 29.8, {"scale_sweep": {"x2": {}}}),
        "bf16": _rec(35.104, 29.797),
        "le": _rec(35.3, 30.0),
        "le_se": _rec(36.0, 30.2),
    }
    for name, rec in cases.items():
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(rec))
        paths[name] = str(p)
    out = tmp_path / "agg.json"
    subprocess.run(
        [sys.executable, str(TOOL), "--plain", paths["plain"],
         "--bf16", paths["bf16"], "--le", paths["le"],
         "--le-se", paths["le_se"], "--out", str(out)],
        check=True, capture_output=True)
    agg = json.loads(out.read_text())

    # full detail from the plain run is preserved
    assert "scale_sweep" in agg
    # headline = the only mode clearing both bars
    assert agg["headline"]["mode"] == "localensemble+self_ensemble"
    assert agg["mandate"]["cleared_by"] == ["localensemble+self_ensemble"]
    # per-mode table with both verdicts
    m = agg["decode_modes"]
    assert set(m) == {"plain", "bf16", "localensemble",
                      "localensemble+self_ensemble"}
    assert not m["plain"]["clears_t0_vs_bicubic"]
    assert m["plain"]["clears_t05"]
    # bf16 gate deltas vs plain
    assert abs(agg["bf16_gate"]["t0_delta_db"] - 0.004) < 1e-9
    assert abs(agg["bf16_gate"]["t05_delta_db"] - (-0.003)) < 1e-9


def test_aggregate_missing_optional(tmp_path):
    p = tmp_path / "plain.json"
    p.write_text(json.dumps(_rec(35.5, 29.6)))
    out = tmp_path / "agg.json"
    subprocess.run(
        [sys.executable, str(TOOL), "--plain", str(p),
         "--bf16", str(tmp_path / "missing.json"), "--out", str(out)],
        check=True, capture_output=True)
    agg = json.loads(out.read_text())
    assert agg["headline"]["mode"] == "plain"
    assert agg["mandate"]["cleared_by"] == ["plain"]
    assert "bf16_gate" not in agg


def test_headline_clears_mandate_flag(tmp_path):
    # nothing clears both bars: headline still names the best-sum mode but
    # must say so via clears_mandate=False (ADVICE r4); corrupt optional
    # inputs are skipped, not fatal
    p = tmp_path / "plain.json"
    p.write_text(json.dumps(_rec(35.0, 29.0)))
    bad = tmp_path / "bf16.json"
    bad.write_text("{truncated")
    out = tmp_path / "agg.json"
    r = subprocess.run(
        [sys.executable, str(TOOL), "--plain", str(p),
         "--bf16", str(bad), "--out", str(out)],
        check=True, capture_output=True, text=True)
    assert "skipping unparseable" in r.stderr
    agg = json.loads(out.read_text())
    assert agg["headline"]["clears_mandate"] is False
    assert agg["mandate"]["cleared_by"] == []
    assert set(agg["decode_modes"]) == {"plain"}
