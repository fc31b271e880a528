#!/usr/bin/env python
"""Aggregate per-decode-mode eval runs into the round's single EVAL artifact.

The round-4 mandate (VERDICT.md "Next round" #1) asks for one committed
EVAL_r04.json showing t=0 Y-PSNR >= bicubic (35.405 dB on the held-out
split) and t=0.5 >= 29.5 dB, plus the bf16 quality gate (<= 0.01 dB delta).
The finish runbook produces one JSON per decode mode (plain / bf16 /
localensemble / localensemble+self-ensemble — the latter two are
reference-native paths, ``Sakuya_arch_test.py:962-1085``, plus the standard
x8 geometric self-ensemble). This tool merges them: full detail from the
plain run (scale sweep, x16, wide families), a per-mode summary table, the
computed bf16 delta, and an explicit mandate block naming which modes clear
each bar.

Usage:
  python tools/aggregate_eval.py --plain EVAL_r04_plain.json \
      --bf16 EVAL_r04_bf16.json --le EVAL_r04_le.json \
      --le-se EVAL_r04_le_se.json --out EVAL_r04.json
"""

import argparse
import json


def _load(path):
    if not path:
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return None
    except json.JSONDecodeError as e:
        # a truncated/corrupt OPTIONAL eval json (interrupted run) must be
        # skipped like a missing file, not crash the merge (ADVICE r4)
        import sys

        print(f"[aggregate_eval] WARNING: skipping unparseable {path}: {e}",
              file=sys.stderr)
        return None


def _times(rec):
    bt = rec["psnr_y_by_time"]
    st = rec.get("ssim_y_by_time", {})
    return {
        "t0_psnr_y": bt["t0.0"],
        "t05_psnr_y": bt["t0.5"],
        "t0_ssim_y": st.get("t0.0"),
        "t05_ssim_y": st.get("t0.5"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plain", required=True)
    ap.add_argument("--bf16", default=None)
    ap.add_argument("--le", default=None)
    ap.add_argument("--le-se", dest="le_se", default=None)
    # stage-C byte-reduction knob gates (VERDICT r4 #4): measured on the
    # adopted weights; their deltas vs plain decide the bench.py defaults
    ap.add_argument("--stagec-dedup", dest="stagec_dedup", default=None)
    ap.add_argument("--stagec-nearest", dest="stagec_nearest", default=None)
    ap.add_argument("--stagec-fp8", dest="stagec_fp8", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    plain = _load(args.plain)
    if plain is None:
        raise SystemExit(f"plain eval record missing: {args.plain}")
    modes = {"plain": plain}
    for name, path in (("bf16", args.bf16), ("localensemble", args.le),
                       ("localensemble+self_ensemble", args.le_se)):
        rec = _load(path)
        if rec is not None:
            modes[name] = rec

    base = plain.get("baseline_bicubic", {})
    t0_bar = base.get("t0_psnr", 35.405)
    t05_bar = 29.5
    summary = {}
    for name, rec in modes.items():
        row = _times(rec)
        row["clears_t0_vs_bicubic"] = bool(row["t0_psnr_y"] >= t0_bar)
        row["clears_t05"] = bool(row["t05_psnr_y"] >= t05_bar)
        summary[name] = row

    agg = dict(plain)  # full detail: scale sweep, x16, wide families
    agg["decode_modes"] = summary
    headline = max(summary.items(),
                   key=lambda kv: (kv[1]["clears_t0_vs_bicubic"]
                                   and kv[1]["clears_t05"],
                                   kv[1]["t0_psnr_y"] + kv[1]["t05_psnr_y"]))
    agg["headline"] = {
        "mode": headline[0],
        # the headline names the best-SUM mode even when nothing clears the
        # bars; make that unmistakable in the artifact itself (ADVICE r4)
        "clears_mandate": bool(headline[1]["clears_t0_vs_bicubic"]
                               and headline[1]["clears_t05"]),
        **{k: headline[1][k] for k in ("t0_psnr_y", "t05_psnr_y")},
    }
    agg["mandate"] = {
        "t0_target_psnr_y": t0_bar,
        "t05_target_psnr_y": t05_bar,
        "cleared_by": [n for n, r in summary.items()
                       if r["clears_t0_vs_bicubic"] and r["clears_t05"]],
    }
    knob_gates = {}
    for name, path in (("stagec_dedup", args.stagec_dedup),
                       ("stagec_nearest", args.stagec_nearest),
                       ("stagec_fp8", args.stagec_fp8)):
        rec = _load(path)
        if rec is None:
            continue
        row = _times(rec)
        knob_gates[name] = {
            "t0_psnr_y": row["t0_psnr_y"],
            "t05_psnr_y": row["t05_psnr_y"],
            "t0_delta_db": round(row["t0_psnr_y"]
                                 - summary["plain"]["t0_psnr_y"], 4),
            "t05_delta_db": round(row["t05_psnr_y"]
                                  - summary["plain"]["t05_psnr_y"], 4),
        }
    if knob_gates:
        agg["stagec_knob_gates"] = knob_gates
    if "bf16" in summary:
        agg["bf16_gate"] = {
            "t0_delta_db": round(summary["bf16"]["t0_psnr_y"]
                                 - summary["plain"]["t0_psnr_y"], 4),
            "t05_delta_db": round(summary["bf16"]["t05_psnr_y"]
                                  - summary["plain"]["t05_psnr_y"], 4),
            "target_abs_delta_db": 0.01,
        }
    with open(args.out, "w") as f:
        json.dump(agg, f, indent=2)
    print(json.dumps({"headline": agg["headline"],
                      "mandate": agg["mandate"],
                      "bf16_gate": agg.get("bf16_gate"),
                      "stagec_knob_gates": agg.get("stagec_knob_gates")},
                     indent=2))


if __name__ == "__main__":
    main()
