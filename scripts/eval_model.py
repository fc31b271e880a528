#!/usr/bin/env python
"""End-to-end quality evaluation of a trained checkpoint.

Protocol: the reference's headline ``test_metric_full`` Vid4 recipe
(``codes/myutils.py:463-558``): LR input = every 2nd frame bicubic-downscaled
x4; query times t in {0.5, 0}; Y-channel MATLAB-convention PSNR/SSIM —
plus a bicubic-upsample baseline on the same frames so "beats bicubic" is a
measured statement, not an assumption.

The eval sequences are deterministic procedural scenes
(``stif_tpu.data.synthetic.render_sequence``) rendered to PNG folders —
same distribution family as configs/train_synthetic.yml but disjoint seeds.

Usage:
  python scripts/eval_model.py -opt configs/train_synthetic.yml \
      [--step N] [--gather-dtype bf16] [--out EVAL.json] [--scenes 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_eval_set(root: str, n_scenes: int = 4, n_frames: int = 12,
                   size=(144, 192), seed0: int = 990_000) -> str:
    """Render deterministic eval scenes to <root>/scene<k>/*.png (idempotent).
    Seeds are far outside the training sampler's (seed, index) range."""
    from stif_tpu.data.synthetic import render_eval_folders

    return render_eval_folders(root, n_scenes=n_scenes, n_frames=n_frames,
                               size=size, seed0=seed0)


def frame_hold_x8_baseline(gt_root: str, downscale: float = 0.25) -> dict:
    """x8-temporal naive baseline: hold the nearest input frame (i or i+8),
    bicubic-upsample x4 — per-time-index Y-PSNR, the number the model's
    temporal interpolation must beat at mid times."""
    from stif_tpu.data.native import host_imresize
    from stif_tpu.runtime.eval import _load_frames
    from stif_tpu.utils.metrics import bgr2ycbcr, calculate_psnr

    m = int(round(1 / downscale))
    per_time = [[] for _ in range(8)]
    for name in sorted(os.listdir(gt_root)):
        folder = os.path.join(gt_root, name)
        if not os.path.isdir(folder):
            continue
        gt = _load_frames(folder)
        H = gt.shape[1] - gt.shape[1] % m
        W = gt.shape[2] - gt.shape[2] % m
        gt = gt[:, :H, :W]
        up = host_imresize(host_imresize(gt, downscale), float(m))
        for i in range(0, gt.shape[0] - 8, 8):
            for ti in range(8):
                src = i if ti <= 4 else i + 8
                p = bgr2ycbcr(np.clip(up[src], 0, 1)[..., ::-1]
                              .astype(np.float32))
                r = bgr2ycbcr(gt[i + ti][..., ::-1].astype(np.float32))
                per_time[ti].append(calculate_psnr(p * 255, r * 255))
    pt = [float(np.mean(v)) for v in per_time if v]
    return {"per_time_psnr": pt,
            "mean_psnr": float(np.mean([x for v in per_time for x in v]))}


def bicubic_baseline(gt_root: str, downscale: float = 0.25,
                     folders=None) -> dict:
    """PSNR/SSIM of MATLAB-bicubic x4 upsampling of the LR inputs (t=0) and
    of frame-hold for t=0.5 — what the model must beat."""
    from stif_tpu.data.native import host_imresize
    from stif_tpu.runtime.eval import _load_frames
    from stif_tpu.utils.metrics import bgr2ycbcr, calculate_psnr, calculate_ssim

    res = {"t0_psnr": [], "t0_ssim": [], "t05_psnr": [], "t05_ssim": []}
    m = int(round(1 / downscale))
    for name in folders or sorted(os.listdir(gt_root)):
        folder = os.path.join(gt_root, name)
        if not os.path.isdir(folder):
            continue
        gt = _load_frames(folder)
        H = gt.shape[1] - gt.shape[1] % (m * 2)
        W = gt.shape[2] - gt.shape[2] % (m * 2)
        gt = gt[:, :H, :W]
        lr = host_imresize(gt, downscale)
        up = host_imresize(lr, float(m))  # bicubic x4 back up
        inputs_idx = list(range(0, gt.shape[0], 2))
        for j, gi in enumerate(inputs_idx[:-1]):
            pred0 = np.clip(up[gi], 0, 1)
            ref0 = gt[gi]
            y_p = bgr2ycbcr(pred0[..., ::-1].astype(np.float32))
            y_r = bgr2ycbcr(ref0[..., ::-1].astype(np.float32))
            res["t0_psnr"].append(calculate_psnr(y_p * 255, y_r * 255))
            res["t0_ssim"].append(calculate_ssim(y_p * 255, y_r * 255))
            if gi + 1 < gt.shape[0]:  # t=0.5: hold the nearest input frame
                y_p = bgr2ycbcr(pred0[..., ::-1].astype(np.float32))
                y_r = bgr2ycbcr(gt[gi + 1][..., ::-1].astype(np.float32))
                res["t05_psnr"].append(calculate_psnr(y_p * 255, y_r * 255))
                res["t05_ssim"].append(calculate_ssim(y_p * 255, y_r * 255))
    return {k: float(np.mean(v)) for k, v in res.items()}


def eval_scale_sweep(net, params, gt_root, scales=(2, 3, 8),
                     device=None) -> dict:
    """Arbitrary SPATIAL scale — the reference's headline capability
    (int-scale decode ``Sakuya_arch_test.py:461-514``; the x16 protocol
    ``myutils.py:941-1077`` generalizes to any s): LR = MATLAB-bicubic
    1/s of GT, the SAME trained weights decode x s back to native GT
    resolution, Y-PSNR/SSIM at t in {0, 0.5} (every-2nd-frame input pairs,
    Vid4-recipe convention), vs the bicubic-x-s baseline."""
    from stif_tpu.data.native import host_imresize
    from stif_tpu.runtime import InferencePipeline
    from stif_tpu.runtime.eval import _load_frames
    from stif_tpu.utils.metrics import (bgr2ycbcr, calculate_psnr,
                                        calculate_ssim)

    def ym(pred, ref):
        p = bgr2ycbcr(np.clip(pred, 0, 1)[..., ::-1].astype(np.float32))
        r = bgr2ycbcr(ref[..., ::-1].astype(np.float32))
        return (calculate_psnr(p * 255, r * 255),
                calculate_ssim(p * 255, r * 255))

    out = {}
    for s in scales:
        pipe = InferencePipeline(net, params, scale=int(s), bucket=4,
                                 device=device)
        acc = {"t0_psnr": [], "t0_ssim": [], "t05_psnr": [], "t05_ssim": [],
               "bi_t0_psnr": [], "bi_t0_ssim": []}
        for name in sorted(os.listdir(gt_root)):
            folder = os.path.join(gt_root, name)
            if not os.path.isdir(folder):
                continue
            gt = _load_frames(folder)
            H = gt.shape[1] - gt.shape[1] % (2 * s)
            W = gt.shape[2] - gt.shape[2] % (2 * s)
            gt = gt[:, :H, :W]
            lr = host_imresize(gt, 1.0 / s)
            up = host_imresize(lr, float(s))
            idx = list(range(0, gt.shape[0], 2))
            for j, gi in enumerate(idx[:-1]):
                pred = pipe.render_window(
                    np.stack([lr[gi], lr[gi + 2]]), [0.0, 0.5])
                p0, s0 = ym(pred[0], gt[gi])
                acc["t0_psnr"].append(p0)
                acc["t0_ssim"].append(s0)
                if gi + 1 < gt.shape[0]:
                    p5, s5 = ym(pred[1], gt[gi + 1])
                    acc["t05_psnr"].append(p5)
                    acc["t05_ssim"].append(s5)
                bp, bs_ = ym(up[gi], gt[gi])
                acc["bi_t0_psnr"].append(bp)
                acc["bi_t0_ssim"].append(bs_)
        out[f"x{s}"] = {k: round(float(np.mean(v)), 3)
                        for k, v in acc.items() if v}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--best", action="store_true",
                    help="load the keep-best weights (best.json) instead of "
                         "the latest full checkpoint")
    ap.add_argument("--pth", default=None,
                    help="load weights from a reference-schema .pth export")
    ap.add_argument("--gather-dtype", default=None, choices=[None, "bf16"])
    ap.add_argument("--mlp-dtype", default=None, choices=[None, "bf16"])
    ap.add_argument("--stagec-nearest", action="store_true",
                    help="quality-gate knob: nearest gather for the wide "
                         "stage-C feat component (LunaTokis.stagec_nearest)")
    ap.add_argument("--stagec-dedup", action="store_true",
                    help="quality-gate knob: time-axis dedup of the stage-C "
                         "LR gather (bit-exact; memory-shape change only)")
    ap.add_argument("--stagec-dtype", default=None,
                    choices=[None, "fp8", "bf16"],
                    help="quality-gate knob: storage dtype for decoder "
                         "bilinear-gather sources (fp32 interpolation)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--eval-root", default="runs/eval_data")
    ap.add_argument("--scale-sweep", default="2,3,8",
                    help="comma list of extra spatial scales ('' disables)")
    ap.add_argument("--x16", action="store_true",
                    help="also run the x16 adobe_4x/liif4x protocols")
    ap.add_argument("--self-ensemble", action="store_true",
                    help="x8 geometric self-ensemble (beyond-parity optional "
                         "mode; 8x decode compute)")
    ap.add_argument("--local-ensemble", action="store_true",
                    help="decode via decoding_localensemble (4 shifted "
                         "area-weighted passes, Sakuya_arch_test.py:962)")
    ap.add_argument("--test-mode", action="store_true",
                    help="decode via decoding_test (hr-input upsample, the "
                         "reference test_metric_full variant)")
    ap.add_argument("--wide", action="store_true",
                    help="also evaluate the widened 3-family suite "
                         "(default/occlusion/lighting, 4 scenes each) with "
                         "per-family mean/std and bicubic baselines")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from stif_tpu.models.factory import define_g
    from stif_tpu.runtime import InferencePipeline
    from stif_tpu.runtime.eval import eval_space_time_sr
    from stif_tpu.train.checkpoints import CheckpointManager
    from stif_tpu.utils.config import parse_options

    opt = parse_options(args.opt, is_train=False)
    if args.gather_dtype == "bf16":
        opt["network_G"]["gather_dtype"] = "bf16"
    if args.mlp_dtype == "bf16":
        opt["network_G"]["mlp_dtype"] = "bf16"
    if args.stagec_nearest:
        opt["network_G"]["stagec_nearest"] = True
    if args.stagec_dedup:
        opt["network_G"]["stagec_dedup"] = True
    if args.stagec_dtype:
        opt["network_G"]["stagec_dtype"] = args.stagec_dtype
    net = define_g(opt)

    # abstract params (minimal-shape jitted init on CPU), then restore
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.zeros((1, 2, 16, 16, 3))
        t0 = jnp.asarray([0.5])
        params = jax.jit(
            lambda: net.init(jax.random.PRNGKey(0), x0, t0,
                             method=net.full_init))()

    ckpt_dir = (opt.get("path") or {}).get("models")
    if args.pth:
        from stif_tpu.convert import load_pth_checkpoint

        params = load_pth_checkpoint(args.pth, params)
        ckpt_step = args.step or -1
        weights_src = args.pth
        print(f"loaded weights from {args.pth}")
    elif args.best:
        from stif_tpu.train.validation import load_best_params

        params, best = load_best_params(ckpt_dir, params)
        ckpt_step = int(best["step"])
        weights_src = os.path.join(ckpt_dir, f"params_best_{ckpt_step}")
        print(f"loaded keep-best step {ckpt_step} "
              f"(dev score {best['score']}) from {ckpt_dir}")
    else:
        mgr = CheckpointManager(ckpt_dir)
        step = args.step if args.step is not None else mgr.latest_step()
        from stif_tpu.train.trainer import TrainConfig, create_train_state

        state, _ = create_train_state(params, TrainConfig())
        state = mgr.restore(state, step)
        params = state.params
        ckpt_step = int(state.step)
        weights_src = ckpt_dir
        print(f"restored step {ckpt_step} from {ckpt_dir}")

    gt_root = build_eval_set(args.eval_root, n_scenes=args.scenes)
    baseline = bicubic_baseline(gt_root)

    pipe = InferencePipeline(net, jax.device_put(params, jax.devices()[0]),
                             scale=4, bucket=8,
                             test_mode=args.test_mode,
                             local_ensemble=args.local_ensemble,
                             self_ensemble=args.self_ensemble)
    t0 = time.time()
    res = eval_space_time_sr(pipe, gt_root, times=(0.5, 0.0))
    wall = time.time() - t0

    from stif_tpu.runtime.eval import eval_temporal_x8

    res_x8 = eval_temporal_x8(pipe, gt_root)
    hold = frame_hold_x8_baseline(gt_root)

    scale_sweep = None
    if args.scale_sweep:
        scales = [int(s) for s in args.scale_sweep.split(",") if s]
        scale_sweep = eval_scale_sweep(net, pipe.params, gt_root,
                                       scales=scales,
                                       device=jax.devices()[0])

    x16 = None
    if args.x16:
        from stif_tpu.data.native import host_imresize
        from stif_tpu.runtime.eval import (_load_frames, eval_adobe_4x,
                                           eval_adobe_liif4x)
        from stif_tpu.utils.metrics import calculate_psnr

        pipe16 = InferencePipeline(net, pipe.params, scale=16, bucket=4,
                                   device=jax.devices()[0])
        r4 = eval_adobe_4x(pipe16, gt_root)
        rl = eval_adobe_liif4x(pipe16, gt_root)
        # bicubic x16 baseline under the adobe_4x crop/metric conventions
        bi = []
        for name in sorted(os.listdir(gt_root)):
            folder = os.path.join(gt_root, name)
            if not os.path.isdir(folder):
                continue
            gt = _load_frames(folder)
            H = gt.shape[1] - gt.shape[1] % 64
            W = gt.shape[2] - gt.shape[2] % 64
            gt = gt[:, :H, :W]
            up = host_imresize(host_imresize(gt, 1 / 16), 16.0)
            for i in range(0, gt.shape[0] - 4, 4):
                bi.append(calculate_psnr(np.clip(up[i], 0, 1) * 255,
                                         gt[i] * 255))
        x16 = {
            "adobe_4x_mean_psnr_rgb": round(r4.mean_psnr, 3),
            "adobe_4x_mean_ssim_rgb": round(r4.mean_ssim, 4),
            "adobe_liif4x_mean_psnr_y": round(rl.mean_psnr, 3),
            "adobe_liif4x_mean_ssim_y": round(rl.mean_ssim, 4),
            "bicubic_x16_t0_psnr_rgb": round(float(np.mean(bi)), 3),
        }

    wide = None
    if args.wide:
        from stif_tpu.data.synthetic import render_eval_suite

        from stif_tpu.data.natural import (build_natural_eval_set,
                                           build_natural_eval_set_v2)

        suite_root = render_eval_suite("runs/eval_suite")
        # natural-photo families (real image statistics; gated on bundled
        # photos being present): v1 = integer-pan (kept for round-4
        # continuity), v2 = layered subpixel motion + occluding layers,
        # >=8 scenes so the per-family std is usable for gating
        # (VERDICT r4 #5)
        nat_names = build_natural_eval_set(suite_root)
        nat2_names = build_natural_eval_set_v2(suite_root)
        fams = ("default", "occlusion", "lighting") + (
            ("natural",) if nat_names else ())
        if nat2_names:
            fams = fams + ("naturalv2",)
        wide = {}
        for fam in fams:
            # prefix match, but 'natural' must not swallow 'naturalv2_*'
            folders = sorted(
                d for d in os.listdir(suite_root)
                if d.startswith(fam)
                and not (fam == "natural" and d.startswith("naturalv2"))
                and os.path.isdir(os.path.join(suite_root, d)))
            r = eval_space_time_sr(pipe, suite_root, folders=folders,
                                   times=(0.5, 0.0))
            bi = bicubic_baseline(suite_root, folders=folders)
            pvals = list(r.psnr.values())
            wide[fam] = {
                "scenes_psnr_y": {k: round(v, 3) for k, v in r.psnr.items()},
                "mean_psnr_y": round(r.mean_psnr, 3),
                "std_psnr_y": round(float(np.std(pvals)), 3),
                "mean_ssim_y": round(r.mean_ssim, 4),
                "psnr_y_by_time": {f"t{t}": round(v, 3)
                                   for t, v in r.psnr_by_time.items()},
                "ssim_y_by_time": {f"t{t}": round(v, 4)
                                   for t, v in r.ssim_by_time.items()},
                "baseline_bicubic": {k: round(v, 3) for k, v in bi.items()},
            }

    from stif_tpu.utils.provenance import stamp

    rec = {
        "protocol": "vid4_space_time_x4 (myutils.test_metric_full)",
        "provenance": stamp(weights=weights_src, step=ckpt_step,
                            config=args.opt),
        "checkpoint_step": ckpt_step,
        "gather_dtype": args.gather_dtype or "fp32",
        "mlp_dtype": args.mlp_dtype or "fp32",
        "stagec": {"nearest": args.stagec_nearest,
                   "dedup": args.stagec_dedup,
                   "dtype": args.stagec_dtype or "inherit"},
        "decode_mode": ("localensemble" if args.local_ensemble else
                        "test" if args.test_mode else "decoding")
                       + ("+self_ensemble" if args.self_ensemble else ""),
        "rgb_skip": ("bicubic" if getattr(net, "rgb_skip_bicubic", False)
                     else bool(getattr(net, "rgb_skip", False))),
        "psnr_y": {k: round(v, 3) for k, v in res.psnr.items()},
        "ssim_y": {k: round(v, 4) for k, v in res.ssim.items()},
        "mean_psnr_y": round(res.mean_psnr, 3),
        "mean_ssim_y": round(res.mean_ssim, 4),
        "psnr_y_by_time": {f"t{t}": round(v, 3)
                           for t, v in res.psnr_by_time.items()},
        "ssim_y_by_time": {f"t{t}": round(v, 4)
                           for t, v in res.ssim_by_time.items()},
        "avg_window_time_s": round(res.avg_time_s, 3),
        "wall_s": round(wall, 1),
        "baseline_bicubic": {k: round(v, 3) for k, v in baseline.items()},
        "x8_temporal": {
            "mean_psnr_y": round(res_x8.mean_psnr, 3),
            "per_time_psnr_y": [round(v, 2) for v in res_x8.per_time_psnr],
            "baseline_frame_hold": {
                "mean_psnr_y": round(hold["mean_psnr"], 3),
                "per_time_psnr_y": [round(v, 2)
                                    for v in hold["per_time_psnr"]],
            },
        },
    }
    if scale_sweep:
        rec["scale_sweep"] = scale_sweep
    if x16:
        rec["x16_protocols"] = x16
    if wide:
        rec["wide_suite"] = wide
    print(json.dumps(rec, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
