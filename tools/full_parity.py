#!/usr/bin/env python
"""Full-config numerical parity artifact (VERDICT r2 "Missing #4").

The pytest parity oracles pin toy shapes (nf=16, 8x8,
``tests/test_model_parity.py``); the deployed config is nf=64 with 5/40
residual blocks at real frame sizes (``codes/custom_video_test.py:35``).
This one-off runs the flagship JAX model against the independent torch
mirror with shared weights AT THE DEPLOYED CONFIG and a real input size,
and writes max|delta| / PSNR-of-difference to ``PARITY_FULL.json``.

Runs on CPU (fp32 — the TPU's bf16 matmul default would obscure the
comparison). Expect several minutes.

Usage: python tools/full_parity.py [--h 96] [--w 160] [--out PARITY_FULL.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--w", type=int, default=160)
    ap.add_argument("--times", type=int, default=3)
    ap.add_argument("--out", default="PARITY_FULL.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    import torch_mirror
    from stif_tpu.models import LunaTokis

    torch.set_num_threads(os.cpu_count() or 8)
    cfg = dict(nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40)
    model = LunaTokis(**cfg)
    rng = np.random.default_rng(7)
    xn = rng.random((1, 2, args.h, args.w, 3)).astype(np.float32)
    tn = np.linspace(0.0, 1.0, args.times).astype(np.float32)

    t0 = time.time()
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(xn),
                           jnp.asarray(tn), method=model.full_init))()
    mirror = torch_mirror.LunaTokis(**cfg)
    torch_mirror.load_flax_params(mirror, params)
    mirror.eval()
    t_init = time.time() - t0

    rec = {"config": cfg, "input_hw": [args.h, args.w],
           "n_times": args.times, "backend": "cpu fp32"}

    xt = torch.from_numpy(
        np.ascontiguousarray(xn[0].transpose(0, 3, 1, 2)))[None]

    # encoder once on each side; compare features at full config
    t0 = time.time()
    feat = model.apply(params, jnp.asarray(xn), method=model.gen_feat)
    t_jax_enc = time.time() - t0
    t0 = time.time()
    with torch.no_grad():
        mirror.gen_feat(xt)
    t_torch_enc = time.time() - t0
    feat_ref = mirror.feat.numpy().transpose(0, 1, 3, 4, 2)
    d = np.abs(np.asarray(feat) - feat_ref)
    rec["gen_feat"] = {
        "max_abs_delta": float(d.max()),
        "mean_abs_delta": float(d.mean()),
        "feat_abs_mean": float(np.abs(feat_ref).mean()),
        "jax_s": round(t_jax_enc, 1), "torch_s": round(t_torch_enc, 1),
    }
    print("gen_feat", rec["gen_feat"], flush=True)

    for name, kw, mkw in (
        ("decoding", dict(hr_inp_upsample=False),
         dict(scale=None, test=False)),
        ("decoding_test", dict(hr_inp_upsample=True),
         dict(scale=4, test=True)),
    ):
        t0 = time.time()
        out = model.apply(params, feat, jnp.asarray(xn), jnp.asarray(tn),
                          method=model.decode, **kw)
        out = np.asarray(out)  # (nt, B, 4H, 4W, 3)
        t_jax = time.time() - t0
        t0 = time.time()
        with torch.no_grad():
            ref = mirror.decoding([torch.tensor(t) for t in tn], **mkw)
        ref = np.stack([r.numpy() for r in ref])  # (nt, B, 3, 4H, 4W)
        t_torch = time.time() - t0
        ref = ref.transpose(0, 1, 3, 4, 2)
        d = np.abs(out - ref)
        mse = float((d ** 2).mean())
        rec[name] = {
            "max_abs_delta": float(d.max()),
            "mean_abs_delta": float(d.mean()),
            "psnr_of_difference_db": round(
                10 * np.log10(1.0 / max(mse, 1e-30)), 2),
            "jax_s": round(t_jax, 1), "torch_s": round(t_torch, 1),
        }
        print(name, rec[name], flush=True)

    rec["init_s"] = round(t_init, 1)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
