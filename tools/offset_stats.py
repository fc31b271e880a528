#!/usr/bin/env python
"""Measure the learned DCN offset ranges of a trained checkpoint.

Decides whether the gather-free dense-shift DCN (``impl='dense'``) is exact
for a given ``shift_bound``: runs the encoder on representative clips with
flax intermediate capture, converts every ``conv_offset_mask`` output to
per-tap sample displacements, and reports ``dcn_shift_stats`` (max |shift|
incl. the tap) per DCN site and globally.

Usage:
  python tools/offset_stats.py -opt configs/train_synthetic.yml \
      [--step N] [--platform cpu] [--size 64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--size", type=int, default=64, help="LR clip size")
    ap.add_argument("--quantile", type=float, default=0.9999)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from stif_tpu.data.synthetic import render_sequence
    from stif_tpu.data.native import host_imresize
    from stif_tpu.models.factory import define_g
    from stif_tpu.ops.deform_conv import split_offset_mask
    from stif_tpu.train.checkpoints import CheckpointManager
    from stif_tpu.train.trainer import TrainConfig, create_train_state
    from stif_tpu.utils.config import parse_options

    opt = parse_options(args.opt, is_train=False)
    assert opt["network_G"]["which_model_G"] == "LIIF", "flagship only"
    from stif_tpu.models import LunaTokis

    netg = opt["network_G"]
    kwargs = dict(nf=netg.get("nf", 64), nframes=netg.get("nframes", 6),
                  groups=netg.get("groups", 8),
                  front_RBs=netg.get("front_RBs", 5),
                  back_RBs=netg.get("back_RBs", 40))
    net = LunaTokis(lstm_unroll=True, **kwargs)  # python-loop LSTM: eager
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(
            lambda: net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 2, 16, 16, 3)),
                             jnp.asarray([0.5]), method=net.full_init))()
    mgr = CheckpointManager((opt.get("path") or {}).get("models"))
    state, _ = create_train_state(params, TrainConfig())
    state = mgr.restore(state, args.step)
    params = state.params
    print(f"restored step {int(state.step)}", file=sys.stderr)

    g = args.size * 4
    hr = render_sequence(990_100, 9, (g, g))
    lr = host_imresize(np.stack([hr[0], hr[8]]), 0.25)
    x = jnp.asarray(lr[None])

    # eager instrumentation: wrap the DCN entry point; every call records
    # the max/quantile sample displacement (dcn_shift_stats semantics)
    import stif_tpu.nn.dcn as dcn_mod
    from stif_tpu.ops.deform_conv import deform_conv2d

    rows = []

    def recorder(x_, offset, mask, weight, bias=None, **kw):
        off = np.asarray(offset)  # (B, H, W, G, K, 2)
        K = off.shape[-2]
        kh = int(round(K ** 0.5))
        ti = (np.arange(kh) - kh // 2).repeat(kh).astype(np.float32)
        tj = np.tile(np.arange(kh) - kh // 2, kh).astype(np.float32)
        d = np.maximum(np.abs(off[..., 0] + ti), np.abs(off[..., 1] + tj))
        # tap spread per (pixel, group): the statistic that sizes the
        # windowed tap-clustered gather (ops/deform_conv impl='window') —
        # max over taps minus min over taps of the sample position, per axis
        py = off[..., 0] + ti  # (B, H, W, G, K)
        px = off[..., 1] + tj
        sp = np.maximum(py.max(-1) - py.min(-1), px.max(-1) - px.min(-1))
        rows.append({
            "site": f"call{len(rows):02d}_H{x_.shape[1]}xW{x_.shape[2]}",
            "max_shift": round(float(d.max()) + 1.0, 2),
            f"q{args.quantile}": round(
                float(np.quantile(d, args.quantile)) + 1.0, 2),
            "tap_spread_max": round(float(sp.max()), 2),
            "tap_spread_q999": round(float(np.quantile(sp, 0.999)), 2),
            "tap_spread_q99": round(float(np.quantile(sp, 0.99)), 2),
            "tap_spread_med": round(float(np.median(sp)), 2),
        })
        return deform_conv2d(x_, offset, mask, weight, bias, **kw)

    orig = dcn_mod.deform_conv2d
    dcn_mod.deform_conv2d = recorder
    try:
        net.apply(params, x, method=net.gen_feat)
    finally:
        dcn_mod.deform_conv2d = orig

    gmax = max(r["max_shift"] for r in rows)
    out = {
        "checkpoint_step": int(state.step),
        "n_dcn_sites": len(rows),
        "global_max_shift": round(gmax, 2),
        "dense_ok_bound": int(np.ceil(gmax)),
        "sites": sorted(rows, key=lambda r: -r["max_shift"]),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
