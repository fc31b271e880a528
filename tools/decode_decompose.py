#!/usr/bin/env python
"""Decompose the decode-stage cost at the bench shape.

After the round-4 flat-gather work the encoder dropped to ~0.40 s and the
DECODER is now the largest stage (0.589 s, BENCH_TRIAL_r04.json) while its
MLP FLOPs (~1 TF/window) would take <6 ms on the MXU — so ~99% of decode
time is NOT matmul. This tool times each decode sub-stage as its own jitted
program at the exact bench shape (LR 96x160 -> x4, nt=8, B=1, Q=245,760
queries, nt*B=8 query sets) so the next optimization targets the real sink:

  stageA_nearest — ONE fused nearest gather of the 200-ch LR field stack
  stageB_bilinear— fused bilinear gather of (feat, hr_inp) at LR res
  feat_imnet     — SIREN 201->64 over nt*B x Q rows (the HR field)
  flow_imnet     — SIREN 263->4 over nt*B x Q rows
  warp_grids     — flow -> two clipped warp grids
  stageC_hr      — 2 bilinear gathers from the HR field (8,384,640,64)
  stageC_lr      — 2 fused bilinear gathers from the 198-ch LR stack
  encode_imnet   — SIREN 525->3 over nt*B x Q rows
  decode_full    — the whole model.decode for cross-checking the sum

Near-identity warp grids (regular grid + ~1px jitter) mimic trained flows:
gather locality is part of the measurement (uniform-random grids would
overstate HBM cost).

Usage: python tools/decode_decompose.py [--lr-h 96] [--lr-w 160]
Prints one JSON line per case {case, ms}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr-h", type=int, default=96)
    ap.add_argument("--lr-w", type=int, default=160)
    ap.add_argument("--n-times", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--gather-dtype", default="bf16")
    ap.add_argument("--mlp-dtype", default="bf16")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    from stif_tpu.models import LunaTokis
    from stif_tpu.ops.coords import make_coord
    from stif_tpu.ops.grid_sample import grid_sample
    from stif_tpu.ops.warp import warp_grid

    H, W, nt, B = args.lr_h, args.lr_w, args.n_times, 1
    HH, WW = H * 4, W * 4
    Q = HH * WW
    NTB = nt * B
    gd = jnp.bfloat16 if args.gather_dtype == "bf16" else None
    md = jnp.bfloat16 if args.mlp_dtype == "bf16" else None

    model = LunaTokis(gather_dtype=gd, mlp_dtype=md)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    # init params on host CPU (uncompiled init over the tunnel is slow)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        xn = jnp.asarray(rng.random((1, 2, H, W, 3)).astype(np.float32))
        tn = jnp.asarray([i / nt for i in range(nt)], jnp.float32)
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), xn, tn, method=model.full_init))()
    params = jax.device_put(params, dev)

    # device-side input fabrication (the big HR tensors would be slow to
    # push through the tunnel)
    key = jax.device_put(jax.random.PRNGKey(1), dev)

    def mk(shape, k, dtype=jnp.float32):
        return jax.jit(
            lambda kk: jax.random.uniform(kk, shape, dtype),
        )(jax.random.fold_in(key, k))

    feat = mk((B, H, W, 192), 1)          # 3 temporal maps x nf
    inp_cat = mk((B, H, W, 6), 2)         # N=2 frames x 3
    hr_inp = inp_cat                      # decoding path: LR-res input
    hrfeat = mk((NTB, HH, WW, 64), 3)     # stage-A output field
    flow = (mk((NTB, HH, WW, 4), 4) - 0.5) * 0.05
    coord = jnp.clip(make_coord((HH, WW)), -1 + 1e-6, 1 - 1e-6)
    coord = jax.device_put(
        jnp.broadcast_to(coord[None], (B, Q, 2)), dev)
    coord_ntb = jnp.broadcast_to(coord[:1][None], (nt, B, Q, 2)).reshape(
        NTB, Q, 2)
    # near-identity warp grids: regular grid + ~1 LR-pixel jitter
    jit1 = (mk((NTB, Q, 2), 5) - 0.5) * (2.0 / H)
    g1 = jnp.clip(coord_ntb[..., ::-1] + jit1, -1 + 1e-6, 1 - 1e-6)
    g2 = jnp.clip(coord_ntb[..., ::-1] - jit1, -1 + 1e-6, 1 - 1e-6)
    pe = mk((NTB, Q, 1), 6)
    times = jax.device_put(jnp.asarray(
        [i / nt for i in range(nt)], jnp.float32), dev)
    xin = mk((B, 2, H, W, 3), 7)

    def timed(name, fn, *xs):
        f = jax.jit(fn)

        def run(n):
            out = None
            for _ in range(n):
                out = f(*xs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])

        run(1)
        n1, n2 = 2, 2 + args.iters
        t0 = time.perf_counter()
        run(n1)
        t1 = time.perf_counter()
        run(n2)
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        print(json.dumps({"case": name, "ms": round(ms, 3)}), flush=True)
        return ms

    fc = jnp.broadcast_to(
        make_coord((H, W), flatten=False)[None], (B, H, W, 2))

    def stage_a(feat, inp_cat, coord):
        lr_fields = jnp.concatenate([feat, inp_cat, fc], axis=-1)
        return grid_sample(lr_fields, coord[..., ::-1], mode="nearest")

    timed("stageA_nearest", stage_a, feat, inp_cat, coord)

    def stage_b(feat, hr_inp, coord):
        return grid_sample(jnp.concatenate([feat, hr_inp], axis=-1),
                           coord[..., ::-1], mode="bilinear",
                           source_dtype=gd)

    timed("stageB_bilinear", stage_b, feat, hr_inp, coord)

    base_a = mk((NTB, Q, 200), 8)

    def run_feat_imnet(p, x, pe):
        return model.apply(p, (x, pe),
                           method=lambda m, inp: m.feat_imnet(inp))

    timed("feat_imnet", run_feat_imnet, params, base_a, pe)
    del base_a

    qb = mk((NTB, Q, 64), 9)
    qf0 = mk((NTB, Q, 192), 10)
    qi = mk((NTB, Q, 6), 11)

    def run_flow_imnet(p, a, b, c, pe):
        return model.apply(p, (a, b, c, pe),
                           method=lambda m, inp: m.flow_imnet(inp))

    timed("flow_imnet", run_flow_imnet, params, qb, qf0, qi, pe)
    del qb, qf0, qi

    def warp_fn(flow):
        ga = jnp.clip(warp_grid(flow[..., :2]), -1 + 1e-6, 1 - 1e-6)
        gb = jnp.clip(warp_grid(flow[..., 2:]), -1 + 1e-6, 1 - 1e-6)
        return ga.reshape(NTB, Q, 2), gb.reshape(NTB, Q, 2)

    timed("warp_grids", warp_fn, flow)

    def stage_c_hr(hrfeat, g1, g2):
        a = grid_sample(hrfeat, g1, mode="bilinear", source_dtype=gd)
        b = grid_sample(hrfeat, g2, mode="bilinear", source_dtype=gd)
        return a, b

    timed("stageC_hr", stage_c_hr, hrfeat, g1, g2)

    # A/B: HR field already stored bf16 (no cast-at-gather): halves the
    # field's HBM footprint if XLA wasn't already fusing the cast into the
    # feat_imnet output.
    hrfeat_bf16 = jax.jit(lambda v: v.astype(jnp.bfloat16))(hrfeat)

    def stage_c_hr_pre(hrfeat, g1, g2):
        a = grid_sample(hrfeat, g1, mode="bilinear")
        b = grid_sample(hrfeat, g2, mode="bilinear")
        return a, b

    timed("stageC_hr_bf16stored", stage_c_hr_pre, hrfeat_bf16, g1, g2)
    del hrfeat_bf16

    # A/B: ONE gather call over the concatenated (g1, g2) index set — the
    # flat patch-row layout (4C rows) of the big HR field materializes once
    # instead of once per gather call.
    g12 = jnp.concatenate([g1, g2], axis=1)

    def stage_c_hr_fusedidx(hrfeat, g12):
        ab = grid_sample(hrfeat, g12, mode="bilinear", source_dtype=gd)
        return ab[:, :Q], ab[:, Q:]

    timed("stageC_hr_fusedidx", stage_c_hr_fusedidx, hrfeat, g12)

    # A/B: direct (1,2,2,C) slice-gather — no 4C-row materialization at all;
    # the flat layout's win was measured on SMALL sources (L1 DCN), where
    # the one-time materialization amortizes over many gathers. Here the
    # source is 16x bigger and gathered only twice.
    from stif_tpu.ops.gather_utils import set_gather_layout

    set_gather_layout("direct")
    timed("stageC_hr_direct", stage_c_hr, hrfeat, g1, g2)
    timed("stageC_hr_direct_fusedidx", stage_c_hr_fusedidx, hrfeat, g12)
    set_gather_layout("flat")
    del g12

    lr_c = jnp.broadcast_to(
        jnp.concatenate([feat, hr_inp], axis=-1)[None],
        (nt, B, H, W, 198)).reshape(NTB, H, W, 198)
    lr_c = jax.device_put(np.asarray(lr_c), dev)

    def stage_c_lr(lr_c, g1, g2):
        a = grid_sample(lr_c, g1, mode="bilinear", source_dtype=gd)
        b = grid_sample(lr_c, g2, mode="bilinear", source_dtype=gd)
        return a, b

    timed("stageC_lr", stage_c_lr, lr_c, g1, g2)

    # A/B: the stage-C LR source is TIME-INDEPENDENT — the model tiles one
    # (B, H, W, 198) map to nt*B batch rows, so the flat 4C-row layout
    # materializes nt*B times for identical bytes. Fold nt into the QUERY
    # axis instead: gather once from the (B,...) source. For B == 1 the
    # output reshape (1, nt*Q, C) -> (nt, Q, C) is free, so this is
    # bit-identical to the tiled gather.
    # (A first attempt gathered g1 AND g2 in one jit: the two 2B*(nt*B*Q,
    # 4C) gather intermediates coexist and RESOURCE_EXHAUST the 16 GB chip
    # — the per-call form below keeps one in flight, like the model does.)
    lr_c1 = lr_c[:1]
    g1f = g1.reshape(1, NTB * Q, 2)

    def stage_c_lr_g1(lr_c, g1):
        return grid_sample(lr_c, g1, mode="bilinear", source_dtype=gd)

    def stage_c_lr_dedup_g1(lr_c1, g1f):
        return grid_sample(lr_c1, g1f, mode="bilinear",
                           source_dtype=gd).reshape(NTB, Q, -1)

    timed("stageC_lr_g1_baseline", stage_c_lr_g1, lr_c, g1)
    timed("stageC_lr_g1_dedup", stage_c_lr_dedup_g1, lr_c1, g1f)

    def dedup_delta(lr_c, lr_c1, g1, g1f):
        a0 = grid_sample(lr_c[:, :, :, :8], g1, mode="bilinear",
                         source_dtype=gd)
        a1 = grid_sample(lr_c1[:, :, :, :8], g1f, mode="bilinear",
                         source_dtype=gd).reshape(NTB, Q, -1)
        return jnp.max(jnp.abs(a0 - a1))

    print(json.dumps({
        "case": "stageC_lr_dedup_maxdelta",
        "max_delta": float(jax.jit(dedup_delta)(lr_c, lr_c1, g1, g1f))}),
        flush=True)
    del lr_c1, g1f

    q1 = mk((NTB, Q, 64), 12)
    q2 = mk((NTB, Q, 64), 13)
    q3 = mk((NTB, Q, 192), 14)
    q4 = mk((NTB, Q, 192), 15)
    i1 = mk((NTB, Q, 6), 16)
    i2 = mk((NTB, Q, 6), 17)

    def run_encode_imnet(p, *xs):
        return model.apply(p, xs,
                           method=lambda m, inp: m.encode_imnet(inp))

    timed("encode_imnet", run_encode_imnet, params, q1, q2, q3, q4,
          i1, i2, pe)

    # A/B: split the first-layer matmul across the tuple parts
    # (y = sum_i x_i @ W_i + b) instead of materializing the (NTB, Q, 525)
    # concat. Same math to fp32 rounding; measures whether the concat
    # materialization or the K-padding of small parts dominates.
    enc_scope = params["params"]["encode_imnet"]
    w0 = jnp.asarray(enc_scope["layer0"]["kernel"])
    b0 = jnp.asarray(enc_scope["layer0"]["bias"])
    rest_w = [jnp.asarray(enc_scope[f"layer{i}"]["kernel"])
              for i in range(1, 5)]
    rest_b = [jnp.asarray(enc_scope[f"layer{i}"]["bias"])
              for i in range(1, 5)]

    def run_encode_split(*xs):
        off = 0
        y = b0
        for x in xs:
            k = x.shape[-1]
            w = w0[off:off + k]
            if md is not None:
                x = x.astype(md)
                w = w.astype(md)
            y = y + jnp.dot(x, w, preferred_element_type=jnp.float32)
            off += k
        h = jnp.sin(30.0 * y)
        for i, (w, b) in enumerate(zip(rest_w, rest_b)):
            if md is not None:
                h = h.astype(md)
                w = w.astype(md)
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < len(rest_w) - 1:
                h = jnp.sin(30.0 * h)
        return h

    timed("encode_imnet_splitK", run_encode_split, q1, q2, q3, q4,
          i1, i2, pe)
    del q1, q2, q3, q4, i1, i2, hrfeat, flow, g1, g2

    feat_t = jax.jit(lambda p, x: model.apply(p, x, method=model.gen_feat)
                     )(params, xin)

    timed("decode_full", lambda p, f, x, t: model.apply(
        p, f, x, t, method=model.decode), params, feat_t, xin, times)


if __name__ == "__main__":
    main()
