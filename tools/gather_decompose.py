#!/usr/bin/env python
"""Decompose the in-model L1 DCN cost: which stage loses the 199 Midx/s the
raw flatrow gather achieves in isolation (GATHER_BENCH_r03.json) down to the
~79 Midx/s the profiler measures for ``_raw_grouped_gather`` and the 17.7 ms
full-DCN time (PROFILE_r03.json)?

Candidate sinks, each measured as its own jitted program at the exact L1
shape (B=1, 96x160, G=8, CpG=8, K=9, 1.1M indices):

  ridx        — index arithmetic ((sy*W+sx)*G+g) alone
  rows_build  — flatrow layout materialization (pad + 4-slice concat)
  gather_flat — the raw split gather from PREBUILT rows/ridx (the 199 case)
  rgg_flat    — build + ridx + gather, returning the FLAT (B, QGK, 32) result
  rgg_7d      — ditto + the (B,Q,G,K,2,2,CpG) output reshape (the profiler's
                number: minor dims (2, 8) tile-pad the materialized output)
  weights     — patch_weights corner decomposition alone
  einsums     — the two post-gather contractions from a prebuilt 7-D patch
                tensor (corner-weight fold + MXU weight contraction)
  dcn_full    — the complete _dcn_patch_gather (everything fused in one jit)

Usage: python tools/gather_decompose.py [--lr-h 96] [--lr-w 160]
Prints one JSON line per case {case, ms}; n_idx fixed at Q*G*K.
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bf16")
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

    H, W, G, CpG, K = args.lr_h, args.lr_w, 8, 8, 9
    Q = H * W
    n_idx = Q * G * K
    gd = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    def put(a):
        return jax.device_put(jnp.asarray(a), dev)

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
        print(json.dumps({"case": name, "ms": round(ms, 3),
                          "midx_per_s": round(n_idx / ms / 1e3, 1)}),
              flush=True)
        return ms

    from stif_tpu.ops.deform_conv import _raw_grouped_gather
    from stif_tpu.ops.gather_utils import _gather_rows

    xg = put(rng.random((1, H, W, G, CpG)).astype(np.float32)).astype(gd)
    sy = put(rng.integers(0, H - 1, (1, Q, G, K)).astype(np.int32))
    sx = put(rng.integers(0, W - 1, (1, Q, G, K)).astype(np.int32))

    # --- stage pieces
    def ridx_fn(sy, sx):
        gi = jnp.arange(G, dtype=jnp.int32)[None, None, :, None]
        return ((sy * W + sx) * G + gi).reshape(1, -1)

    timed("ridx", ridx_fn, sy, sx)

    def rows_fn(xg):
        xp = jnp.pad(xg, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
        rows = jnp.concatenate([
            xp[:, :H, :W], xp[:, :H, 1:W + 1],
            xp[:, 1:H + 1, :W], xp[:, 1:H + 1, 1:W + 1],
        ], axis=-1).reshape(1, H * W * G, 4 * CpG)
        return rows

    timed("rows_build", rows_fn, xg)

    rows = put(np.asarray(jax.jit(rows_fn)(xg)))
    ridx = put(np.asarray(jax.jit(ridx_fn)(sy, sx)))
    timed("gather_flat", _gather_rows, rows, ridx)

    def rgg_flat(xg, sy, sx):
        return _gather_rows(rows_fn(xg), ridx_fn(sy, sx))

    timed("rgg_flat", rgg_flat, xg, sy, sx)
    # production form (flat since round 4) + the old 7-D reshape for contrast
    timed("rgg_now", _raw_grouped_gather, xg, sy, sx)
    timed("rgg_7d", lambda a, b, c: _raw_grouped_gather(a, b, c)
          .reshape(1, Q, G, K, 2, 2, CpG), xg, sy, sx)

    # --- post-gather work
    from stif_tpu.ops.gather_utils import patch_weights

    py = put((rng.random((1, Q, G, K)) * (H - 1)).astype(np.float32))
    px = put((rng.random((1, Q, G, K)) * (W - 1)).astype(np.float32))

    def weights_fn(py, px):
        return patch_weights(py, px, H, W, "zeros")

    timed("weights", weights_fn, py, px)

    patches7 = put(rng.random((1, Q, G, K, 2, 2, CpG)).astype(np.float32))
    wm = put(rng.random((1, Q, G, K, 2, 2)).astype(np.float32))
    wgt = put((rng.standard_normal((K, G, CpG, 64)) * 0.1).astype(np.float32))

    def einsums_fn(patches, wm, wr):
        col = jnp.einsum("bqgkijc,bqgkij->bqkgc", patches, wm)
        return jnp.einsum("bqkgc,kgco->bqo", col, wr,
                          preferred_element_type=jnp.float32)

    timed("einsums", einsums_fn, patches7, wm, wgt)

    # --- full op
    from stif_tpu.ops.deform_conv import deform_conv2d

    xd = put(rng.random((1, H, W, G * CpG)).astype(np.float32))
    off = put((rng.standard_normal((1, H, W, G, K, 2)) * 3)
              .astype(np.float32))
    msk = put(rng.random((1, H, W, G, K)).astype(np.float32))
    w33 = put((rng.standard_normal((3, 3, G * CpG, 64)) * 0.1)
              .astype(np.float32))
    timed("dcn_full", lambda a, o, m, w: deform_conv2d(
        a, o, m, w, None, impl="patch",
        gather_dtype=gd if args.dtype == "bf16" else None),
        xd, off, msk, w33)


if __name__ == "__main__":
    main()
