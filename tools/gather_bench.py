#!/usr/bin/env python
"""Microbenchmark: TPU gather formulations for the DCN/decoder hot path.

The encoder is bound by `lax.gather` throughput (~30M idx/s measured for
(2,2,CpG) patch slices, ROUND_NOTES r2). This tool measures candidate
formulations on the real chip so perf decisions are grounded:

  * patch5d   — the current production formulation: 5-D operand
                (B,H,W,G,CpG), 3-D starts, slice (1,2,2,1,CpG).
  * flatrow   — pre-materialized patch rows: operand (B, H*W*G, 4*CpG)
                where each row already holds the 2x2xCpG patch
                contiguously; 1-D starts, slice (1,1,4*CpG). One
                contiguous run per index instead of four.
  * window    — tap-clustered (1,Wy,Wx,1,CpG) slices (impl='window'),
                K x fewer indices, K x bigger slices.
  * decoder_c — decoder stage-C shape: (B, 4H, 4W, C) source, 2x2xC
                patches at nt*Q HR queries.

Usage: python tools/gather_bench.py [--lr-h 96] [--lr-w 160] [--iters 5]
Prints one JSON line per case: {case, n_idx, ms, midx_per_s, gb_per_s}.
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
    try:  # remote compiles over the tunnel run ~30-60s each; cache them
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    H, W, G, CpG, K = args.lr_h, args.lr_w, 8, 8, 9
    Q = H * W
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    def put(a):
        return jax.device_put(jnp.asarray(a), dev)

    def timed(name, fn, *xs, n_idx, bytes_per_idx):
        # Two-point timing: under the tunneled device only a FETCH is a
        # reliable sync (block_until_ready returns early on remote arrays),
        # and a fetch costs a tunnel round trip. (t(N2) - t(N1)) / (N2-N1)
        # cancels the constant dispatch+fetch overhead.
        f = jax.jit(fn)

        def run(n):
            out = None
            for _ in range(n):
                out = f(*xs)
            # chain-fetch one element to wait out the whole queue
            flat = out.reshape(-1)
            np.asarray(flat[:1])

        run(1)  # compile + warm
        n1, n2 = 2, 2 + args.iters
        # The two-point differential cancels the constant dispatch+fetch
        # overhead, but a single pair is noise-sensitive: one slow tunnel
        # round-trip in the n1 leg made round 4's artifact report a
        # *negative* wall time (GATHER_BENCH_r04 decoder_c ms=-0.251).
        # Median over repeated pairs; never emit a non-positive time — if
        # noise still swamps the differential, report the un-differenced
        # per-call time as an explicit upper bound instead.
        diffs = []
        uppers = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(n1)
            t1 = time.perf_counter()
            run(n2)
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
            uppers.append((t2 - t1) / n2 * 1e3)
        ms = float(np.median(diffs))
        rec = {"case": name, "n_idx": n_idx}
        if ms <= 0.0:
            ms = float(np.median(uppers))
            rec["upper_bound"] = True
        assert ms > 0.0, f"non-positive time for {name}: {diffs} {uppers}"
        rec.update({
            "ms": round(ms, 3),
            "midx_per_s": round(n_idx / ms / 1e3, 1),
            "gb_per_s": round(n_idx * bytes_per_idx / ms / 1e6, 2),
        })
        print(json.dumps(rec), flush=True)

    isz = np.dtype(np.float32).itemsize if dt == jnp.float32 else 2

    # ---------------------------------------------------- patch5d (current)
    x5 = put(rng.random((1, H, W, G, CpG)).astype(np.float32).astype(
        "bfloat16" if dt == jnp.bfloat16 else "float32"))
    sy = put(rng.integers(0, H - 1, (1, Q, G, K)).astype(np.int32))
    sx = put(rng.integers(0, W - 1, (1, Q, G, K)).astype(np.int32))

    def patch5d(x, sy, sx):
        from stif_tpu.ops.deform_conv import _raw_grouped_gather
        return _raw_grouped_gather(x, sy, sx)

    timed("patch5d", patch5d, x5, sy, sx,
          n_idx=Q * G * K, bytes_per_idx=4 * CpG * isz)

    # ----------------------------------------------------------- flatrow
    # operand rows pre-hold the 2x2 patch: row r = (y*W + x)*G + g
    xr = put(rng.random((1, H * W * G, 4 * CpG)).astype(np.float32).astype(
        "bfloat16" if dt == jnp.bfloat16 else "float32"))
    ridx = put((rng.integers(0, H * W * G - 1,
                             (1, Q * G * K))).astype(np.int32))

    def flatrow(x, r):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,),
            collapsed_slice_dims=(1,),
            start_index_map=(1,),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        return jax.lax.gather(x, r[..., None], dn,
                              slice_sizes=(1, 1, 4 * CpG), mode="clip")

    timed("flatrow", flatrow, xr, ridx,
          n_idx=Q * G * K, bytes_per_idx=4 * CpG * isz)

    # flatrow at half the index count (e.g. if corners merge further)
    timed("flatrow_half", flatrow, xr, ridx[:, ::2],
          n_idx=Q * G * K // 2, bytes_per_idx=4 * CpG * isz)

    # flatrow split into S sequential sub-gathers inside ONE jit: probes
    # whether the half-size speedup (8x time drop for 2x fewer indices —
    # a result-size threshold, not bandwidth) survives when both halves
    # still run back-to-back in a single program.
    def flatrow_split(s):
        def f(x, r):
            parts = [flatrow(x, c) for c in jnp.split(r, s, axis=1)]
            return jnp.concatenate(parts, axis=1)
        return f

    for s in (2, 4, 8):
        timed(f"flatrow_split{s}", flatrow_split(s), xr, ridx,
              n_idx=Q * G * K, bytes_per_idx=4 * CpG * isz)

    # ------------------------------------------------------------- window
    from stif_tpu.ops.deform_conv import _grouped_window_gather

    by = put(rng.integers(0, H - 8, (1, Q, G)).astype(np.int32))
    bx = put(rng.integers(0, W - 8, (1, Q, G)).astype(np.int32))
    timed("window8", lambda x, a, b: _grouped_window_gather(x, a, b, 8, 8),
          x5, by, bx, n_idx=Q * G, bytes_per_idx=64 * CpG * isz)

    # ------------------------------------------------- decoder stage-C-ish
    C = 64
    HH, WW, NT = H * 4, W * 4, 8
    xd = put(rng.random((1, HH, WW, C)).astype(np.float32).astype(
        "bfloat16" if dt == jnp.bfloat16 else "float32"))
    qy = put(rng.integers(0, HH - 1, (1, NT * Q)).astype(np.int32))
    qx = put(rng.integers(0, WW - 1, (1, NT * Q)).astype(np.int32))

    def dec_c(x, a, b):
        from stif_tpu.ops.gather_utils import _raw_gather_patches
        return _raw_gather_patches(x, a, b)

    timed("decoder_c", dec_c, xd, qy, qx,
          n_idx=NT * Q, bytes_per_idx=4 * C * isz)

    # decoder flat-row variant
    xdr = put(rng.random((1, HH * WW, 4 * C)).astype(np.float32).astype(
        "bfloat16" if dt == jnp.bfloat16 else "float32"))
    didx = put(rng.integers(0, HH * WW - 1, (1, NT * Q)).astype(np.int32))

    def dec_flat(x, r):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,),
            collapsed_slice_dims=(1,),
            start_index_map=(1,),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        return jax.lax.gather(x, r[..., None], dn,
                              slice_sizes=(1, 1, 4 * C), mode="clip")

    timed("decoder_c_flat", dec_flat, xdr, didx,
          n_idx=NT * Q, bytes_per_idx=4 * C * isz)


if __name__ == "__main__":
    main()
