"""Headline benchmark: continuous space-time SR throughput on one TPU chip.

Canonical workload (mirrors the reference's deployed path,
``custom_video_test.py``): LR frame pairs -> 8 intermediate frames at x4
spatial SR with the full LunaTokis config (nf=64, 5 front / 40 back RBs).

Two streaming modes are measured and the faster one is the headline:
  * B=1 double-buffered pair streaming (fetch pair i while i+1 computes);
  * batched-pair streaming (encoder at batch B amortizes dispatch/small-op
    cost; decode memory-bounded through the ChunkedDecoder).

Prints ONE JSON line:
  {"metric": "frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N, ...diagnostic fields...}

vs_baseline compares against the measured torch-CPU mirror throughput stored
in BASELINE_MEASURED.json (the reference itself cannot run anywhere without
its CUDA-only DCNv2 extension — SURVEY.md §6). North star: >=10x.
"""

import json
import os
import time

import numpy as np

# LR input size (the reference's canonical run halves ~192x320 frames).
LR_H, LR_W = 96, 160
N_TIMES = 8
WARMUP = 2
ITERS = 5
# Batched-pair streaming: measured SLOWER than B=1 double-buffered streaming
# in r2 (3.15 vs 5.9 fps at BENCH_CHUNK=61440 — dispatch-bound chunks), but
# the r3 bf16-MLP memory headroom makes the full (non-chunked) B=2 decode
# compilable, so B=2 is MEASURED BY DEFAULT now (VERDICT r3 item 5: two
# rounds of `batched_fps: null` is not an answer). The headline `value`
# stays max(b1, batched); b1 remains separately reported.
PAIR_BATCH = int(os.environ.get("BENCH_PAIR_BATCH", "2"))


def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def _build():
    import jax
    import jax.numpy as jnp

    from stif_tpu.models import LunaTokis

    # bf16 gather sources by default: validated quality-free on the trained
    # 10500-step checkpoint (EVAL_r02 vs EVAL_r02_bf16 — every PSNR/SSIM
    # metric identical to reported precision) and ~8% faster end-to-end
    # (encoder 1.03 s -> 0.96 s). BENCH_GATHER_DTYPE=fp32 restores bit-parity.
    gd = os.environ.get("BENCH_GATHER_DTYPE", "bf16")
    md = os.environ.get("BENCH_MLP_DTYPE", "bf16")
    # split-K encode_imnet default on: gated on the trained round-4 weights
    # (EVAL_r04_splitk vs EVAL_r04_plain — deltas <=0.001 dB) and 5.6e-8
    # end-to-end equality; BENCH_ENCODE_SPLITK=0 restores the concat form.
    sk = os.environ.get("BENCH_ENCODE_SPLITK", "1") not in ("0", "false")
    impl = os.environ.get("BENCH_DCN_IMPL")    # "dense" after offset check
    if impl:
        from stif_tpu.ops.deform_conv import set_dcn_impl

        bound = os.environ.get("BENCH_SHIFT_BOUND")
        set_dcn_impl(impl, int(bound) if bound else None)
    # stage-C levers (VERDICT r4 #4): dedup folds nt into the query axis of
    # the time-independent LR gather (bit-identical; barrier-serialized so
    # the two grids' intermediates never coexist); nearest swaps the wide
    # feat component's bilinear patch gather for 1-index nearest
    # (approximation — flip only after its quality gate).
    dd = os.environ.get("BENCH_STAGEC_DEDUP", "0") not in ("0", "false")
    sn = os.environ.get("BENCH_STAGEC_NEAREST", "0") not in ("0", "false")
    sd = os.environ.get("BENCH_STAGEC_DTYPE")  # e.g. "fp8"
    # Measure the DEPLOYED architecture: the round-5 trained deliverable is
    # rgb_skip=bicubic (residual-over-bicubic decode head), so the perf
    # headline and the quality headline are the SAME configuration — the r4
    # verdict flagged that they had diverged. BENCH_RGB_SKIP=none restores
    # the reference-semantics plain head for apples-to-apples history.
    rs = os.environ.get("BENCH_RGB_SKIP", "bicubic")
    model = LunaTokis(
        gather_dtype=jnp.bfloat16 if gd in ("bf16", "bfloat16") else None,
        mlp_dtype=jnp.bfloat16 if md in ("bf16", "bfloat16") else None,
        encode_splitk=sk, stagec_dedup=dd, stagec_nearest=sn,
        stagec_dtype=jnp.float8_e4m3fn if sd in ("fp8", "float8") else None,
        rgb_skip=rs not in ("none", "0", "false"),
        rgb_skip_bicubic=(rs == "bicubic"))
    rng = np.random.default_rng(0)
    xn = rng.random((1, 2, LR_H, LR_W, 3)).astype(np.float32)
    tn = np.asarray([i / N_TIMES for i in range(N_TIMES)], np.float32)

    # Init on the host CPU backend: uncompiled init over the tunneled TPU is
    # pathologically slow (each op a round trip).
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(xn),
                               jnp.asarray(tn), method=model.full_init)
        )()
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    return model, params, dev, rng, tn


def bench_b1(model, params, dev, rng, tn):
    """B=1 double-buffered streaming + per-stage breakdown."""
    import jax
    import jax.numpy as jnp

    times = jax.device_put(jnp.asarray(tn), dev)
    x = jax.device_put(
        jnp.asarray(rng.random((1, 2, LR_H, LR_W, 3)).astype(np.float32)),
        dev)

    # product behavior: clamp to [0,1] and quantize to uint8 on device (the
    # frames are saved as images); 4x smaller host transfer.
    fwd = jax.jit(
        lambda p, x, t: jnp.round(
            jnp.clip(model.apply(p, x, t), 0, 1) * 255
        ).astype(jnp.uint8)
    )
    # XLA's own FLOP count of the compiled workload — the MFU numerator.
    flops = None
    try:
        ca = fwd.lower(params, x, times).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    for _ in range(WARMUP):
        np.asarray(fwd(params, x, times))  # force completion

    stream = [
        jax.device_put(
            jnp.asarray(rng.random((1, 2, LR_H, LR_W, 3)).astype(np.float32)),
            dev,
        )
        for _ in range(ITERS)
    ]
    t0 = time.perf_counter()
    pending = fwd(params, stream[0], times)
    for f in stream[1:]:
        nxt = fwd(params, f, times)
        np.asarray(pending)
        pending = nxt
    out = np.asarray(pending)
    dt = (time.perf_counter() - t0) / ITERS
    fps = N_TIMES / dt

    # per-stage breakdown (diagnostic; separate dispatches)
    gen = jax.jit(lambda p, x: model.apply(p, x, method=model.gen_feat))
    dec = jax.jit(
        lambda p, f, x, t: jnp.round(
            jnp.clip(model.apply(p, f, x, t, method=model.decode), 0, 1) * 255
        ).astype(jnp.uint8))
    feat = gen(params, x)
    np.asarray(feat[0, 0, 0, :1])  # warm the compile
    t0 = time.perf_counter()
    for _ in range(2):
        feat = gen(params, x)
        np.asarray(feat[0, 0, 0, :1])
    t_enc = (time.perf_counter() - t0) / 2
    np.asarray(dec(params, feat, x, times))
    t0 = time.perf_counter()
    for _ in range(2):
        o = dec(params, feat, x, times)
        np.asarray(o[0, 0, 0, :1])
    t_dec = (time.perf_counter() - t0) / 2
    t0 = time.perf_counter()
    np.asarray(o)  # full uint8 frame fetch
    t_xfer = time.perf_counter() - t0
    stages = {"encode_s": round(t_enc, 4), "decode_s": round(t_dec, 4),
              "transfer_s": round(t_xfer, 4)}
    return fps, out.shape, stages, flops


def bench_batched(model, params, dev, rng, tn, batch, mode=None):
    """Batched-pair streaming: full jitted decode (BENCH_CHUNK=full —
    feasible with bf16 gather/MLP memory), a time-split full decode
    (BENCH_CHUNK=tsplit: the B=2 nt=8 program exceeds what the axon
    remote-compile helper accepts, so decode runs as two nt=4 dispatches —
    per-program query count equals the compilable B=1 nt=8 program while
    the ENCODER still amortizes at batch B), or the ChunkedDecoder."""
    import jax
    import jax.numpy as jnp

    from stif_tpu.runtime.chunked import ChunkedDecoder

    times = jax.device_put(jnp.asarray(tn), dev)
    gen = jax.jit(lambda p, x: model.apply(p, x, method=model.gen_feat))
    chunk_env = mode or os.environ.get("BENCH_CHUNK", "full")
    if chunk_env == "full":
        fwd = jax.jit(
            lambda p, x, t: jnp.round(
                jnp.clip(model.apply(p, x, t), 0, 1) * 255
            ).astype(jnp.uint8))

        def run(xb):
            return fwd(params, xb, times)
    elif chunk_env == "tsplit":
        half = len(tn) // 2
        dec = jax.jit(
            lambda p, f, x, t: jnp.round(
                jnp.clip(model.apply(p, f, x, t, method=model.decode),
                         0, 1) * 255
            ).astype(jnp.uint8))

        def run(xb):
            f = gen(params, xb)
            return (dec(params, f, xb, times[:half]),
                    dec(params, f, xb, times[half:]))
    else:
        dec = ChunkedDecoder(model, params, chunk_size=int(chunk_env))

        def run(xb):
            feat = gen(params, xb)
            out = dec.decode(feat, xb, times,
                             (LR_H * 4, LR_W * 4))
            return out

    xb = jax.device_put(
        jnp.asarray(rng.random((batch, 2, LR_H, LR_W, 3)).astype(np.float32)),
        dev)
    # sync by fetching: on the tunneled device block_until_ready can
    # return before the queue drains (see bench_b1 / tools timing notes)
    for _ in range(WARMUP):
        np.asarray(jax.tree.leaves(run(xb))[0].reshape(-1)[:1])
    groups = [
        jax.device_put(
            jnp.asarray(
                rng.random((batch, 2, LR_H, LR_W, 3)).astype(np.float32)),
            dev,
        )
        for _ in range(max(2, ITERS // batch))
    ]
    t0 = time.perf_counter()
    out = None
    for g in groups:
        out = run(g)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / len(groups)
    return batch * N_TIMES / dt


# TPU v5e (v5 lite) peak dense matmul throughput, bf16 with fp32 accum —
# the MFU denominator (public spec; jax-ml.github.io/scaling-book).
V5E_PEAK_BF16_FLOPS = 197e12


def main():
    _enable_compile_cache()
    model, params, dev, rng, tn = _build()
    fps1, shape, stages, flops = bench_b1(model, params, dev, rng, tn)
    fps_b, batch_err, batch_mode = None, None, None
    if PAIR_BATCH > 1:
        try:
            # the axon remote-compile helper 500s transiently on big
            # programs (r4's "batched_error" was a single HTTP 500, i.e.
            # evidence of an infra failure, not of B>1 losing): retry the
            # monolithic compile with backoff before concluding anything
            last = None
            for wait in (0, 15, 45):
                if wait:
                    time.sleep(wait)
                try:
                    fps_b = bench_batched(model, params, dev, rng, tn,
                                          PAIR_BATCH)
                    break
                except Exception as e:
                    last = e
                    if "500" not in str(e) and "INTERNAL" not in str(e):
                        raise
            if fps_b is None:
                raise last
            batch_mode = os.environ.get("BENCH_CHUNK", "full")
        except Exception as e:  # never fail the headline on the batched path
            batch_err = f"{type(e).__name__}: {e}"[:200]
            # the B=2 nt=8 full-decode program is known to exceed the axon
            # remote-compile helper; retry with the time-split full decode
            # (same per-program query count as the compilable B=1 program)
            if os.environ.get("BENCH_CHUNK", "full") == "full":
                try:
                    fps_b = bench_batched(model, params, dev, rng, tn,
                                          PAIR_BATCH, mode="tsplit")
                    batch_mode = "tsplit"
                except Exception as e2:
                    batch_err += f" | tsplit: {type(e2).__name__}: {e2}"[:150]
    fps = max(fps1, fps_b or 0.0)

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref_fps = base.get("torch_cpu_frames_per_sec")
        if ref_fps:
            vs = fps / ref_fps
    # MFU: XLA-counted FLOPs of the jitted B=1 workload over wall-clock per
    # window, against v5e bf16 peak. Honest denominator for a gather-bound
    # model — expect low single digits; the point is tracking it.
    mfu = None
    if flops:
        mfu = flops / (N_TIMES / fps1) / V5E_PEAK_BF16_FLOPS

    from stif_tpu.ops import deform_conv as _dc
    from stif_tpu.utils.provenance import stamp

    rec = {
        "metric": "frames_per_sec",
        # weights: none — the throughput workload runs on seeded random
        # params (quality artifacts carry their own weights stamp)
        "provenance": stamp(config=f"bench.py LR {LR_H}x{LR_W} nt={N_TIMES}"),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "b1_fps": round(fps1, 3),
        "batched_fps": round(fps_b, 3) if fps_b else None,
        "batched_mode": batch_mode,
        "pair_batch": PAIR_BATCH,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "workload_tflops": round(flops / 1e12, 3) if flops else None,
        # precision/impl provenance so the headline number is traceable to
        # its mode from the artifact alone (ADVICE r2). NOTE: bf16 gather
        # sources became the default in r2, bf16 decoder MLP and full
        # (non-chunked) batched decode in r3, split-K encode_imnet in r4 —
        # earlier rounds' headline fps are not apples-to-apples with these
        # defaults.
        "encode_splitk": os.environ.get("BENCH_ENCODE_SPLITK", "1")
        not in ("0", "false"),
        "stagec_dedup": os.environ.get("BENCH_STAGEC_DEDUP", "0")
        not in ("0", "false"),
        "stagec_nearest": os.environ.get("BENCH_STAGEC_NEAREST", "0")
        not in ("0", "false"),
        "stagec_dtype": os.environ.get("BENCH_STAGEC_DTYPE") or None,
        "rgb_skip": os.environ.get("BENCH_RGB_SKIP", "bicubic"),
        "gather_dtype": os.environ.get("BENCH_GATHER_DTYPE", "bf16"),
        "mlp_dtype": os.environ.get("BENCH_MLP_DTYPE", "bf16"),
        # the impl actually dispatched (env may ask for one that degrades,
        # e.g. 'window' falls back to 'patch' on small sources) — ADVICE r3
        "dcn_impl": _dc._DEFAULT_IMPL,
        "stages": stages,
    }
    if batch_err:
        rec["batched_error"] = batch_err
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
