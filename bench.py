"""Headline benchmark: continuous space-time SR throughput on one TPU chip.

Canonical workload (mirrors the reference's deployed path,
``custom_video_test.py``): one LR frame pair -> 8 intermediate frames at x4
spatial SR with the full LunaTokis config (nf=64, 5 front / 40 back RBs).

Prints ONE JSON line:
  {"metric": "frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N}

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


def bench_tpu():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from stif_tpu.models import LunaTokis

    model = LunaTokis()
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
    x = jax.device_put(jnp.asarray(xn), dev)
    times = jax.device_put(jnp.asarray(tn), dev)

    # product behavior: clamp to [0,1] and quantize to uint8 on device (the
    # frames are saved as images); 4x smaller host transfer.
    fwd = jax.jit(
        lambda p, x, t: jnp.round(
            jnp.clip(model.apply(p, x, t), 0, 1) * 255
        ).astype(jnp.uint8)
    )
    for _ in range(WARMUP):
        out = fwd(params, x, times)
        np.asarray(out)  # force completion (axon block_until_ready is lazy)

    # streaming throughput: distinct frame pairs, double-buffered — fetch
    # pair i's frames while pair i+1 computes (the production pipeline shape)
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
    return N_TIMES / dt, out.shape


def main():
    fps, shape = bench_tpu()
    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref_fps = base.get("torch_cpu_frames_per_sec")
        if ref_fps:
            vs = fps / ref_fps
    print(json.dumps({
        "metric": "frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
