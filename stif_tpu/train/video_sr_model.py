"""High-level training facade.

Parity target: ``VideoSRBaseModel`` / ``BaseModel``
(``codes/models/VideoSR_base_model.py``, ``codes/models/base_model.py``) and
the ``create_model(opt)`` factory (``codes/models/__init__.py:5-13``):
feed_data / optimize_parameters / test / get_current_log / save / load /
resume_training, driven by the same YAML option schema.

TPU-native: no DataParallel/DDP wrapper — the jitted train step is sharded
over the device mesh; checkpoints via orbax; the LR schedule is a pure
function of the step (exact resume for free).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from stif_tpu.models.factory import define_g
from stif_tpu.parallel import default_mesh
from stif_tpu.train.checkpoints import CheckpointManager
from stif_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_parallel_train_step,
    make_train_step,
)


def create_model(opt: dict):
    """Reference model factory: only registered model is 'VideoSR_base'."""
    which = opt.get("model", "VideoSR_base")
    if which != "VideoSR_base":
        raise NotImplementedError(f"Model [{which}] not recognized.")
    return VideoSRModel(opt)


class VideoSRModel:
    def __init__(self, opt: dict, parallel: bool = False):
        self.opt = opt
        self.is_train = bool(opt.get("is_train", True))
        self.net = define_g(opt)
        tr = opt.get("train") or {}
        self.cfg = TrainConfig(
            lr=float(tr.get("lr_G", 2e-5)),
            beta1=float(tr.get("beta1", 0.9)),
            beta2=float(tr.get("beta2", 0.99)),
            niter=int(tr.get("niter", 600_000)),
            warmup_iter=int(tr.get("warmup_iter", -1) or -1),
            T_period=tuple(tr.get("T_period", (150_000,) * 4)),
            restarts=tuple(tr.get("restarts", (150_000, 300_000, 450_000))),
            restart_weights=tuple(tr.get("restart_weights", (1.0,) * 3)),
            eta_min=float(tr.get("eta_min", 1e-7)),
            pixel_criterion=tr.get("pixel_criterion", "cb"),
            pixel_weight=float(tr.get("pixel_weight", 1.0)),
            grad_clip=float(tr.get("grad_clip", 0.0) or 0.0),
        )
        self.state = None
        self.tx = None
        self._step_fn = None
        self._test_fn = None
        self.parallel = parallel
        self.log = {}
        # Exponential moving average of the params (train.ema_decay, 0 = off).
        # Kept OUTSIDE TrainState so the optimizer-checkpoint layout (and the
        # reference's .state schema mapping) is unchanged; saved/restored as a
        # sibling ``ema_params_<step>`` weights-only checkpoint. EMA weights
        # average over ~1/(1-decay) steps, smoothing the lr-driven val
        # oscillation the round-4 curves show — validation probes both and
        # keep-best takes the better.
        tr = opt.get("train") or {}
        self.ema_decay = float(tr.get("ema_decay", 0.0) or 0.0)
        self.ema_params = None
        self._ema_fn = None
        models_dir = (opt.get("path") or {}).get("models")
        self.ckpt = CheckpointManager(models_dir) if models_dir else None
        self._batch = None

    # ---------------------------------------------------------------- setup

    def init_params(self, example_lqs, example_times, seed: int = 0):
        x = jnp.asarray(example_lqs)
        t = jnp.asarray(example_times)
        # Param shapes don't depend on spatial dims: init at a minimal
        # (1, N, 16, 16, 3) clip, under jit — an UNCOMPILED full-model init
        # dispatches each op over the (tunneled) device link and takes
        # minutes on TPU.
        x0 = jnp.zeros((1, x.shape[1], 16, 16, x.shape[-1]), x.dtype)
        t0 = t[:1] if t.ndim == 1 else t[:1, :]
        if hasattr(self.net, "full_init"):
            init_fn = jax.jit(
                lambda k: self.net.init(k, x0, t0, method=self.net.full_init))
        else:
            init_fn = jax.jit(lambda k: self.net.init(k, x0, t0))
        params = init_fn(jax.random.PRNGKey(seed))
        self.state, self.tx = create_train_state(params, self.cfg)
        if self.ema_decay > 0:
            self.ema_params = self.state.params
            d = self.ema_decay
            self._ema_fn = jax.jit(lambda e, p: jax.tree.map(
                lambda a, b: d * a + (1.0 - d) * b, e, p))
        if self.parallel:
            mesh = default_mesh()
            self._step_fn = make_parallel_train_step(
                self.net, self.tx, self.cfg, mesh,
                per_sample_times=t.ndim == 2)
        else:
            self._step_fn = jax.jit(make_train_step(self.net, self.tx,
                                                    self.cfg))
        return self.state

    # ------------------------------------------------------------- training

    def feed_data(self, data: dict):
        """data: {'LQs': (B,N,h,w,3), 'GT': (B,nt,H,W,3),
        'times': (nt,) shared or (B,nt) per-sample}
        (NHWC; the reference's NCHW batches convert via ``from_torch_batch``).
        """
        times = jnp.asarray(data["times"])
        if times.ndim > 2:
            times = times.reshape(times.shape[0], -1)
        self._batch = {
            "lqs": jnp.asarray(data["LQs"]),
            "gt": jnp.asarray(data["GT"]),
            "times": times,
        }

    def optimize_parameters(self, step: Optional[int] = None):
        assert self.state is not None, "call init_params first"
        self.state, metrics = self._step_fn(self.state, self._batch)
        if self.ema_params is not None:
            self.ema_params = self._ema_fn(self.ema_params,
                                           self.state.params)
        self.log = {k: float(v) for k, v in metrics.items()}
        return self.log

    def get_current_log(self):
        return self.log

    # ------------------------------------------------------------ inference

    def test(self, test_mode: bool = False, out_size=None):
        if self._test_fn is None:
            net = self.net

            def f(params, x, t):
                return net.apply(params, x, t, out_size=out_size,
                                 test=test_mode)

            self._test_fn = jax.jit(f)
        return self._test_fn(self.state.params, self._batch["lqs"],
                             self._batch["times"])

    # ----------------------------------------------------- checkpoint/resume

    def save(self, step: Optional[int] = None):
        assert self.ckpt is not None
        ret = self.ckpt.save(self.state)
        if self.ema_params is not None:
            self.ckpt.save_params_only(self.ema_params, int(self.state.step),
                                       prefix="ema_params", keep=2)
        return ret

    def save_network(self, step: int):
        assert self.ckpt is not None
        return self.ckpt.save_params_only(self.state.params, step)

    def resume_training(self, step: Optional[int] = None):
        assert self.ckpt is not None and self.state is not None
        self.state = self.ckpt.restore(self.state, step)
        if self.ema_decay > 0:
            # restore the EMA snapshot written with this checkpoint; a
            # supervisor restart from a pre-EMA checkpoint re-seeds from the
            # raw params (EMA re-converges within ~1/(1-decay) steps)
            from stif_tpu.train.checkpoints import load_params

            path = os.path.join(self.ckpt.directory,
                                f"ema_params_{int(self.state.step)}")
            if os.path.exists(path):
                self.ema_params = load_params(path, self.state.params)
            else:
                self.ema_params = self.state.params
        return int(self.state.step)

    def load_pth(self, path: str):
        """Import a reference ``.pth`` checkpoint (strict)."""
        from stif_tpu.convert import load_pth_checkpoint

        params = load_pth_checkpoint(path, self.state.params)
        self.state = self.state.replace(params=params)
        if self.ema_decay > 0:  # re-seed EMA from the warm-start weights
            self.ema_params = params


def from_torch_batch(batch: dict) -> dict:
    """Convert a reference-style NCHW batch dict ({'LQs': (B,N,3,h,w), 'GT':
    (B,nt,3,H,W), 'time': [...]}) to this trainer's NHWC layout."""
    out = {
        "LQs": np.transpose(np.asarray(batch["LQs"]), (0, 1, 3, 4, 2)),
        "GT": np.transpose(np.asarray(batch["GT"]), (0, 1, 3, 4, 2)),
    }
    t = batch.get("time", batch.get("times"))
    t = np.asarray(t)
    # the reference's 'time' is a list of nt tensors each (B,) — asarray gives
    # (nt, B); transpose to the trainer's per-sample (B, nt) layout
    out["times"] = t.reshape(-1) if t.ndim <= 1 else t.T
    return out
