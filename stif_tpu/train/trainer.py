"""Training runtime: optimizer, train step, data-parallel jit.

Parity target: ``VideoSRBaseModel`` (``codes/models/VideoSR_base_model.py``):
Adam over all trainable params (lr 2e-5, betas (0.9, 0.99) per
``train_zsm.yml:56-59``), pixel loss summed over predicted time steps
(``optimize_parameters``, ``:123-131``), cosine-restart schedule, plus the
train driver the reference never shipped (SURVEY.md §1 "Notable absence").

TPU-native: one jitted train step over a ``data``-sharded global batch — the
DDP equivalent; XLA inserts the gradient all-reduce over ICI. No DataParallel
wrapper, no process groups, no samplers.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stif_tpu.train.losses import make_pixel_criterion
from stif_tpu.train.schedules import cosine_annealing_restart, warmup_wrap


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass
class TrainConfig:
    """Defaults mirror ``train_zsm.yml``."""

    lr: float = 2e-5
    beta1: float = 0.9
    beta2: float = 0.99
    niter: int = 600_000
    warmup_iter: int = -1
    T_period: tuple = (150_000, 150_000, 150_000, 150_000)
    restarts: tuple = (150_000, 300_000, 450_000)
    restart_weights: tuple = (1.0, 1.0, 1.0)
    eta_min: float = 1e-7
    pixel_criterion: str = "cb"
    pixel_weight: float = 1.0
    # global-norm gradient clipping (0 = off). The unnormalized summed
    # Charbonnier loss (~5e4) yields grad norms ~1e6 in healthy training;
    # round 3's lr-restart spikes reached 8e6 — clip bounds the step a
    # single bad batch can take. Added to the chain only when set, so the
    # opt_state layout (and old checkpoints) are unchanged by default.
    grad_clip: float = 0.0


def make_optimizer(cfg: TrainConfig):
    schedule = warmup_wrap(
        cosine_annealing_restart(cfg.lr, cfg.T_period, cfg.restarts,
                                 cfg.restart_weights, cfg.eta_min),
        cfg.warmup_iter, cfg.lr,
    )
    parts = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    parts += [
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    ]
    tx = optax.chain(*parts)
    return tx, schedule


def create_train_state(params, cfg: TrainConfig):
    tx, _ = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
    ), tx


def make_loss_fn(model, cfg: TrainConfig):
    """``loss_fn(params, batch) -> scalar``: pixel loss summed over time
    indices, like ``optimize_parameters`` (:123-129). Shared by the train
    step and standalone (forward-only) loss evaluation."""
    criterion = make_pixel_criterion(cfg.pixel_criterion)

    def loss_fn(params, batch):
        gt = batch["gt"]
        nt, HH, WW = gt.shape[1], gt.shape[2], gt.shape[3]
        preds = model.apply(params, batch["lqs"], batch["times"],
                            out_size=(HH, WW))  # (nt, B, HH, WW, 3)
        l_pix = 0.0
        for t in range(nt):
            l_pix = l_pix + cfg.pixel_weight * criterion(preds[t], gt[:, t])
        return l_pix

    return loss_fn


def make_train_step(model, tx, cfg: TrainConfig):
    """Returns ``train_step(state, batch) -> (state, metrics)``.

    batch: dict with
      ``lqs``   (B, N, H, W, 3) LR input frames
      ``gt``    (B, nt, HH, WW, 3) ground-truth frames
      ``times`` (nt,) shared or (B, nt) per-sample query times —
                ``gt[b, t]`` is the frame at ``times[b, t]`` (the reference's
                per-sample pe conditioning, ``Sakuya_arch.py:396``).
    """
    loss_fn = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_parallel_train_step(model, tx, cfg: TrainConfig, mesh: Mesh,
                             per_sample_times: bool = False):
    """Data-parallel train step: state replicated, batch sharded on 'data'.
    XLA emits the gradient all-reduce (the DDP equivalent) over ICI.
    ``per_sample_times``: times are (B, nt) and shard with the batch."""
    step_fn = make_train_step(model, tx, cfg)
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("data"))
    times_shard = batch_shard if per_sample_times else repl
    return jax.jit(
        step_fn,
        in_shardings=(repl, {"lqs": batch_shard, "gt": batch_shard,
                             "times": times_shard}),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
