"""LR schedules as optax-style ``step -> lr`` functions.

Parity targets: ``MultiStepLR_Restart`` and ``CosineAnnealingLR_Restart``
(``codes/models/lr_scheduler.py:8-62``) in closed form (the torch versions are
stateful recursions; their telescoped closed forms are implemented here so the
schedule is a pure function of the step — required for a jitted train step and
for exact resume), plus the linear LR warmup of ``BaseModel.update_learning_rate``
(``codes/models/base_model.py:51-63``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp


def multistep_restart(base_lr: float, milestones: Sequence[int],
                      gamma: float = 0.1, restarts: Sequence[int] = (0,),
                      restart_weights: Sequence[float] = (1.0,)):
    """lr(step) = base * weight_of_last_restart * gamma^(#milestones since)."""
    milestones = np.asarray(sorted(milestones))
    restarts = np.asarray(sorted(restarts))
    weights = np.asarray(
        [restart_weights[list(sorted(restarts)).index(r)] for r in restarts]
        if len(restarts) else [1.0]
    )

    def schedule(step):
        step = jnp.asarray(step)
        # last restart <= step (restart at 0 implied when none matched)
        ridx = jnp.sum(step >= restarts) - 1
        last_restart = jnp.where(ridx >= 0, restarts[jnp.maximum(ridx, 0)], 0)
        w = jnp.where(ridx >= 0, jnp.asarray(weights)[jnp.maximum(ridx, 0)], 1.0)
        n_ms = jnp.sum((milestones > last_restart) & (milestones <= step))
        return base_lr * w * gamma ** n_ms

    return schedule


def cosine_annealing_restart(base_lr: float, T_period: Sequence[int],
                             restarts: Sequence[int] = (),
                             restart_weights: Sequence[float] = (),
                             eta_min: float = 0.0):
    """Closed form of the reference's chained cosine recursion:
    lr(step) = eta_min + (base*w_i - eta_min) * (1 + cos(pi*(step-r_i)/T_i))/2
    for the period i whose restart r_i is the last one <= step."""
    rs = np.asarray([0] + sorted(restarts))
    ws = np.asarray([1.0] + list(restart_weights))
    Ts = np.asarray(T_period, dtype=np.float64)
    assert len(Ts) == len(rs), "need one T_period per (implicit) restart"

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.sum(step >= jnp.asarray(rs)) - 1
        idx = jnp.maximum(idx, 0)
        r = jnp.asarray(rs)[idx]
        w = jnp.asarray(ws)[idx]
        T = jnp.asarray(Ts)[idx]
        cos = jnp.cos(jnp.pi * (step - r) / T)
        return eta_min + (base_lr * w - eta_min) * (1 + cos) / 2

    return schedule


def warmup_wrap(schedule, warmup_iter: int, base_lr: float):
    """Linear warmup: lr scaled by step/warmup below warmup_iter (the
    reference adds lr/warmup per step from 0)."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def wrapped(step):
        step = jnp.asarray(step)
        warm = base_lr * jnp.minimum(step, warmup_iter) / warmup_iter
        return jnp.where(step < warmup_iter, warm, schedule(step))

    return wrapped
