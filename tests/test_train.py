"""Losses, LR schedules, and the train step."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full models: minutes on the 1-core CI host
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from stif_tpu.train import (
    charbonnier_loss,
    cosine_annealing_restart,
    lap_loss,
    multistep_restart,
    warmup_wrap,
)


class TestLosses:
    def test_charbonnier_matches_torch(self, rng):
        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        y = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        tx, ty = torch.from_numpy(x), torch.from_numpy(y)
        want = torch.sum(torch.sqrt((tx - ty) ** 2 + 1e-6)).item()
        got = float(charbonnier_loss(jnp.asarray(x), jnp.asarray(y)))
        assert abs(got - want) < 1e-3

    def test_lap_loss_matches_torch_reference(self, rng):
        """Oracle re-derives the reference LapLoss with torch ops (including
        its exp()**2 kernel quirk, replicate pad, avg-pool pyramid)."""
        x = rng.random((1, 3, 16, 16)).astype(np.float32)
        y = rng.random((1, 3, 16, 16)).astype(np.float32)

        size, sigma, levels = 5, 2.0, 3
        grid = np.float32(np.mgrid[0:size, 0:size].T)
        g = np.exp((grid - size // 2) ** 2 / (-2 * sigma ** 2)) ** 2
        kernel = np.sum(g, axis=2)
        kernel /= kernel.sum()
        k = torch.from_numpy(np.tile(kernel, (3, 1, 1))[:, None]).float()

        def conv_gauss(img):
            img = TF.pad(img, (2, 2, 2, 2), mode="replicate")
            return TF.conv2d(img, k, groups=3)

        def pyr(img):
            out, cur = [], img
            for _ in range(levels):
                f = conv_gauss(cur)
                out.append(cur - f)
                cur = TF.avg_pool2d(f, 2)
            out.append(cur)
            return out

        tx, ty = torch.from_numpy(x), torch.from_numpy(y)
        want = sum(
            TF.l1_loss(a, b) for a, b in zip(pyr(tx), pyr(ty))
        ).item()
        got = float(
            lap_loss(
                jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(y.transpose(0, 2, 3, 1)),
                max_levels=levels,
            )
        )
        assert abs(got - want) < 1e-5


def torch_cosine_restart_lrs(base_lr, T_period, restarts, weights, eta_min,
                             niter):
    """Run the reference scheduler recursion via torch."""
    import sys
    sys.path.insert(0, "/root/reference/codes")  # not imported; re-derive
    sys.path.pop(0)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    # faithful re-implementation of the recursion (lr_scheduler.py:34-62)
    import math as m

    lrs = []
    lr = base_lr
    last_restart = 0
    T_max = T_period[0]
    for step in range(niter):
        if step == 0:
            lr = base_lr
        elif step in restarts:
            last_restart = step
            T_max = T_period[restarts.index(step) + 1]
            lr = base_lr * weights[restarts.index(step)]
        elif (step - last_restart - 1 - T_max) % (2 * T_max) == 0:
            lr = lr + (base_lr - eta_min) * (1 - m.cos(m.pi / T_max)) / 2
        else:
            num = 1 + m.cos(m.pi * (step - last_restart) / T_max)
            den = 1 + m.cos(m.pi * (step - last_restart - 1) / T_max)
            lr = num / den * (lr - eta_min) + eta_min
        lrs.append(lr)
    return np.asarray(lrs)


class TestSchedules:
    def test_cosine_restart_matches_reference_recursion(self):
        base, T, restarts, weights, eta = 2e-5, [50, 50, 50, 50], [50, 100, 150], [1, 1, 1], 1e-7
        want = torch_cosine_restart_lrs(base, T, restarts, weights, eta, 200)
        sched = cosine_annealing_restart(base, T, restarts, weights, eta)
        got = np.asarray([float(sched(s)) for s in range(200)])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_multistep_restart(self):
        sched = multistep_restart(1e-3, milestones=[10, 20], gamma=0.1,
                                  restarts=[30], restart_weights=[0.5])
        assert abs(float(sched(0)) - 1e-3) < 1e-9
        assert abs(float(sched(15)) - 1e-4) < 1e-9
        assert abs(float(sched(25)) - 1e-5) < 1e-9
        assert abs(float(sched(35)) - 5e-4) < 1e-9

    def test_warmup(self):
        sched = warmup_wrap(lambda s: jnp.asarray(1e-3), 10, 1e-3)
        assert float(sched(0)) == 0.0
        assert abs(float(sched(5)) - 5e-4) < 1e-9
        assert abs(float(sched(20)) - 1e-3) < 1e-9


class TestTrainStep:
    def test_loss_decreases(self):
        from stif_tpu.models import LunaTokis
        from stif_tpu.train.trainer import (
            TrainConfig, create_train_state, make_train_step,
        )

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 2, 8, 8, 3)), jnp.float32)
        gt = jnp.asarray(rng.random((2, 2, 32, 32, 3)), jnp.float32)
        times = jnp.asarray([0.0, 0.5])
        params = model.init(jax.random.PRNGKey(0), x, times,
                            method=model.full_init)
        cfg = TrainConfig(lr=1e-3, warmup_iter=-1)
        state, tx = create_train_state(params, cfg)
        step = jax.jit(make_train_step(model, tx, cfg))
        batch = {"lqs": x, "gt": gt, "times": times}
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_per_sample_times_supervision(self):
        """(B, nt) times: each sample's loss must depend on its OWN times —
        the reference semantics (Sakuya_arch.py:396 + feed_data's per-sample
        time list). Gradient flow to times' pe path must differ between
        per-sample and row-0-truncated batches."""
        from stif_tpu.models import LunaTokis
        from stif_tpu.train.trainer import (
            TrainConfig, create_train_state, make_train_step,
        )

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((2, 2, 8, 8, 3)), jnp.float32)
        gt = jnp.asarray(rng.random((2, 2, 32, 32, 3)), jnp.float32)
        times_ps = jnp.asarray([[0.0, 0.5], [0.9, 0.2]])  # (B, nt) distinct
        params = model.init(jax.random.PRNGKey(0), x, times_ps,
                            method=model.full_init)
        cfg = TrainConfig(lr=1e-3, warmup_iter=-1)
        state, tx = create_train_state(params, cfg)
        step = jax.jit(make_train_step(model, tx, cfg))
        _, m_ps = step(state, {"lqs": x, "gt": gt, "times": times_ps})
        _, m_row0 = step(state, {"lqs": x, "gt": gt, "times": times_ps[0]})
        assert np.isfinite(m_ps["loss"])
        # distinct per-sample times change the loss vs truncating to row 0
        assert abs(float(m_ps["loss"]) - float(m_row0["loss"])) > 1e-6


class TestGradClip:
    def test_clip_bounds_update_norm(self):
        """train.grad_clip: global-norm clipping caps the effective gradient
        the optimizer consumes; without it the same huge gradient produces a
        (warmup-scaled) full-size Adam step. Chain layout without clipping is
        unchanged (old opt_states stay restorable)."""
        import optax

        from stif_tpu.train.trainer import TrainConfig, make_optimizer

        p = {"w": jnp.zeros((8,))}
        g = {"w": jnp.full((8,), 1e8)}

        cfg0 = TrainConfig(T_period=(100,), restarts=(), restart_weights=())
        tx0, _ = make_optimizer(cfg0)
        assert len(tx0.init(p)) == 2  # adam + schedule only

        cfg = TrainConfig(T_period=(100,), restarts=(), restart_weights=(),
                          grad_clip=1.0)
        tx, _ = make_optimizer(cfg)
        st = tx.init(p)
        assert len(st) == 3  # clip + adam + schedule
        up, _ = tx.update(g, st, p)
        # clipped g has norm 1 -> adam normalizes to ~unit update * lr
        n = float(optax.global_norm(up))
        assert n <= cfg.lr * np.sqrt(8) * 1.2

        # clipping is a no-op for small grads (exact same update as cfg0)
        g_small = {"w": jnp.linspace(0.1, 0.2, 8)}
        up_a, _ = tx.update(g_small, tx.init(p), p)
        up_b, _ = tx0.update(g_small, tx0.init(p), p)
        np.testing.assert_allclose(np.asarray(up_a["w"]),
                                   np.asarray(up_b["w"]), rtol=1e-7)
