"""Model variants, factory dispatch, and the VideoSR training facade."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full models: minutes on the 1-core CI host

import jax
import jax.numpy as jnp

from stif_tpu.models import LunaTokis, TMNet
from stif_tpu.models.factory import define_g
from stif_tpu.models.luna_tokis_variants import (
    LunaTokisNoFlow,
    LunaTokisS,
    LunaTokisTrain,
    LunaTokisZSM,
)

TINY = dict(nf=8, groups=2, front_RBs=1, back_RBs=1)


def _x(rng, b=1, n=2, h=8, w=8):
    return jnp.asarray(rng.random((b, n, h, w, 3)).astype(np.float32))


class TestVariants:
    def test_zsm_fixed_x4(self, rng):
        m = LunaTokisZSM(**TINY)
        x = _x(rng)
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == (1, 3, 32, 32, 3)  # T = 2N-1 = 3

    def test_train_variant_fold_decoder(self, rng):
        m = LunaTokisTrain(**TINY)
        x = _x(rng)
        t = jnp.asarray([0.0, 0.5, 1.0])
        p = m.init(jax.random.PRNGKey(0), x, t)
        out = m.apply(p, x, t)
        assert out.shape == (3, 1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_noflow_variant(self, rng):
        m = LunaTokisNoFlow(**TINY)
        x = _x(rng)
        t = jnp.asarray([0.25])
        p = m.init(jax.random.PRNGKey(0), x, t)
        out = m.apply(p, x, t)
        assert out.shape == (1, 1, 32, 32, 3)

    def test_s_variant(self, rng):
        m = LunaTokisS(**TINY)
        x = _x(rng)
        t = jnp.asarray([0.25, 0.75])
        p = m.init(jax.random.PRNGKey(0), x, t)
        out = m.apply(p, x, t)
        assert out.shape == (2, 1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_local_ensemble_decode(self, rng):
        m = LunaTokis(**TINY)
        x = _x(rng)
        t = jnp.asarray([0.5])
        p = m.init(jax.random.PRNGKey(0), x, t)
        feat = m.apply(p, x, method=m.gen_feat)
        out = m.apply(p, feat, x, t, local_ensemble=True, method=m.decode)
        base = m.apply(p, feat, x, t, method=m.decode)
        assert out.shape == base.shape == (1, 1, 32, 32, 3)
        # ensemble blends shifted passes; result differs but stays close
        d = np.abs(np.asarray(out) - np.asarray(base)).mean()
        assert 0 < d < 1.0

    def test_zoom_decode(self, rng):
        m = LunaTokis(**TINY)
        x = _x(rng)
        t = jnp.asarray([0.5])
        p = m.init(jax.random.PRNGKey(0), x, t)
        feat = m.apply(p, x, method=m.gen_feat)
        out = m.apply(p, feat, x, t, (64, 64), (16, 16), (0.0, 0.0),
                      method=m.decode_zoom)
        assert out.shape == (1, 1, 16, 16, 3)

    def test_zoom_equals_full_decode_on_identity_window(self, rng):
        """Numeric oracle: a zoom window covering the whole canvas at
        center (0, 0) reproduces the full-grid cell lattice exactly, so
        decode_zoom must equal the plain decode."""
        m = LunaTokis(**TINY)
        x = _x(rng)
        t = jnp.asarray([0.25, 0.75])
        p = m.init(jax.random.PRNGKey(0), x, t)
        feat = m.apply(p, x, method=m.gen_feat)
        want = m.apply(p, feat, x, t, method=m.decode)
        got = m.apply(p, feat, x, t, (32, 32), (32, 32), (0.0, 0.0),
                      method=m.decode_zoom)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


class TestFactory:
    @pytest.mark.parametrize("which,cls", [
        ("LIIF", LunaTokis), ("LunaTokis", LunaTokisZSM),
        ("TMNet", TMNet), ("LIIF_train", LunaTokisTrain),
        ("LIIF_noflow", LunaTokisNoFlow), ("LIIF_S", LunaTokisS),
    ])
    def test_dispatch(self, which, cls):
        opt = {"network_G": {"which_model_G": which, "nf": 8, "groups": 2,
                             "front_RBs": 1, "back_RBs": 1, "nframes": 6}}
        assert isinstance(define_g(opt), cls)

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            define_g({"network_G": {"which_model_G": "nope"}})

    def test_registry_mlp(self):
        """The LIIF registry's 'mlp' ReLU model (reference mlp.py:7-30)."""
        import jax
        import jax.numpy as jnp

        from stif_tpu.models import make_model

        m = make_model("mlp", out_dim=3, hidden_list=[16, 16])
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 10)))
        assert m.apply(p, jnp.ones((2, 5, 10))).shape == (2, 5, 3)


class TestFacade:
    @pytest.mark.slow
    def test_train_and_checkpoint_roundtrip(self, rng, tmp_path):
        from stif_tpu.train.video_sr_model import VideoSRModel

        opt = {
            "model": "VideoSR_base",
            "is_train": True,
            "network_G": {"which_model_G": "LIIF", "nf": 8, "groups": 2,
                          "front_RBs": 1, "back_RBs": 1, "nframes": 6},
            "train": {"lr_G": 1e-3, "T_period": [100, 100],
                      "restarts": [100], "restart_weights": [1]},
            "path": {"models": str(tmp_path / "models")},
        }
        model = VideoSRModel(opt)
        lqs = rng.random((1, 2, 8, 8, 3)).astype(np.float32)
        gt = rng.random((1, 2, 32, 32, 3)).astype(np.float32)
        times = np.asarray([0.0, 0.5], np.float32)
        model.init_params(lqs, times)
        model.feed_data({"LQs": lqs, "GT": gt, "times": times})
        losses = [model.optimize_parameters()["loss"] for _ in range(10)]
        assert np.mean(losses[-3:]) < losses[0]

        step = model.save()
        state_before = jax.tree.leaves(model.state.params)[0]
        model.optimize_parameters()
        resumed = model.resume_training(step)
        assert resumed == step
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(model.state.params)[0]),
            np.asarray(state_before),
        )

        out = model.test()
        assert out.shape == (2, 1, 32, 32, 3)

    @pytest.mark.slow
    def test_ema_tracks_and_survives_resume(self, rng, tmp_path):
        """train.ema_decay keeps a params EMA outside TrainState: it lags the
        raw params, checkpoints as a sibling ema_params_<step> snapshot, and
        resume restores it exactly."""
        from stif_tpu.train.video_sr_model import VideoSRModel

        opt = {
            "model": "VideoSR_base",
            "is_train": True,
            "network_G": {"which_model_G": "LIIF", "nf": 8, "groups": 2,
                          "front_RBs": 1, "back_RBs": 1, "nframes": 6},
            "train": {"lr_G": 1e-3, "T_period": [100, 100],
                      "restarts": [100], "restart_weights": [1],
                      "ema_decay": 0.9},
            "path": {"models": str(tmp_path / "models")},
        }
        model = VideoSRModel(opt)
        lqs = rng.random((1, 2, 8, 8, 3)).astype(np.float32)
        gt = rng.random((1, 2, 32, 32, 3)).astype(np.float32)
        times = np.asarray([0.0, 0.5], np.float32)
        model.init_params(lqs, times)
        model.feed_data({"LQs": lqs, "GT": gt, "times": times})
        p0 = np.asarray(jax.tree.leaves(model.state.params)[0])
        for _ in range(3):
            model.optimize_parameters()
        raw = np.asarray(jax.tree.leaves(model.state.params)[0])
        ema = np.asarray(jax.tree.leaves(model.ema_params)[0])
        # EMA lags: strictly between init and raw (elementwise mean gap)
        assert not np.allclose(ema, raw)
        assert np.abs(ema - p0).mean() < np.abs(raw - p0).mean()
        # checkpoint round-trip restores the EMA exactly
        step = model.save()
        ema_before = ema
        model.optimize_parameters()
        assert not np.allclose(
            np.asarray(jax.tree.leaves(model.ema_params)[0]), ema_before)
        model.resume_training(step)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(model.ema_params)[0]), ema_before)

    def test_from_torch_batch(self, rng):
        from stif_tpu.train.video_sr_model import from_torch_batch

        batch = {
            "LQs": rng.random((2, 2, 3, 8, 8)).astype(np.float32),
            "GT": rng.random((2, 3, 3, 32, 32)).astype(np.float32),
            # reference layout: list of nt tensors, each (B,)
            # (collate_function2, codes/data/__init__.py:153)
            "time": [np.asarray([0.0, 0.1]), np.asarray([0.5, 0.6]),
                     np.asarray([1.0, 0.9])],
        }
        out = from_torch_batch(batch)
        assert out["LQs"].shape == (2, 2, 8, 8, 3)
        assert out["GT"].shape == (2, 3, 32, 32, 3)
        # per-sample (B, nt): row b holds sample b's query times
        np.testing.assert_array_equal(
            out["times"], [[0.0, 0.5, 1.0], [0.1, 0.6, 0.9]])
