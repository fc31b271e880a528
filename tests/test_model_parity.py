"""End-to-end model parity: flax LunaTokis vs the independent torch mirror.

The mirror (tools/torch_mirror.py) implements the reference semantics with
torch's own grid_sample/interpolate kernels; identical weights flow through
``stif_tpu.convert``. This replaces per-module activation recording against
``latest_G.pth`` (the checkpoint blob is stripped from the reference repo —
SURVEY.md §6, build plan step 4 fallback).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full models: minutes on the 1-core CI host
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from stif_tpu.models import LunaTokis
import torch_mirror


CFG = dict(nf=16, nframes=6, groups=4, front_RBs=2, back_RBs=2)
H = W = 8


@pytest.fixture(scope="module")
def pair():
    """(flax model, params, torch mirror with identical weights)."""
    model = LunaTokis(**CFG)
    x = jnp.zeros((1, 2, H, W, 3))
    times = jnp.asarray([0.0, 0.5])
    params = model.init(jax.random.PRNGKey(42), x, times,
                        method=model.full_init)
    mirror = torch_mirror.LunaTokis(**CFG)
    torch_mirror.load_flax_params(mirror, params)
    mirror.eval()
    return model, params, mirror


def _rand_clip(rng, b=1, n=2):
    return rng.random((b, n, 3, H, W)).astype(np.float32)


class TestEncoderParity:
    def test_gen_feat(self, pair, rng):
        model, params, mirror = pair
        x = _rand_clip(rng)
        with torch.no_grad():
            mirror.gen_feat(torch.from_numpy(x))
            want = mirror.feat.numpy()  # (B, T, C, H, W)
        got = model.apply(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                          method=model.gen_feat)
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestFullParity:
    @pytest.mark.parametrize("test_mode", [False, True])
    def test_forward(self, pair, rng, test_mode):
        model, params, mirror = pair
        x = _rand_clip(rng)
        times_np = np.asarray([0.0, 0.25, 1.0], np.float32)
        with torch.no_grad():
            want = mirror(
                torch.from_numpy(x),
                [torch.tensor(t) for t in times_np],
                scale=4 if test_mode else None,
                test=test_mode,
            )
            want = np.stack([w.numpy() for w in want])  # (nt, B, 3, HH, WW)
        got = model.apply(
            params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(times_np), test=test_mode,
        )
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_per_sample_times(self, pair, rng):
        """(B, nt) per-sample time conditioning matches the reference
        semantics (``Sakuya_arch.py:396``: pe broadcast from times[c] (B,1))
        — the mirror receives each time as a (B, 1, 1) tensor."""
        model, params, mirror = pair
        B = 2
        x = _rand_clip(rng, b=B)
        times_np = np.asarray([[0.1, 0.9], [0.6, 0.3]], np.float32)  # (B, nt)
        with torch.no_grad():
            want = mirror(
                torch.from_numpy(x),
                [torch.from_numpy(times_np[:, c]).view(B, 1, 1)
                 for c in range(times_np.shape[1])],
            )
            want = np.stack([w.numpy() for w in want])  # (nt, B, 3, HH, WW)
        got = model.apply(
            params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(times_np),
        )
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)
        # and each sample must differ from a batch-shared decode at row 0
        shared = model.apply(
            params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(times_np[0]),
        )
        shared = np.asarray(shared).transpose(0, 1, 4, 2, 3)
        np.testing.assert_allclose(got[:, 0], shared[:, 0], atol=5e-5)
        # random-init models are only weakly time-sensitive; 5e-4 >> the 5e-5
        # numerical tolerance is enough to prove row 1's times were used
        assert np.abs(got[:, 1] - shared[:, 1]).max() > 5e-4

    def test_local_ensemble(self, pair, rng):
        """Numeric oracle for ``decode(local_ensemble=True)`` vs the
        reference's shifted-pass area blend with diagonal swap
        (``Sakuya_arch_test.py:962-1085``)."""
        model, params, mirror = pair
        x = _rand_clip(rng)
        times_np = np.asarray([0.3, 0.8], np.float32)
        with torch.no_grad():
            mirror.gen_feat(torch.from_numpy(x))
            want = mirror.decoding_localensemble(
                [torch.tensor(t) for t in times_np])
            want = np.stack([w.numpy() for w in want])
        got = model.apply(
            params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(times_np), local_ensemble=True,
        )
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_legacy_pixelshuffle_head(self, pair, rng):
        model, params, mirror = pair
        x = _rand_clip(rng)
        with torch.no_grad():
            mirror.gen_feat(torch.from_numpy(x))
            f = mirror.feat
            B, T, C, Hf, Wf = f.shape
            z = f.view(-1, C, Hf, Wf)
            z = torch_mirror.lrelu(F_pixel_shuffle(mirror.upconv1(z), 2))
            z = torch_mirror.lrelu(F_pixel_shuffle(mirror.upconv2(z), 2))
            z = mirror.conv_last(torch_mirror.lrelu(mirror.HRconv(z)))
            want = z.view(B, T, 3, 4 * Hf, 4 * Wf).numpy()
        feat = model.apply(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                           method=model.gen_feat)
        got = model.apply(params, feat, method=model.decode_pixelshuffle)
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        np.testing.assert_allclose(got, want, atol=2e-5)


def F_pixel_shuffle(x, r):
    return torch.nn.functional.pixel_shuffle(x, r)


class TestTrainVariantParity:
    """LunaTokisTrain (fold-27 patch decoder, ``Sakuya_arch.py:359-459``)
    vs an independent torch mirror with ``F.fold``."""

    CFG = dict(nf=16, nframes=7, groups=4, front_RBs=2, back_RBs=2)

    def test_forward(self, rng):
        from stif_tpu.models.luna_tokis_variants import LunaTokisTrain

        model = LunaTokisTrain(**self.CFG)
        x = rng.random((1, 2, 3, H, W)).astype(np.float32)
        times_np = np.asarray([0.0, 0.4, 1.0], np.float32)
        params = model.init(jax.random.PRNGKey(3),
                            jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                            jnp.asarray(times_np))
        mirror = torch_mirror.LunaTokisTrain(**self.CFG)
        torch_mirror.load_flax_params(mirror, params)
        mirror.eval()
        with torch.no_grad():
            want = mirror(torch.from_numpy(x),
                          [torch.tensor(t) for t in times_np])
            want = np.stack([w.numpy() for w in want])
        got = model.apply(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                          jnp.asarray(times_np))
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestTMNetParity:
    """TMNet vs the independent torch mirror (reference semantics of
    ``codes/models/modules/STVSR.py``: TMB-modulated PCD, per-time PCD loop,
    non-linear comparison refinement, trunk residual, x4 head)."""

    CFG = dict(nf=16, nframes=3, groups=4, front_RBs=2, back_RBs=2)

    @pytest.fixture(scope="class")
    def tm_pair(self):
        from stif_tpu.models import TMNet

        model = TMNet(**self.CFG)
        x = jnp.zeros((1, 2, H, W, 3))
        t = jnp.asarray([[0.25, 0.75]])
        params = model.init(jax.random.PRNGKey(7), x, t)
        mirror = torch_mirror.TMNet(**self.CFG)
        torch_mirror.load_flax_params(mirror, params)
        mirror.eval()
        return model, params, mirror

    def test_forward_timed(self, tm_pair, rng):
        model, params, mirror = tm_pair
        x = rng.random((2, 2, 3, H, W)).astype(np.float32)
        t = np.asarray([[0.25, 0.75], [0.5, 0.125]], np.float32)
        with torch.no_grad():
            want = mirror(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = model.apply(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                          jnp.asarray(t))
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape  # (B, 1 + t_N + 1, 3, 4H, 4W)
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_forward_untimed(self, tm_pair, rng):
        """t=None: plain ZSM interleaving (STVSR.py:413-416)."""
        model, params, mirror = tm_pair
        x = rng.random((1, 2, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            want = mirror(torch.from_numpy(x), None).numpy()
        got = model.apply(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                          None)
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestSVariantParity:
    """LunaTokisS (no feat_imnet; flow from encoder features, time-free
    stage D — ``Sakuya_arch_test_S.py:305-308``) vs torch mirror."""

    CFG = dict(nf=16, nframes=6, groups=4, front_RBs=2, back_RBs=2)

    def test_forward(self, rng):
        from stif_tpu.models.luna_tokis_variants import LunaTokisS

        model = LunaTokisS(**self.CFG)
        x = rng.random((1, 2, 3, H, W)).astype(np.float32)
        times_np = np.asarray([0.0, 0.5, 1.0], np.float32)
        params = model.init(jax.random.PRNGKey(5),
                            jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                            jnp.asarray(times_np))
        mirror = torch_mirror.LunaTokisS(**self.CFG)
        torch_mirror.load_flax_params(mirror, params)
        mirror.eval()
        with torch.no_grad():
            want = np.stack([w.numpy() for w in mirror(
                torch.from_numpy(x), [torch.tensor(t) for t in times_np])])
        got = model.apply(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                          jnp.asarray(times_np))
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestNoFlowParity:
    """LunaTokisNoFlow (single feat_imnet 201->3 pure-LIIF decode —
    ``Sakuya_arch_test_noflow.py:303-304``) vs torch mirror."""

    CFG = dict(nf=16, nframes=6, groups=4, front_RBs=2, back_RBs=2)

    def test_forward(self, rng):
        from stif_tpu.models.luna_tokis_variants import LunaTokisNoFlow

        model = LunaTokisNoFlow(**self.CFG)
        x = rng.random((1, 2, 3, H, W)).astype(np.float32)
        times_np = np.asarray([0.25, 0.75], np.float32)
        params = model.init(jax.random.PRNGKey(6),
                            jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                            jnp.asarray(times_np))
        mirror = torch_mirror.LunaTokisNoFlow(**self.CFG)
        torch_mirror.load_flax_params(mirror, params)
        mirror.eval()
        with torch.no_grad():
            want = np.stack([w.numpy() for w in mirror(
                torch.from_numpy(x), [torch.tensor(t) for t in times_np])])
        got = model.apply(params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                          jnp.asarray(times_np))
        got = np.asarray(got).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)
