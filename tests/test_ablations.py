"""The Sakuya ablation family: preset smoke tests + mulfeat semantics.

Every remaining ``Sakuya_arch*`` reference file maps to a runnable preset
(VERDICT r1 item 6): test2/test3/test4/test5/nomul/single/continuous.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full models: minutes on the 1-core CI host

import jax
import jax.numpy as jnp

from stif_tpu.models.ablations import _PRESETS, make_ablation

TINY = dict(nf=8, groups=2, front_RBs=1, back_RBs=1)

# preset -> expected output channels of decode()
_OUT_CH = {"test3": 3, "test4": 3, "test5": 3, "nomul": 3, "single": 3,
           "continuous": 3, "test2": 3}


@pytest.mark.parametrize("preset", sorted(_PRESETS))
def test_preset_smoke(preset, rng):
    m = make_ablation(preset, **TINY)
    x = jnp.asarray(rng.random((1, 2, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray([0.25, 0.75])
    p = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(p, x, t)
    assert out.shape == (2, 1, 32, 32, _OUT_CH[preset])
    assert np.isfinite(np.asarray(out)).all()


def test_factory_dispatch():
    from stif_tpu.models.factory import define_g
    from stif_tpu.models.ablations import LunaTokisAblation

    m = define_g({"network_G": {"which_model_G": "LIIF_test4", "nf": 8,
                                "groups": 2, "front_RBs": 1, "back_RBs": 1,
                                "nframes": 6}})
    assert isinstance(m, LunaTokisAblation)
    assert m.stage_b == "hr_pe" and m.hr_ch == 64


class TestMulFeat:
    def test_windows_and_equivalence(self, rng):
        """decode_mulfeat = 3 overlapping pair-window decodes: each window's
        output must equal a direct _decode_window call on that window's
        feature maps (temporal maps (2fid, 2fid+1, 2fid+2))."""
        m = make_ablation("test4", **TINY)
        x = jnp.asarray(rng.random((1, 4, 8, 8, 3)).astype(np.float32))
        t = jnp.asarray([0.5])
        p = m.init(jax.random.PRNGKey(1), x, t)
        feat = m.apply(p, x, method=m.gen_feat)
        assert feat.shape[1] == 7  # 2N-1
        out = m.apply(p, feat, x, method=m.decode_mulfeat)
        # default window times [0,.5], [0,.5], [0,.5,1] -> 7 output frames
        assert out.shape == (7, 1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

        B, _, H, W = feat.shape[:4]
        inp_cat = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, -1)
        for fid, (lo, nt_w) in enumerate([(0, 2), (2, 2), (4, 3)]):
            fw = feat[:, 2 * fid:2 * fid + 3].transpose(0, 2, 3, 1, 4)
            fw = fw.reshape(B, H, W, -1)
            times_w = jnp.asarray([0.0, 0.5, 1.0][:nt_w])
            want = m.apply(p, fw, inp_cat, times_w, 32, 32,
                           method=m._decode_window)
            np.testing.assert_allclose(
                np.asarray(out[lo:lo + nt_w]), np.asarray(want), atol=1e-6)

    def test_mulfeat_requires_4_frames(self, rng):
        m = make_ablation("test4", **TINY)
        x = jnp.asarray(rng.random((1, 2, 8, 8, 3)).astype(np.float32))
        t = jnp.asarray([0.5])
        p = m.init(jax.random.PRNGKey(0), x, t)
        feat = m.apply(p, x, method=m.gen_feat)
        with pytest.raises(AssertionError):
            m.apply(p, feat, x, method=m.decode_mulfeat)


class TestAblationOracles:
    """Numeric parity for the test3 / test5 / continuous presets vs
    independent torch mirrors (VERDICT r2 item 8). test5's dims and wiring
    equal the train variant's (``Sakuya_arch_test5.py:303-308`` ==
    ``Sakuya_arch.py:303-308``), so it oracles against the existing
    ``LunaTokisTrain`` mirror; test3 / continuous get their own mirrors
    (``tools/torch_mirror.py``)."""

    CFG = dict(nf=16, groups=4, front_RBs=2, back_RBs=2)

    def _run(self, rng, preset, mirror_name):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        import torch
        import torch_mirror

        mirror_cls = getattr(torch_mirror, mirror_name)
        model = make_ablation(preset, **self.CFG)
        x = rng.random((1, 2, 3, 8, 8)).astype(np.float32)
        times_np = np.asarray([0.0, 0.4, 1.0], np.float32)
        xj = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
        tj = jnp.asarray(times_np)
        params = model.init(jax.random.PRNGKey(5), xj, tj)
        mirror = mirror_cls(**self.CFG)
        torch_mirror.load_flax_params(mirror, params)
        mirror.eval()
        with torch.no_grad():
            want = mirror(torch.from_numpy(x),
                          [torch.tensor(t) for t in times_np])
            want = np.stack([w.numpy() for w in want])
        got = np.asarray(model.apply(params, xj, tj)).transpose(0, 1, 4, 2, 3)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_test3(self, rng):
        self._run(rng, "test3", "LunaTokisAbl3")

    def test_test4(self, rng):
        self._run(rng, "test4", "LunaTokisAbl4")

    def test_test5(self, rng):
        self._run(rng, "test5", "LunaTokisTrain")

    def test_single(self, rng):
        self._run(rng, "single", "LunaTokisAblSingle")

    def test_continuous(self, rng):
        self._run(rng, "continuous", "LunaTokisAblCont")

    def test_nomul_is_test4(self):
        """``Sakuya_arch_test_nomul.py`` declares the same model as
        ``_test4.py`` (byte-identical dims/wiring) — the preset table must
        keep them equal so the test4 oracle covers both."""
        from stif_tpu.models.ablations import _PRESETS

        assert _PRESETS["nomul"] == _PRESETS["test4"]
