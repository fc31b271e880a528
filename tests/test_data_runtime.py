"""Data pipeline and inference runtime tests on synthetic folder trees."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stif_tpu.data import (
    AdobeArbitraryDataset,
    AdobeDataset,
    DataLoader,
    ShardedIterSampler,
    Vimeo7Dataset,
    collate_arbitrary_scale,
    collate_fixed,
)
from stif_tpu.runtime import InferencePipeline, pad_to_multiple, window_plan


def _write_png(path, arr):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, arr)


@pytest.fixture(scope="module")
def vimeo_root(tmp_path_factory):
    gt_root = tmp_path_factory.mktemp("vimeo_gt")
    lq_root = tmp_path_factory.mktemp("vimeo_lq")
    rng = np.random.default_rng(0)
    for a in ["00001"]:
        for b in ["0001", "0002"]:
            for i in range(1, 8):
                img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
                _write_png(str(gt_root / a / b / f"im{i}.png"), img)
                _write_png(str(lq_root / a / b / f"im{i}.png"), img[::4, ::4])
    return str(gt_root), str(lq_root)


@pytest.fixture(scope="module")
def adobe_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("adobe")
    rng = np.random.default_rng(1)
    for v in ["vid1"]:
        for i in range(12):
            img = (rng.random((160, 200, 3)) * 255).astype(np.uint8)
            _write_png(str(root / v / f"{i}.png"), img)
    return str(root)


class TestVimeo7:
    def test_sample_shapes(self, vimeo_root):
        gt_root, lq_root = vimeo_root
        ds = Vimeo7Dataset(gt_root, lq_root, n_frames=7, gt_size=16, scale=4,
                           seed=0)
        assert len(ds) == 2
        s = ds[0]
        assert s["GT"].shape == (7, 16, 16, 3)
        assert s["LQs"].shape == (4, 4, 4, 3)
        assert s["times"].shape == (7,)
        batch = collate_fixed([ds[0], ds[1]])
        assert batch["GT"].shape == (2, 7, 16, 16, 3)
        # per-sample (B, nt) layout; Vimeo7 rows are identical
        assert batch["times"].shape == (2, 7)
        np.testing.assert_array_equal(batch["times"][0], batch["times"][1])


class TestAdobe:
    def test_fixed_dataset(self, adobe_root):
        ds = AdobeDataset(adobe_root, gt_size=32, scale=4, seed=0)
        assert len(ds) == 4  # 12 frames -> windows at index 0..3
        s = ds[0]
        assert s["LQs"].shape == (2, 8, 8, 3)
        assert s["GT"].shape == (1, 32, 32, 3)
        assert 0.0 <= float(s["times"][0]) <= 1.0

    def test_arbitrary_collate(self, adobe_root):
        ds = AdobeArbitraryDataset(adobe_root, seed=0)
        import random as _r

        batch = collate_arbitrary_scale([ds[0], ds[1]], lq_size=32,
                                        scale_buckets=[2.0, 3.0],
                                        rng=_r.Random(0))
        B, N, h, w, C = batch["LQs"].shape
        assert (B, N, C) == (2, 2, 3)
        assert batch["GT"].shape[0] == 2 and batch["GT"].shape[1] == 3
        # LQ spatial size = gt_size/(2d); GT out = gt_size/2 -> ratio d
        assert batch["GT"].shape[2] // h in (2, 3)
        assert batch["times"].shape == (2, 3)
        assert batch["LQs"].max() <= 1.0


class TestLoader:
    def test_sharded_sampler_partitions(self):
        s0 = ShardedIterSampler(10, ratio=2, world_size=2, rank=0, seed=1)
        s1 = ShardedIterSampler(10, ratio=2, world_size=2, rank=1, seed=1)
        i0, i1 = s0.epoch_indices(3), s1.epoch_indices(3)
        assert len(i0) == len(i1) == 10
        assert (i0 < 10).all() and (i1 < 10).all()
        # different epochs give different orders
        assert not np.array_equal(i0, s0.epoch_indices(4))

    def test_loader_iterates(self, vimeo_root):
        gt_root, lq_root = vimeo_root
        ds = Vimeo7Dataset(gt_root, lq_root, n_frames=7, gt_size=16, scale=4,
                           seed=0)
        dl = DataLoader(ds, batch_size=2, collate=collate_fixed,
                        num_workers=1, drop_last=True)
        batches = list(dl.epoch(0))
        assert len(batches) == 1
        assert batches[0]["LQs"].shape[0] == 2


class TestRuntime:
    def test_pad_to_multiple(self):
        x = np.zeros((2, 15, 17, 3))
        p, (h, w) = pad_to_multiple(x, 4)
        assert p.shape == (2, 16, 20, 3) and (h, w) == (15, 17)

    def test_window_plan_reference_examples(self):
        # docstring examples of test_index_generation (utils/util.py:280-284)
        assert window_plan(False, 3, 5) == [
            [[0, 1], [0, 1, 2]], [[1, 2], [2, 3, 4]],
            [[2, 3], [4, 5, 6]], [[3, 4], [6, 7, 8]],
        ]
        assert window_plan(True, 3, 5) == [[[0, 2], [0, 1, 2]], [[2, 4], [2, 3, 4]]]

    @pytest.mark.slow
    def test_pipeline_render(self):
        from stif_tpu.models import LunaTokis

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        rng = np.random.default_rng(0)
        x = jnp.zeros((1, 2, 16, 16, 3))
        times = jnp.asarray([0.0, 0.5])
        params = model.init(jax.random.PRNGKey(0), x, times,
                            method=model.full_init)
        pipe = InferencePipeline(model, params, scale=4, bucket=8)
        frames = rng.random((3, 10, 14, 3)).astype(np.float32)
        out = pipe.render_window(frames[:2], [0.0, 0.5])
        assert out.shape == (2, 40, 56, 3)
        outs = pipe.render_sequence(frames, n_times=2)
        assert len(outs) == 2 and outs[0].shape == (2, 40, 56, 3)
        # shape bucketing: same padded bucket reuses the compiled program
        assert len(pipe._cache) == 1


class TestChunkedDecoder:
    @pytest.mark.slow
    def test_time_split_decode_equality(self, rng):
        """decode over split time sets == decode over all times.

        The property bench.py's B=2 "tsplit" batched mode relies on: the
        B=2 nt=8 full-decode program exceeds the axon remote-compile
        helper, so decode runs as two nt/2 dispatches; times must be fully
        independent through the decoder (the time axis folds into batch,
        luna_tokis._decode_pass)."""
        from stif_tpu.models import LunaTokis

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        x = jnp.asarray(rng.random((2, 2, 8, 12, 3)).astype(np.float32))
        times = jnp.asarray([0.0, 0.25, 0.5, 1.0])
        params = model.init(jax.random.PRNGKey(0), x, times,
                            method=model.full_init)
        feat = model.apply(params, x, method=model.gen_feat)
        want = np.asarray(model.apply(params, feat, x, times,
                                      method=model.decode))
        got = np.concatenate([
            np.asarray(model.apply(params, feat, x, times[:2],
                                   method=model.decode)),
            np.asarray(model.apply(params, feat, x, times[2:],
                                   method=model.decode)),
        ], axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.slow
    def test_matches_direct_decode(self, rng):
        from stif_tpu.models import LunaTokis
        from stif_tpu.runtime.chunked import ChunkedDecoder

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        x = jnp.asarray(rng.random((1, 2, 8, 12, 3)).astype(np.float32))
        times = jnp.asarray([0.0, 0.5, 1.0])
        params = model.init(jax.random.PRNGKey(0), x, times,
                            method=model.full_init)
        feat = model.apply(params, x, method=model.gen_feat)
        want = np.asarray(model.apply(params, feat, x, times,
                                      method=model.decode))
        # chunk size that doesn't divide Q (32*48=1536; 500 -> 4 chunks, pad)
        dec = ChunkedDecoder(model, params, chunk_size=500)
        got = dec.decode(feat, x, times, (32, 48))
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.slow
    def test_matches_direct_decode_stagec_nearest(self, rng):
        """ChunkedDecoder must honor stagec_nearest exactly like the
        full-grid decode (same nearest gathers for the wide feat component)
        rather than silently falling back to bilinear."""
        from stif_tpu.models import LunaTokis
        from stif_tpu.runtime.chunked import ChunkedDecoder

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1,
                          stagec_nearest=True)
        x = jnp.asarray(rng.random((1, 2, 8, 12, 3)).astype(np.float32))
        times = jnp.asarray([0.0, 0.5, 1.0])
        params = model.init(jax.random.PRNGKey(0), x, times,
                            method=model.full_init)
        feat = model.apply(params, x, method=model.gen_feat)
        want = np.asarray(model.apply(params, feat, x, times,
                                      method=model.decode))
        # sanity: the knob actually changes the output vs the bilinear form
        plain = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        bil = np.asarray(plain.apply(params, feat, x, times,
                                     method=plain.decode))
        assert float(np.max(np.abs(want - bil))) > 0.0
        dec = ChunkedDecoder(model, params, chunk_size=500)
        got = dec.decode(feat, x, times, (32, 48))
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.slow
    def test_test_mode_variant(self, rng):
        from stif_tpu.models import LunaTokis
        from stif_tpu.runtime.chunked import ChunkedDecoder

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        x = jnp.asarray(rng.random((1, 2, 8, 8, 3)).astype(np.float32))
        times = jnp.asarray([0.5])
        params = model.init(jax.random.PRNGKey(0), x, times,
                            method=model.full_init)
        feat = model.apply(params, x, method=model.gen_feat)
        want = np.asarray(model.apply(params, feat, x, times,
                                      hr_inp_upsample=True,
                                      method=model.decode))
        dec = ChunkedDecoder(model, params, chunk_size=256)
        got = dec.decode(feat, x, times, (32, 32), hr_inp_upsample=True)
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.slow
    def test_mesh_parallel_dispatch(self, rng):
        """Device-parallel chunks over the 8-device CPU mesh equal the
        single-device chunked (and direct) decode."""
        from stif_tpu.models import LunaTokis
        from stif_tpu.parallel.mesh import make_mesh
        from stif_tpu.runtime.chunked import ChunkedDecoder

        mesh = make_mesh({"model": 8})
        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        x = jnp.asarray(rng.random((1, 2, 8, 12, 3)).astype(np.float32))
        times = jnp.asarray([0.0, 0.5])
        params = model.init(jax.random.PRNGKey(0), x, times,
                            method=model.full_init)
        feat = model.apply(params, x, method=model.gen_feat)
        want = np.asarray(model.apply(params, feat, x, times,
                                      method=model.decode))
        # Q = 32*48 = 1536; chunk 128 x 8 devices = 1024/superstep -> 2 steps
        dec = ChunkedDecoder(model, params, chunk_size=128, mesh=mesh)
        assert dec.n_par == 8
        got = dec.decode(feat, x, times, (32, 48))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestTMNetPipeline:
    @pytest.mark.slow
    def test_render_window_tmnet(self, rng):
        from stif_tpu.models import TMNet
        from stif_tpu.runtime import InferencePipeline

        model = TMNet(nf=8, groups=2, front_RBs=1, back_RBs=1)
        x = jnp.zeros((1, 2, 8, 8, 3))
        t = jnp.asarray([[0.25, 0.75]])
        params = model.init(jax.random.PRNGKey(0), x, t)
        pipe = InferencePipeline(model, params, bucket=4)
        frames = rng.random((2, 10, 14, 3)).astype(np.float32)
        out = pipe.render_window_tmnet(frames, [0.25, 0.75])
        # T = 1 + t_N + 1 = 4 outputs at fixed x4
        assert out.shape == (4, 40, 56, 3)


class TestBatchedPairs:
    @pytest.mark.slow
    def test_render_pairs_matches_per_pair(self, rng):
        from stif_tpu.models import LunaTokis
        from stif_tpu.runtime import InferencePipeline

        model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
        x = jnp.zeros((1, 2, 8, 8, 3))
        params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0.5]),
                            method=model.full_init)
        pipe = InferencePipeline(model, params, scale=4, bucket=4)
        pairs = rng.random((2, 2, 8, 12, 3)).astype(np.float32)
        out = pipe.render_pairs(pairs, [0.0, 0.5], chunk_size=512)
        assert out.shape == (2, 2, 32, 48, 3)
        for b in range(2):
            want = pipe.render_window(pairs[b], [0.0, 0.5])
            np.testing.assert_allclose(out[b], want, atol=3e-5)


class TestTensorBoardWriter:
    def test_roundtrip_and_crc(self, tmp_path):
        from stif_tpu.utils.tb import TBWriter, read_events, crc32c

        # RFC 3720 known-answer vectors
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        w = TBWriter(str(tmp_path))
        w.add_scalar("train/loss", 1.5, 10)
        w.add_scalar("train/psnr", 30.25, 20)
        w.close()
        evs = read_events(w.path)
        assert evs[0]["file_version"] == "brain.Event:2"
        assert evs[1] == {**evs[1], "tag": "train/loss", "step": 10}
        assert abs(evs[1]["value"] - 1.5) < 1e-6
        assert abs(evs[2]["value"] - 30.25) < 1e-6


def test_self_ensemble_transform_inverse_pairing():
    """x8 geometric self-ensemble: for a transform-equivariant renderer
    (nearest x4 upscale commutes with flips/transpose), the ensemble must
    equal the raw output exactly — proving each dihedral transform is
    inverted correctly on the way out."""
    from stif_tpu.runtime.pipeline import InferencePipeline

    pipe = InferencePipeline.__new__(InferencePipeline)
    pipe.self_ensemble = True
    pipe.scale = 4

    def raw(frames, times):
        return np.stack([np.repeat(np.repeat(frames[0], 4, 0), 4, 1)
                         for _ in times])

    pipe._render_window_raw = raw
    rng = np.random.default_rng(0)
    frames = rng.random((2, 12, 16, 3)).astype(np.float32)
    want = raw(frames, [0.0, 0.5])
    got = pipe.render_window(frames, [0.0, 0.5])
    np.testing.assert_allclose(got, want, atol=1e-6)


class TestRgbSkip:
    """``rgb_skip=True``: stage D adds the time-blended warped-input samples
    (a training-recipe residual head; default off = reference semantics)."""

    @pytest.mark.slow
    def test_skip_is_convex_blend_of_input(self, rng):
        from stif_tpu.models import LunaTokis
        from stif_tpu.runtime.chunked import ChunkedDecoder

        kw = dict(nf=8, groups=2, front_RBs=1, back_RBs=1)
        base = LunaTokis(**kw)
        skip = LunaTokis(rgb_skip=True, **kw)
        x = jnp.asarray(0.25 + 0.5 * rng.random((1, 2, 8, 12, 3)
                                                ).astype(np.float32))
        times = jnp.asarray([0.0, 0.5, 1.0])
        params = base.init(jax.random.PRNGKey(0), x, times,
                           method=base.full_init)
        feat = base.apply(params, x, method=base.gen_feat)
        out_b = np.asarray(base.apply(params, feat, x, times,
                                      method=base.decode))
        out_s = np.asarray(skip.apply(params, feat, x, times,
                                      method=skip.decode))
        # the added term is a convex time-blend of bilinear samples of the
        # input (values in [0.25, 0.75]; border queries blend with the
        # zero padding) — bounded by [0, input max]
        diff = out_s - out_b
        assert diff.min() >= -1e-5 and diff.max() <= 0.75 + 1e-5
        assert np.abs(diff).mean() > 0.1  # and actually present

        # chunked decode applies the same skip (stage C+D path)
        dec = ChunkedDecoder(skip, params, chunk_size=500)
        got = dec.decode(feat, x, times, (32, 48))
        np.testing.assert_allclose(got, out_s, atol=2e-5)

    def test_factory_plumbs_flag(self):
        from stif_tpu.models.factory import define_g

        net = dict(which_model_G="LIIF", nf=8, groups=2, front_RBs=1,
                   back_RBs=1, rgb_skip=True)
        assert define_g({"network_G": net}).rgb_skip is True
        net.pop("rgb_skip")
        assert define_g({"network_G": net}).rgb_skip is False
        net["rgb_skip"] = "bicubic"
        m = define_g({"network_G": net})
        assert m.rgb_skip is True and m.rgb_skip_bicubic is True

    @pytest.mark.slow
    def test_bicubic_skip_chunked_equals_full(self, rng):
        """rgb_skip_bicubic: same params (warm-start compatible), output
        differs from the bilinear skip, and the chunked path gathers the
        same bicubic source as the full decode."""
        from stif_tpu.models import LunaTokis
        from stif_tpu.runtime.chunked import ChunkedDecoder

        kw = dict(nf=8, groups=2, front_RBs=1, back_RBs=1)
        lin = LunaTokis(rgb_skip=True, **kw)
        bic = LunaTokis(rgb_skip=True, rgb_skip_bicubic=True, **kw)
        x = jnp.asarray(0.25 + 0.5 * rng.random((1, 2, 8, 12, 3)
                                                ).astype(np.float32))
        times = jnp.asarray([0.0, 0.5, 1.0])
        params = lin.init(jax.random.PRNGKey(0), x, times,
                          method=lin.full_init)
        # identical param trees: the flag adds no params
        p2 = bic.init(jax.random.PRNGKey(0), x, times, method=bic.full_init)
        assert jax.tree.structure(params) == jax.tree.structure(p2)

        feat = lin.apply(params, x, method=lin.gen_feat)
        out_lin = np.asarray(lin.apply(params, feat, x, times,
                                       method=lin.decode))
        out_bic = np.asarray(bic.apply(params, feat, x, times,
                                       method=bic.decode))
        assert np.abs(out_bic - out_lin).mean() > 1e-4  # flag does something
        assert np.isfinite(out_bic).all()

        dec = ChunkedDecoder(bic, params, chunk_size=500)
        got = dec.decode(feat, x, times, (32, 48))
        np.testing.assert_allclose(got, out_bic, atol=2e-5)

        # non-integer out_size works (arbitrary-scale protocol)
        o = bic.apply(params, feat, x, jnp.asarray([0.3]), out_size=(20, 30),
                      method=bic.decode)
        assert o.shape == (1, 1, 20, 30, 3) and bool(jnp.isfinite(o).all())

    def test_imresize_to_matches_imresize(self, rng):
        from stif_tpu.ops.resize import imresize, imresize_to

        img = rng.random((6, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(imresize_to(img, (24, 32))),
            np.asarray(imresize(img, 4.0)), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(imresize_to(img, (3, 4))),
            np.asarray(imresize(img, 0.5)), atol=1e-6)
        # non-uniform target just works
        assert imresize_to(img, (9, 20)).shape == (9, 20, 3)
