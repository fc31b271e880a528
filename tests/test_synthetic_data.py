"""Procedural video dataset (stif_tpu/data/synthetic.py).

The synthetic backend is the framework's training data source when the
reference's external datasets (Vimeo-90K / Adobe240fps) are unavailable;
these tests pin its contract: determinism per (seed, index), the
AdobeDataset sample schema, exact analytic GT at the sampled times, and the
mixed pair-span option (``interval_choices``) added after round-2 evals
showed span-8-only training mismatched the eval protocols' span-2 queries.
"""

import os

import numpy as np

from stif_tpu.data.synthetic import SyntheticVideoDataset, render_frame, sample_scene


def test_deterministic_and_schema():
    ds1 = SyntheticVideoDataset(n_items=10, gt_size=32, nt=3, seed=7)
    ds2 = SyntheticVideoDataset(n_items=10, gt_size=32, nt=3, seed=7)
    a, b = ds1[4], ds2[4]
    np.testing.assert_array_equal(a["LQs"], b["LQs"])
    np.testing.assert_array_equal(a["GT"], b["GT"])
    np.testing.assert_array_equal(a["times"], b["times"])
    assert a["LQs"].shape == (2, 8, 8, 3)
    assert a["GT"].shape == (3, 32, 32, 3)
    assert a["times"].shape == (3,)
    assert 0.0 <= a["times"].min() and a["times"].max() <= 1.0
    assert np.all(np.diff(a["times"]) >= 0)
    # different index -> different sample
    c = ds1[5]
    assert not np.array_equal(a["GT"], c["GT"])


def test_gt_matches_analytic_render():
    """GT frames are exact analytic renders at times[k] * interval."""
    ds = SyntheticVideoDataset(n_items=4, gt_size=24, nt=2, seed=3)
    s = ds[1]
    rng = np.random.default_rng(np.random.SeedSequence([3, 1]))
    scene = sample_scene(rng, max_speed=3.0)
    Hc, Wc = scene["canvas"]
    y0 = rng.uniform(0, Hc - 24)
    x0 = rng.uniform(0, Wc - 24)
    for k, t in enumerate(s["times"]):
        direct = render_frame(scene, float(t) * ds.interval, (24, 24),
                              (y0, x0))
        np.testing.assert_allclose(s["GT"][k], direct, atol=1e-6)


def test_interval_choices_mixes_spans():
    ds = SyntheticVideoDataset(n_items=64, gt_size=16, nt=3,
                               interval_choices=[2, 4, 8], seed=1)
    span2 = any(
        np.allclose(ds[i]["times"], [0.0, 0.5, 1.0]) for i in range(24)
    )
    assert span2, "span-2 windows (times {0, .5, 1}) should appear"
    # quarter-step times only exist for spans 4/8
    quarter = any(
        np.any(np.isclose(ds[i]["times"], 0.25)) for i in range(24)
    )
    assert quarter, "span-4/8 windows should appear"
    for i in range(10):
        t = ds[i]["times"]
        assert t.shape == (3,) and t.min() >= 0 and t.max() <= 1


def test_scene_families():
    """Widened eval domains (VERDICT r3 item 8): 'default' draws are
    byte-identical to the pre-family sampler; 'occlusion' raises blob count
    and opacity; 'lighting' drifts global illumination over time."""
    from stif_tpu.data.synthetic import render_sequence, sample_scene

    # default: family arg must not perturb the rng stream
    a = render_sequence(123, 3, (32, 40))
    b = render_sequence(123, 3, (32, 40), family="default")
    np.testing.assert_array_equal(a, b)

    rng = np.random.default_rng(7)
    occ = sample_scene(rng, canvas=(64, 80), family="occlusion")
    rng = np.random.default_rng(7)
    dft = sample_scene(rng, canvas=(64, 80), family="default")
    assert occ["fg_pos"].shape[0] > dft["fg_pos"].shape[0]
    assert occ["fg_opacity"].min() >= 0.92
    assert float(occ["gain_slope"]) == 0.0

    rng = np.random.default_rng(11)
    lit = sample_scene(rng, canvas=(64, 80), family="lighting")
    assert float(lit["gain_slope"]) != 0.0 or float(lit["bias_slope"]) != 0.0
    # the illumination ramp must change mean brightness noticeably vs the
    # same scene with slopes zeroed
    from stif_tpu.data.synthetic import render_frame

    f8 = render_frame(lit, 8.0, (32, 40))
    lit0 = dict(lit, gain_slope=np.float32(0.0), bias_slope=np.float32(0.0))
    f8_flat = render_frame(lit0, 8.0, (32, 40))
    assert abs(float(f8.mean()) - float(f8_flat.mean())) > 1e-3


def test_render_eval_suite(tmp_path):
    from stif_tpu.data.synthetic import render_eval_suite

    root = render_eval_suite(str(tmp_path / "suite"), n_per_family=1,
                             n_frames=3, size=(24, 32))
    names = sorted(os.listdir(root))
    assert names == ["default0", "lighting0", "occlusion0"]
    for n in names:
        assert len(os.listdir(os.path.join(root, n))) == 3
    # default scenes must be pixel-identical to the classic eval set
    from stif_tpu.data.synthetic import render_eval_folders
    import cv2

    classic = render_eval_folders(str(tmp_path / "classic"), n_scenes=1,
                                  n_frames=3, size=(24, 32))
    a = cv2.imread(os.path.join(root, "default0", "000.png"))
    b = cv2.imread(os.path.join(classic, "scene0", "000.png"))
    np.testing.assert_array_equal(a, b)


def test_natural_layered_scenes():
    """Round-5 hardened natural family: layered photographic scenes with
    SUBPIXEL affine motion and independently moving occluding layers
    (VERDICT r4 missing #2 / next #5). Deterministic per rng state."""
    from stif_tpu.data.natural import (find_natural_textures,
                                       render_natural_frame,
                                       sample_natural_scene)

    if not find_natural_textures():
        import pytest

        pytest.skip("no bundled photos in this environment")
    rng = np.random.default_rng(42)
    sc = sample_natural_scene(rng, min_canvas=(128, 128))
    assert sc["kind"] == "natural"
    assert sc["fg_pos"].shape[0] >= 1, "needs occluding layers"
    # velocities are continuous floats — subpixel by construction
    assert not np.allclose(sc["vel"], np.round(sc["vel"]))
    f0 = render_natural_frame(sc, 0.0, (48, 64), (30, 30))
    f1 = render_natural_frame(sc, 0.5, (48, 64), (30, 30))
    assert f0.shape == (48, 64, 3) and f0.dtype == np.float32
    assert 0.0 <= f0.min() and f0.max() <= 1.0
    # half-frame time must move the image (subpixel motion renders)
    assert np.abs(f1 - f0).mean() > 1e-4
    # determinism
    sc2 = sample_natural_scene(np.random.default_rng(42),
                               min_canvas=(128, 128))
    np.testing.assert_array_equal(
        f0, render_natural_frame(sc2, 0.0, (48, 64), (30, 30)))
    # occlusion: a foreground layer centered in the crop must replace the
    # background there (alpha ~ opacity at the center)
    sc3 = dict(sc2)
    sc3["fg_pos"] = np.array([[54.0, 62.0]], np.float32)
    sc3["fg_vel"] = np.zeros((1, 2), np.float32)
    sc3["fg_ab"] = np.array([[10.0, 10.0]], np.float32)
    sc3["fg_angle"] = np.zeros(1, np.float32)
    sc3["fg_opacity"] = np.ones(1, np.float32)
    sc3["fg_edge"] = np.asarray([0.05], np.float32)
    sc3["fg_tex"] = [np.ones((64, 64, 3), np.float32)]
    sc3["fg_src"] = np.array([[32.0, 32.0]], np.float32)
    g = render_natural_frame(sc3, 0.0, (48, 64), (30, 30))
    np.testing.assert_allclose(g[24, 32], [1.0, 1.0, 1.0], atol=1e-3)


def test_natural_eval_set_v2(tmp_path):
    from stif_tpu.data.natural import (build_natural_eval_set_v2,
                                       find_natural_textures)

    if not find_natural_textures():
        import pytest

        pytest.skip("no bundled photos in this environment")
    names = build_natural_eval_set_v2(str(tmp_path / "nat2"), n_scenes=2,
                                      n_frames=3, size=(32, 40))
    assert names == ["naturalv2_0", "naturalv2_1"]
    for n in names:
        assert len(os.listdir(tmp_path / "nat2" / n)) == 3
    # idempotent
    again = build_natural_eval_set_v2(str(tmp_path / "nat2"), n_scenes=2,
                                      n_frames=3, size=(32, 40))
    assert again == names


def test_mixed_scale_load_batch():
    """Per-BATCH random scale buckets (the reference's collate_function2
    semantics, codes/data/__init__.py:63-121, TPU-bucketed): every sample in
    a batch shares one (scale, lq_size); the draw is deterministic in
    (seed, indices); GT = scale * LQ."""
    plan = [[2, 16], [4, 8]]
    ds = SyntheticVideoDataset(n_items=32, nt=2, seed=9, scale_plan=plan)
    assert ds.use_load_batch
    seen = set()
    for b in range(6):
        idx = list(range(b * 2, b * 2 + 2))
        out = ds.load_batch(idx)
        s = out["scale"]
        lq = out["LQs"].shape[2]
        assert (s, lq) in {(2, 16), (4, 8)}
        assert out["GT"].shape == (2, 2, s * lq, s * lq, 3)
        assert out["times"].shape == (2, 2)
        seen.add(s)
        out2 = ds.load_batch(idx)
        np.testing.assert_array_equal(out["GT"], out2["GT"])
        assert out2["scale"] == s
    assert len(seen) == 2, "both buckets should appear across batches"
    # natural mix rides the same path (gated on bundled photos)
    from stif_tpu.data.natural import find_natural_textures

    if find_natural_textures():
        dsn = SyntheticVideoDataset(n_items=8, nt=2, seed=9,
                                    scale_plan=plan, natural_frac=1.0)
        out = dsn.load_batch([0, 1])
        assert out["GT"].shape[0] == 2


def test_loader_batch_level_path():
    """DataLoader prefers dataset.load_batch when the dataset opts in."""
    from stif_tpu.data.loader import DataLoader

    ds = SyntheticVideoDataset(n_items=8, nt=2, seed=3,
                               scale_plan=[[2, 8]])
    dl = DataLoader(ds, batch_size=2, collate=None, num_workers=1,
                    shuffle=False)
    batch = next(iter(dl.epoch(0)))
    assert batch["scale"] == 2
    assert batch["LQs"].shape == (2, 2, 8, 8, 3)
    assert batch["GT"].shape == (2, 2, 16, 16, 3)


def test_natural_eval_set(tmp_path):
    """Natural-photo panning sequences: real bundled photographs, exact
    integer-pixel motion (no resampling). Gated on photos being present."""
    from stif_tpu.data.natural import (build_natural_eval_set,
                                       find_natural_textures,
                                       render_pan_sequence)

    if not find_natural_textures():
        import pytest

        pytest.skip("no bundled photos in this environment")
    names = build_natural_eval_set(str(tmp_path / "nat"), n_frames=4,
                                   size=(48, 64))
    assert names, "photos found but nothing rendered"
    import cv2

    d = tmp_path / "nat" / names[0]
    frames = sorted(os.listdir(d))
    assert len(frames) == 4
    a = cv2.imread(str(d / frames[0]))
    assert a.shape == (48, 64, 3)
    # integer-pan exactness: frame t shifted by -vel*t must equal frame 0
    # on the overlap (pixels copied, not resampled)
    img = np.arange(100 * 120 * 3, dtype=np.uint8).reshape(100, 120, 3)
    clip = render_pan_sequence(img, 3, (32, 40), vel=(2, 3))
    np.testing.assert_array_equal(clip[1][:-2 or None, : 40 - 3],
                                  clip[0][2:, 3:][: 32 - 2, : 40 - 3])
