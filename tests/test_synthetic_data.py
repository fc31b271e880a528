"""Procedural video dataset (stif_tpu/data/synthetic.py).

The synthetic backend is the framework's training data source when the
reference's external datasets (Vimeo-90K / Adobe240fps) are unavailable;
these tests pin its contract: determinism per (seed, index), the
AdobeDataset sample schema, exact analytic GT at the sampled times, and the
mixed pair-span option (``interval_choices``) added after round-2 evals
showed span-8-only training mismatched the eval protocols' span-2 queries.
"""

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
