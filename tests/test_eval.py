"""Eval harness smoke tests on synthetic Vid4-like data (tiny model)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full models: minutes on the 1-core CI host

import jax
import jax.numpy as jnp

from stif_tpu.models import LunaTokis
from stif_tpu.runtime import InferencePipeline
from stif_tpu.runtime.eval import eval_space_time_sr, eval_temporal_x8


@pytest.fixture(scope="module")
def gt_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vid4")
    rng = np.random.default_rng(0)
    for name in ["calendar", "city"]:
        d = root / name
        d.mkdir()
        base = rng.random((48, 64, 3)) * 255
        for t in range(10):
            img = np.roll(base, t, axis=1).astype(np.uint8)
            cv2.imwrite(str(d / f"{t:03d}.png"), img)
    return str(root)


@pytest.fixture(scope="module")
def pipeline():
    model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
    x = jnp.zeros((1, 2, 8, 8, 3))
    times = jnp.asarray([0.5, 0.0])
    params = model.init(jax.random.PRNGKey(0), x, times,
                        method=model.full_init)
    return InferencePipeline(model, params, scale=4, bucket=4)


def test_vid4_protocol(gt_root, pipeline):
    res = eval_space_time_sr(pipeline, gt_root, downscale=0.25)
    assert set(res.psnr) == {"calendar", "city"}
    # random weights: finite, low-but-positive PSNR; SSIM in [-1, 1]
    for v in res.psnr.values():
        assert np.isfinite(v) and v > 0
    for v in res.ssim.values():
        assert -1 <= v <= 1
    assert res.avg_time_s > 0
    assert res.mean_psnr > 0
    # per-query-time split (center t=0.5 / key t=0, myutils.py:517-542)
    assert set(res.psnr_by_time) == {0.5, 0.0} == set(res.ssim_by_time)
    for v in res.psnr_by_time.values():
        assert np.isfinite(v) and v > 0


def test_adobe_x8_protocol(gt_root, pipeline):
    res = eval_temporal_x8(pipeline, gt_root, folders=["calendar"],
                           downscale=0.25)
    assert len(res.per_time_psnr) == 8
    assert all(np.isfinite(p) for p in res.per_time_psnr)


@pytest.fixture(scope="module")
def long_gt_root(tmp_path_factory):
    """20 frames of 64x64 — enough for the stride-18 tmnet protocol and the
    1/8-downscale 4x protocols."""
    import cv2

    root = tmp_path_factory.mktemp("adobe")
    rng = np.random.default_rng(1)
    d = root / "clip0"
    d.mkdir()
    base = rng.random((64, 64, 3)) * 255
    for t in range(20):
        img = np.roll(base, t, axis=1).astype(np.uint8)
        cv2.imwrite(str(d / f"{t:03d}.png"), img)
    return str(root)


def test_adobe_4x_protocols(long_gt_root, tmp_path):
    from stif_tpu.runtime.eval import eval_adobe_4x, eval_adobe_liif4x

    model = LunaTokis(nf=8, groups=2, front_RBs=1, back_RBs=1)
    x = jnp.zeros((1, 2, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0.5]),
                        method=model.full_init)
    pipe = InferencePipeline(model, params, scale=8, bucket=4)

    logfile = str(tmp_path / "log.txt")
    res = eval_adobe_4x(pipe, long_gt_root, downscale=1 / 8,
                        logfile=logfile, epoch_id=1, iter_id=2)
    assert np.isfinite(res.mean_psnr) and res.mean_psnr > 0
    assert np.isfinite(res.mid_psnr)
    line = open(logfile).read()
    assert "Epoch: [1/2]" in line and "Val_PSNR:" in line

    res2 = eval_adobe_liif4x(pipe, long_gt_root, downscale=1 / 8)
    assert np.isfinite(res2.mean_psnr) and res2.mean_psnr > 0


@pytest.mark.slow
def test_tmnet_protocols(gt_root, long_gt_root):
    from stif_tpu.models import TMNet
    from stif_tpu.runtime.eval import eval_adobe_tmnet, eval_vid4_tmnet

    model = TMNet(nf=8, groups=2, front_RBs=1, back_RBs=1)
    x = jnp.zeros((1, 4, 8, 8, 3))
    t = jnp.zeros((1, 5))
    params = model.init(jax.random.PRNGKey(0), x, t)
    pipe = InferencePipeline(model, params, scale=4, bucket=4)

    res = eval_adobe_tmnet(pipe, long_gt_root)
    assert np.isfinite(res.mean_psnr) and res.mean_psnr > 0
    assert np.isfinite(res.mid_psnr)

    res2 = eval_vid4_tmnet(pipe, gt_root, folders=["calendar"])
    assert np.isfinite(res2.mean_psnr) and res2.mean_psnr > 0
