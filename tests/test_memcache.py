"""Memcached backend: protocol client/server and the Vimeo7 mc data path.

Parity target: the reference's ``data_type == 'mc'`` branch
(``codes/data/Vimeo7_dataset.py:70-109, 160-175``) — PNG frames fetched
from memcached by path key, GT optionally split into ``<root>_B/_G/_R``
single-channel PNGs (1 MB value limit). The reference branch is
unreachable-buggy (``:168`` calls ``_read_img_mc_BGR`` with the wrong
arity); these tests pin the corrected behavior against the folder backend.
"""

import os.path as osp

import numpy as np
import pytest

from stif_tpu.data.memcache import MemcachedClient, MiniMemcachedServer


def test_client_server_roundtrip():
    with MiniMemcachedServer() as srv:
        c = MemcachedClient(port=srv.port)
        assert c.get("absent") is None
        payload = bytes(range(256)) * 300  # binary-safe, includes \r\n
        c.set("a/b/im1.png", payload)
        assert c.get("a/b/im1.png") == payload
        c.set("a/b/im1.png", b"overwritten")
        assert c.get("a/b/im1.png") == b"overwritten"
        # second client sees the same store, empty value round-trips
        c2 = MemcachedClient(port=srv.port)
        c2.set("empty", b"")
        assert c2.get("empty") == b""
        assert c2.get("a/b/im1.png") == b"overwritten"
        c.close(), c2.close()


def test_client_rejects_bad_keys():
    c = MemcachedClient(port=1)  # never connects — validation is first
    with pytest.raises(ValueError):
        c.get("has space")
    with pytest.raises(ValueError):
        c.set("x" * 251, b"v")


def _seed_folder_and_cache(tmp_path, srv, scale=4, gt_hw=(32, 48),
                           channel_split=False):
    """Tiny septuplet folders + the same frames PNG-encoded into memcached.

    Mirrors the reference's cache layout: values keyed by the image's path
    (GT split into ``<root>_B/_G/_R`` planes when ``channel_split``), LQ as
    whole PNGs.
    """
    import cv2

    rng = np.random.default_rng(11)
    h, w = gt_hw
    gt_root, lq_root = tmp_path / "gt", tmp_path / "lq"
    c = MemcachedClient(port=srv.port)
    for a, b in [("00001", "0001"), ("00002", "0042")]:
        (gt_root / a / b).mkdir(parents=True)
        (lq_root / a / b).mkdir(parents=True)
        for i in range(1, 8):
            gt = rng.integers(0, 256, (h, w, 3), np.uint8)
            lq = rng.integers(0, 256, (h // scale, w // scale, 3), np.uint8)
            cv2.imwrite(str(gt_root / a / b / f"im{i}.png"), gt)
            cv2.imwrite(str(lq_root / a / b / f"im{i}.png"), lq)
            rel = osp.join(a, b, f"im{i}.png")
            if channel_split:
                for ch, suffix in enumerate(("_B", "_G", "_R")):
                    ok, buf = cv2.imencode(".png", gt[..., ch])
                    assert ok
                    c.set(osp.join(str(gt_root) + suffix, rel),
                          buf.tobytes())
            else:
                ok, buf = cv2.imencode(".png", gt)
                assert ok
                c.set(osp.join(str(gt_root), rel), buf.tobytes())
            ok, buf = cv2.imencode(".png", lq)
            assert ok
            c.set(osp.join(str(lq_root), rel), buf.tobytes())
    c.close()
    return gt_root, lq_root


@pytest.mark.parametrize("channel_split", [False, True])
def test_vimeo7_mc_backend_matches_folder(tmp_path, channel_split):
    pytest.importorskip("cv2")
    from stif_tpu.data.datasets import Vimeo7Dataset

    with MiniMemcachedServer() as srv:
        gt_root, lq_root = _seed_folder_and_cache(
            tmp_path, srv, channel_split=channel_split)
        keys = ["00001_0001", "00002_0042"]
        common = dict(n_frames=7, gt_size=16, scale=4, seed=5, keys=keys)
        ds_img = Vimeo7Dataset(str(gt_root), str(lq_root), **common)
        ds_mc = Vimeo7Dataset(str(gt_root), str(lq_root), data_type="mc",
                              mc_port=srv.port,
                              mc_channel_split=channel_split, **common)
        for i in range(2):
            a, b = ds_img[i], ds_mc[i]
            assert a["key"] == b["key"]
            np.testing.assert_array_equal(a["LQs"], b["LQs"])
            np.testing.assert_array_equal(a["GT"], b["GT"])
            np.testing.assert_array_equal(a["times"], b["times"])


def test_vimeo7_mc_requires_keys(tmp_path):
    from stif_tpu.data.datasets import Vimeo7Dataset

    with pytest.raises(ValueError, match="keys"):
        Vimeo7Dataset(str(tmp_path), str(tmp_path), n_frames=7, gt_size=16,
                      scale=4, data_type="mc")


def test_create_train_dataset_mc_options(tmp_path):
    """Config-driven factory plumbs the mc backend options through
    (explicit ``data_type: mc`` only — reference ``options.py:37-38``)."""
    import pickle

    pytest.importorskip("cv2")
    from stif_tpu.data.datasets import create_train_dataset

    with MiniMemcachedServer() as srv:
        gt_root, lq_root = _seed_folder_and_cache(tmp_path, srv,
                                                  channel_split=True)
        with open(tmp_path / "keys.pkl", "wb") as f:
            pickle.dump(["00001_0001", "00002_0042"], f)
        opt = {
            "scale": 4,
            "datasets": {"train": {
                "mode": "Vimeo7", "data_type": "mc",
                "dataroot_GT": str(gt_root), "dataroot_LQ": str(lq_root),
                "cache_keys": str(tmp_path / "keys.pkl"),
                "N_frames": 7, "GT_size": 16,
                "mc_port": srv.port, "mc_channel_split": True,
            }},
        }
        ds, _ = create_train_dataset(opt)
        assert ds.data_type == "mc" and ds.mc_channel_split
        sample = ds[0]
        assert sample["GT"].shape[-3:] == (16, 16, 3)
