"""LMDB format reader/writer and the Vimeo7 lmdb dataset backend.

The reference reads raw uint8 frame blobs from LMDB environments
(``codes/data/Vimeo7_dataset.py:70-109`` + ``data/util.py::_read_img_lmdb``).
The image lacks the ``lmdb`` package, so ``stif_tpu/data/lmdb_io.py``
implements the on-disk format directly; these tests check the format
invariants round-trip (including overflow pages and multi-level B-trees)
and that the dataset backend produces identical samples to the image
folder backend.
"""

import os
import random

import numpy as np
import pytest

from stif_tpu.data.lmdb_io import PAGE, LmdbReader, write_lmdb


def test_roundtrip_small_values(tmp_path):
    items = {f"k{i:04d}".encode(): f"value-{i}".encode() for i in range(50)}
    stats = write_lmdb(str(tmp_path / "db"), items.items())
    assert stats["entries"] == 50
    r = LmdbReader(str(tmp_path / "db"))
    assert r.entries == 50
    for k, v in items.items():
        assert r.get(k) == v
    assert r.get(b"absent") is None
    assert r.keys() == sorted(items)
    r.close()


def test_roundtrip_overflow_values(tmp_path):
    rng = np.random.default_rng(0)
    # Values above PAGE//4 must land on overflow pages; exercise several
    # sizes including exact page multiples.
    sizes = [PAGE // 4 + 1, PAGE - 16, PAGE, 3 * PAGE + 7, 64 * 1024]
    items = [(f"blob{i}".encode(), rng.integers(0, 256, s, np.uint8).tobytes())
             for i, s in enumerate(sizes)]
    stats = write_lmdb(str(tmp_path / "db"), items)
    assert stats["overflow_pages"] > 0
    r = LmdbReader(str(tmp_path / "db"))
    for k, v in items:
        got = r.get(k)
        assert got == v, f"{k}: {len(got)} vs {len(v)}"
    r.close()


def test_roundtrip_deep_tree(tmp_path):
    # Enough entries to force >=2 B-tree levels (branch pages).
    items = [(f"key-{i:06d}".encode(), f"v{i}".encode() * 7)
             for i in range(5000)]
    random.Random(0).shuffle(items)
    stats = write_lmdb(str(tmp_path / "db"), items)
    assert stats["depth"] >= 2 and stats["branch_pages"] >= 1
    r = LmdbReader(str(tmp_path / "db"))
    assert r.depth == stats["depth"]
    probe = random.Random(1).sample(items, 200)
    for k, v in probe:
        assert r.get(k) == v
    # missing keys interleaved among present ones
    assert r.get(b"key-0000005x") is None
    assert len(r.keys()) == 5000
    r.close()


def test_real_lmdb_package_cross_check(tmp_path):
    lmdb = pytest.importorskip("lmdb")
    items = [(f"x{i}".encode(), os.urandom(i * 37 % 5000)) for i in range(64)]
    write_lmdb(str(tmp_path / "db"), items)
    env = lmdb.open(str(tmp_path / "db"), readonly=True, lock=False)
    with env.begin() as txn:
        for k, v in items:
            assert txn.get(k) == v


def _write_septuplet_lmdbs(tmp_path, scale=4, gt_hw=(32, 48)):
    """Two tiny folders + equivalent lmdb envs with the reference schema."""
    import cv2

    rng = np.random.default_rng(7)
    h, w = gt_hw
    gt_items, lq_items = [], []
    gt_root = tmp_path / "gt"
    lq_root = tmp_path / "lq"
    for a, b in [("00001", "0001"), ("00001", "0002")]:
        (gt_root / a / b).mkdir(parents=True)
        (lq_root / a / b).mkdir(parents=True)
        for i in range(1, 8):
            gt = rng.integers(0, 256, (h, w, 3), np.uint8)
            lq = rng.integers(0, 256, (h // scale, w // scale, 3), np.uint8)
            cv2.imwrite(str(gt_root / a / b / f"im{i}.png"), gt)
            cv2.imwrite(str(lq_root / a / b / f"im{i}.png"), lq)
            gt_items.append((f"{a}_{b}_{i}".encode(), gt.tobytes()))
            lq_items.append((f"{a}_{b}_{i}".encode(), lq.tobytes()))
    write_lmdb(str(tmp_path / "gt_lmdb"), gt_items)
    write_lmdb(str(tmp_path / "lq_lmdb"), lq_items)
    return gt_root, lq_root


def test_vimeo7_lmdb_backend_matches_folder(tmp_path):
    pytest.importorskip("cv2")
    from stif_tpu.data.datasets import Vimeo7Dataset

    gt_root, lq_root = _write_septuplet_lmdbs(tmp_path)
    common = dict(n_frames=7, gt_size=16, scale=4, seed=3)
    ds_img = Vimeo7Dataset(str(gt_root), str(lq_root), **common)
    ds_db = Vimeo7Dataset(str(tmp_path / "gt_lmdb"), str(tmp_path / "lq_lmdb"),
                          data_type="lmdb", gt_shape=(3, 32, 48), **common)
    assert ds_db.keys == ds_img.keys == ["00001_0001", "00001_0002"]
    for i in range(2):
        a = ds_img[i]
        b = ds_db[i]
        assert a["key"] == b["key"]
        np.testing.assert_array_equal(a["LQs"], b["LQs"])
        np.testing.assert_array_equal(a["GT"], b["GT"])
        np.testing.assert_array_equal(a["times"], b["times"])


def test_create_train_dataset_infers_lmdb_and_cache_keys(tmp_path):
    """Config-driven factory: lmdb inferred from the dataroot suffix
    (reference ``options.py:27-38``) and ``cache_keys`` pickle normalized
    from ``a_b_frame`` entries (``Vimeo7_dataset.py:60-66``)."""
    import pickle

    pytest.importorskip("cv2")
    from stif_tpu.data.datasets import create_train_dataset

    _write_septuplet_lmdbs(tmp_path)
    # reference-style key cache: per-frame entries, duplicated across frames
    keys = [f"00001_0001_{i}" for i in range(1, 8)] + ["00001_0002_4"]
    with open(tmp_path / "keys.pkl", "wb") as f:
        pickle.dump(keys, f)
    # the written env dirs carry no .lmdb suffix; symlink reference-style
    # names so suffix inference has something to see
    (tmp_path / "gt.lmdb").symlink_to(tmp_path / "gt_lmdb")
    (tmp_path / "lq.lmdb").symlink_to(tmp_path / "lq_lmdb")
    opt = {
        "scale": 4,
        "datasets": {"train": {
            "mode": "Vimeo7",
            "dataroot_GT": str(tmp_path / "gt.lmdb"),
            "dataroot_LQ": str(tmp_path / "lq.lmdb"),
            "cache_keys": str(tmp_path / "keys.pkl"),
            "N_frames": 7, "GT_size": 16, "gt_shape": [3, 32, 48],
        }},
    }
    ds, collate = create_train_dataset(opt)
    assert ds.data_type == "lmdb"
    assert ds.keys == ["00001_0001", "00001_0002"]
    sample = ds[0]
    assert sample["GT"].shape[-3:] == (16, 16, 3)
    assert callable(collate)
