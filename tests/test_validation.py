"""Keep-best selection semantics (stif_tpu.train.validation.BestTracker).

The tracker is the floor the training driver relies on: once seeded with the
warm-start probe (scripts/train.py runs one baseline validation when no best
exists), a fine-tune run can never "select" weights worse than its starting
point — `update` only snapshots on a strictly higher score.
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from stif_tpu.train.validation import BestTracker, load_best_params


def _params(v):
    return {"w": jnp.full((4,), float(v)), "b": jnp.zeros((2,))}


def _metrics(score):
    return {"t0_psnr": score / 2, "t05_psnr": score / 2,
            "t0_ssim": 0.9, "t05_ssim": 0.7,
            "mean_psnr": score / 2, "score": score}


def test_keep_best_floor_and_curve(tmp_path):
    d = str(tmp_path / "models")
    bt = BestTracker(d)
    assert bt.best is None

    # baseline seed (the warm-start probe): always adopted
    assert bt.update(0, _metrics(61.28), _params(1.0))
    # a worse first fine-tune probe must NOT displace the seed
    assert not bt.update(250, _metrics(60.9), _params(2.0))
    assert bt.best["step"] == 0
    # equal score is not an improvement either
    assert not bt.update(500, _metrics(61.28), _params(3.0))
    # a strictly better probe takes over and the old snapshot is pruned
    assert bt.update(750, _metrics(61.5), _params(4.0))
    assert bt.best["step"] == 750

    # exactly one keep-best snapshot on disk, pointed to by best.json
    snaps = [n for n in os.listdir(d) if n.startswith("params_best_")]
    assert snaps == ["params_best_750"]
    restored, best = load_best_params(d, _params(0.0))
    assert best["step"] == 750 and best["score"] == 61.5
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.full((4,), 4.0))

    # the curve records every probe, accepted or not
    curve = [json.loads(l) for l in open(os.path.join(d, "val_curve.jsonl"))]
    assert [r["step"] for r in curve] == [0, 250, 500, 750]

    # a fresh tracker over the same dir resumes the floor from best.json
    bt2 = BestTracker(d)
    assert bt2.best["score"] == 61.5
    assert not bt2.update(1000, _metrics(61.3), _params(5.0))
