"""In-training validation — the ``val_freq`` hook the reference loop runs.

Parity target: the reference's (unshipped) training driver validates every
``val_freq`` iterations (``codes/options/train/train_zsm.yml:69``
``val_freq: 5e3``; debug shortcut ``codes/options/options.py:56``) by calling
the eval harness mid-run (SURVEY §3.3 reconstructed call stack). Round 3's
silent quality regression happened precisely because this hook was missing —
a 12-hour run must never again degrade unnoticed.

TPU-native design: the validator runs IN-PROCESS against the live params (no
subprocess, no checkpoint round-trip). The jitted forward programs are cached
per shape by ``InferencePipeline``, so after the first call a probe costs
pure eval time (~30 s for 3 scenes at (144, 192)); swapping in fresh params
is a device_put, not a recompile.

The dev split (seed0 880_000) is disjoint from the held-out eval split
(seed0 990_000, ``scripts/eval_model.py``) so keep-best selection never sees
the test scenes.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax


class Validator:
    """Vid4-protocol space-time probe on a held-out dev split.

    ``validate(params) -> dict`` with t0/t0.5 Y-PSNR/SSIM and a scalar
    ``score`` (t0_psnr + t05_psnr) for keep-best selection.
    """

    def __init__(self, net, root: str = "runs/val_data", n_scenes: int = 3,
                 n_frames: int = 12, size=(144, 192), seed0: int = 880_000,
                 device=None):
        from stif_tpu.data.synthetic import render_eval_folders

        self.net = net
        self.root = render_eval_folders(root, n_scenes=n_scenes,
                                        n_frames=n_frames, size=size,
                                        seed0=seed0)
        self.device = device
        self._pipe = None

    def validate(self, params) -> dict:
        from stif_tpu.runtime import InferencePipeline
        from stif_tpu.runtime.eval import eval_space_time_sr

        if self._pipe is None:
            self._pipe = InferencePipeline(self.net, params, scale=4,
                                           bucket=8, device=self.device)
        else:
            self._pipe.params = jax.device_put(params, self._pipe.device)
        res = eval_space_time_sr(self._pipe, self.root, times=(0.5, 0.0))
        t0 = float(res.psnr_by_time[0.0])
        t05 = float(res.psnr_by_time[0.5])
        return {
            "t0_psnr": t0,
            "t05_psnr": t05,
            "t0_ssim": float(res.ssim_by_time[0.0]),
            "t05_ssim": float(res.ssim_by_time[0.5]),
            "mean_psnr": float(res.mean_psnr),
            "score": t0 + t05,
        }


class BestTracker:
    """Keep-best params checkpoint + JSON validation curve.

    Writes ``val_curve.jsonl`` (one record per probe) and keeps exactly one
    ``params_best_<step>`` weights-only checkpoint (the previous best is
    deleted), with a ``best.json`` pointer — the reference's
    ``<iter>_G.pth``-style deliverable, selected on dev score instead of
    "whatever the last iterate was".
    """

    def __init__(self, models_dir: str):
        self.dir = os.path.abspath(models_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.curve_path = os.path.join(self.dir, "val_curve.jsonl")
        self.best_path = os.path.join(self.dir, "best.json")
        self.best = None
        if os.path.exists(self.best_path):
            with open(self.best_path) as f:
                self.best = json.load(f)

    def update(self, step: int, metrics: dict, params) -> bool:
        """Record the probe; if it is the new best, snapshot the params.
        Returns True when a new best was saved."""
        rec = {"step": int(step), **{k: round(float(v), 4)
                                     for k, v in metrics.items()}}
        with open(self.curve_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.best is not None and rec["score"] <= self.best["score"]:
            return False
        import orbax.checkpoint as ocp

        path = os.path.join(self.dir, f"params_best_{int(step)}")
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params)
        ckptr.wait_until_finished()
        prev = self.best
        self.best = {**rec, "path": path}
        with open(self.best_path, "w") as f:
            json.dump(self.best, f, indent=2)
        if prev and prev.get("path") and prev["path"] != path \
                and os.path.exists(prev["path"]):
            shutil.rmtree(prev["path"])
        return True


def load_best_params(models_dir: str, abstract_params):
    """Restore the keep-best weights written by :class:`BestTracker`."""
    with open(os.path.join(models_dir, "best.json")) as f:
        best = json.load(f)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(best["path"], abstract_params), best
