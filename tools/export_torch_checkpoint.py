#!/usr/bin/env python
"""Export a trained orbax checkpoint as a reference-schema ``.pth``.

The reference's deployed inference loads ``latest_G.pth`` with
``strict=True`` (``/root/reference/codes/custom_video_test.py:36``); this
tool writes a state dict with exactly that module-name schema (SURVEY.md
§2.3) from weights trained by this framework — a reference user can load
our checkpoint in the original PyTorch code, closing the interop loop in
the export direction (import is ``stif_tpu.convert.torch_import``).

Usage:
  python tools/export_torch_checkpoint.py -opt configs/train_synthetic.yml \
      [--step N] --out latest_G.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--best", action="store_true",
                    help="export the keep-best weights (best.json) instead "
                         "of the latest full checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import torch

    from stif_tpu.convert import flax_params_to_torch_state
    from stif_tpu.models.factory import define_g
    from stif_tpu.train.checkpoints import CheckpointManager
    from stif_tpu.train.trainer import TrainConfig, create_train_state
    from stif_tpu.utils.config import parse_options

    opt = parse_options(args.opt, is_train=False)
    net = define_g(opt)
    params = jax.jit(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)),
                         jnp.asarray([0.5]), method=net.full_init))()
    models_dir = (opt.get("path") or {}).get("models")
    if args.best:
        from stif_tpu.train.validation import load_best_params

        wts, info = load_best_params(models_dir, params)
        step = int(info["step"])
    else:
        mgr = CheckpointManager(models_dir)
        step = args.step if args.step is not None else mgr.latest_step()
        state, _ = create_train_state(params, TrainConfig())
        state = mgr.restore(state, step)
        wts, step = state.params, int(state.step)

    sd = flax_params_to_torch_state(wts)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    torch.save(tensors, args.out)
    n = sum(v.numel() for v in tensors.values())
    print(f"wrote {args.out}: {len(tensors)} tensors, {n:,} params "
          f"(checkpoint step {step})")


if __name__ == "__main__":
    main()
