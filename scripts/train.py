#!/usr/bin/env python
"""Training driver — the entry point the reference never shipped
(SURVEY.md §1 "Notable absence"; reconstructed per §3.3's call stack).

Usage:
  python scripts/train.py -opt configs/train_zsm.yml [--steps N] [--parallel]

Reads the reference-schema YAML (``codes/options/train/train_zsm.yml``),
builds dataset + loader + model, runs the jitted (optionally mesh-parallel)
train loop with LR warmup/cosine restarts, periodic checkpointing, and —
when ``train.val_freq`` is set (``train_zsm.yml:69``) — an in-process
Vid4-protocol validation probe on a held-out dev split every ``val_freq``
steps, with keep-best weights selection (``params_best_<step>`` +
``val_curve.jsonl`` next to the checkpoints).
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True, help="path to YAML option file")
    ap.add_argument("--steps", type=int, default=None,
                    help="override train.niter")
    ap.add_argument("--parallel", action="store_true",
                    help="shard the batch over all devices (data parallel)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu); must be set before "
                         "backend init — the axon TPU plugin force-appends "
                         "itself to jax_platforms otherwise")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:  # persistent compile cache (full-model train step compiles ~2-3 min)
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from stif_tpu.utils.config import parse_options
    from stif_tpu.data import DataLoader, ShardedIterSampler
    from stif_tpu.data.datasets import create_train_dataset
    from stif_tpu.train.video_sr_model import VideoSRModel

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("base")

    opt = parse_options(args.opt, is_train=True)
    # also log to a file next to the checkpoints (stdout can be swallowed
    # when running detached under the TPU tunnel)
    models_dir = (opt.get("path") or {}).get("models")
    if models_dir:
        os.makedirs(models_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(models_dir, "train.log"))
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
        log.addHandler(fh)
        log.setLevel(logging.INFO)
    niter = args.steps or int(opt["train"]["niter"])

    tb = None
    if opt.get("use_tb_logger") and models_dir:
        from stif_tpu.utils.tb import TBWriter

        tb = TBWriter(os.path.join(models_dir, "tb"))
        log.info("tensorboard events -> %s", tb.path)

    dopt = opt["datasets"]["train"]
    ds, collate = create_train_dataset(opt)

    sampler = ShardedIterSampler(len(ds), ratio=100)
    loader = DataLoader(ds, batch_size=int(dopt.get("batch_size", 18)),
                        collate=collate,
                        sampler=sampler,
                        num_workers=int(dopt.get("n_workers", 4)))

    model = VideoSRModel(opt, parallel=args.parallel)

    # init from the first batch's shapes; the first batch is trained on too
    # (itertools.chain puts it back in front of its epoch)
    import itertools

    it = loader.epoch(0)
    first = next(it)
    it = itertools.chain([first], it)
    model.init_params(first["LQs"], first["times"])
    start = 0
    pretrain = (opt.get("path") or {}).get("pretrain_model_G")
    if args.resume:
        try:
            start = model.resume_training()
            log.info("resumed at step %d", start)
        except FileNotFoundError:
            # supervisor restart before the first checkpoint: fall back to
            # the warm-start weights instead of crash-looping
            if pretrain:
                model.load_pth(pretrain)
                log.info("no checkpoint yet; loaded pretrain %s", pretrain)
    elif pretrain:
        # warm-start from exported reference-schema weights (the reference's
        # path.pretrain_model_G, options.py:102-117): params only, fresh
        # optimizer moments — used for fine-tunes from a .pth deliverable
        model.load_pth(pretrain)
        log.info("loaded pretrain weights from %s", pretrain)

    ckpt_freq = int(float((opt.get("logger") or {}).get(
        "save_checkpoint_freq", 1000)))
    print_freq = int((opt.get("logger") or {}).get("print_freq", 100))

    # in-training validation (train.val_freq, reference train_zsm.yml:69)
    val_freq = int(float((opt.get("train") or {}).get("val_freq", 0) or 0))
    validator = best = None
    if val_freq and models_dir:
        from stif_tpu.train.validation import BestTracker, Validator

        vopt = (opt.get("datasets") or {}).get("val") or {}
        validator = Validator(
            model.net,
            root=vopt.get("root", "runs/val_data"),
            n_scenes=int(vopt.get("n_scenes", 3)),
            scale_probes=vopt.get("scale_probes") or (),
        )
        best = BestTracker(models_dir)
        log.info("validation every %d steps on %s (keep-best on t0+t0.5 "
                 "Y-PSNR)", val_freq, validator.root)

    def run_validation(step):
        vt = time.time()
        m = validator.validate(model.state.params)
        m["is_ema"] = 0.0
        cand, cand_params = m, model.state.params
        ema_note = ""
        if model.ema_params is not None:
            me = validator.validate(model.ema_params)
            me["is_ema"] = 1.0
            ema_note = " ema %.3f" % me["score"]
            if me["score"] > m["score"]:
                cand, cand_params = me, model.ema_params
        is_best = best.update(step, cand, cand_params)
        log.info(
            "val @ %d: t0 %.3f t0.5 %.3f (score %.3f%s, %.0f s)%s", step,
            m["t0_psnr"], m["t05_psnr"], m["score"], ema_note,
            time.time() - vt,
            " ** new best **" + (" (ema)" if cand is not m else "")
            if is_best else "")
        if tb:
            tb.add_scalar("val/t0_psnr", m["t0_psnr"], step)
            tb.add_scalar("val/t05_psnr", m["t05_psnr"], step)
            tb.add_scalar("val/score", m["score"], step)
            if model.ema_params is not None:
                tb.add_scalar("val/ema_score", me["score"], step)
            tb.flush()

    # Seed keep-best with the STARTING params when no best exists yet:
    # a warm-started fine-tune must never "select" a first probe that is
    # worse than the weights it started from (keep-best is a floor, not
    # just an argmax over the run's own probes).
    if validator and best.best is None:
        run_validation(start)

    step = start
    epoch = 0
    t0 = time.time()
    while step < niter:
        for batch in it:
            # times pass through at full (B, nt) — per-sample pe conditioning
            model.feed_data({"LQs": batch["LQs"], "GT": batch["GT"],
                             "times": np.asarray(batch["times"])})
            logs = model.optimize_parameters(step)
            step += 1
            if step % print_freq == 0:
                rate = print_freq / (time.time() - t0)
                t0 = time.time()
                log.info("step %d loss %.4f gnorm %.3f (%.2f it/s)",
                         step, logs["loss"], logs["grad_norm"], rate)
                if tb:
                    tb.add_scalar("train/loss", float(logs["loss"]), step)
                    tb.add_scalar("train/grad_norm",
                                  float(logs["grad_norm"]), step)
                    tb.flush()
            if ckpt_freq and step % ckpt_freq == 0 and model.ckpt:
                model.save()
                log.info("checkpoint @ %d", step)
            if validator and step % val_freq == 0:
                run_validation(step)
                t0 = time.time()  # don't count val time in it/s
            if step >= niter:
                break
        epoch += 1
        it = loader.epoch(epoch)

    if model.ckpt:
        model.save()
    if validator and step % val_freq != 0:
        run_validation(step)
    log.info("done at step %d", step)


if __name__ == "__main__":
    main()
