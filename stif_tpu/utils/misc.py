"""Misc utilities: meters, logging, experiment dirs, profiling spans.

Parity targets: ``AverageMeter`` (``codes/myutils.py:228-271``),
``setup_logger`` / ``mkdir_and_rename`` (``codes/utils/util.py:66-97``).
The profiler span is the superset the reference lacked (SURVEY.md §5
tracing): it wraps ``jax.profiler.TraceAnnotation`` + wall-clock timing.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from contextlib import contextmanager


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def mkdir_and_rename(path: str):
    """Archive an existing experiment dir with a timestamp suffix
    (reference ``mkdir_and_rename``)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + time.strftime("%Y%m%d-%H%M%S")
        shutil.move(path, new_name)
    os.makedirs(path, exist_ok=True)


def setup_logger(name: str = "base", log_file: str = None,
                 level=logging.INFO, screen: bool = True):
    logger = logging.getLogger(name)
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    logger.setLevel(level)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, mode="w")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger


@contextmanager
def trace_span(name: str, log: bool = False):
    """jax.profiler annotation + wall-clock span."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if log:
        logging.getLogger("base").info("%s: %.4fs", name,
                                       time.perf_counter() - t0)
