"""Device-mesh construction.

The reference's parallelism surface is DataParallel/DistributedDataParallel +
a distributed sampler (SURVEY.md §2.7); there are no hand-written collectives.
The TPU-native equivalent: one ``jax.sharding.Mesh`` and sharding annotations;
XLA emits all-reduce/all-gather over ICI (within a slice) / DCN (across
slices).

Axes:
  ``data``  — batch (clips) — the DDP equivalent; gradients psum over it.
  ``model`` — tensor parallelism for the wide decoder matmuls and (at
              inference) the query-grid axis (the TPU version of the
              reference's 3-/12-way query chunking).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict, devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh with named axes, e.g. ``make_mesh({'data': 4, 'model': 2})``."""
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, names)


def default_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """data x model mesh over all (or the first n) devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return make_mesh({"data": n // model_parallel, "model": model_parallel},
                     devs[:n])
