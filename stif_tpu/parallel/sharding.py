"""Sharding specs for params, batches, and decoder query grids."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0,
                   mesh_axis: str = "data") -> NamedSharding:
    """Shard array dim ``axis`` over the ``data`` mesh axis."""
    spec = [None] * ndim
    spec[axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))


def _is_imnet_kernel(path) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    return any("imnet" in k for k in keys) and keys[-1] == "kernel"


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = False):
    """Sharding tree for the param pytree.

    Default: fully replicated (the DDP-equivalent data-parallel layout).
    With ``tensor_parallel`` and a >1 ``model`` axis: the SIREN decoder
    kernels — the widest matmuls in the model (525x256 etc.) — are sharded on
    their output dim over ``model`` (Megatron-style column parallelism; the
    following layer's input dim contraction inserts the psum).
    """
    mp = mesh.shape.get("model", 1)
    tp = tensor_parallel and mp > 1

    def spec_for(path, leaf):
        if (tp and _is_imnet_kernel(path) and leaf.ndim == 2
                and leaf.shape[1] % mp == 0):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_queries(x, mesh: Mesh, axis: int = 1, mesh_axis: str = "model"):
    """Constrain the decoder's flat query axis to be sharded over the mesh —
    the TPU-native replacement for the reference's sequential 3-/12-way query
    chunking (``Sakuya_arch_test.py:480-482, 669-680``): every chip evaluates
    its slice of the (x, y, t) query set in parallel."""
    if mesh.shape.get(mesh_axis, 1) <= 1:
        return x
    spec = [None] * x.ndim
    spec[axis] = mesh_axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
