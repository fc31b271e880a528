"""Memory-bounded chunked decoding orchestrator.

Replaces the reference's sequential query chunking with explicit
``del``/``empty_cache`` (``decoding_test`` 3-way, ``decoding_memory`` 12-way,
``decoding_fasttest_memory``; SURVEY.md §5 "long-context") with a two-pass
pipeline of compiled programs:

  pass 1 (per chunk): stage A+B -> HR feature chunk + flow chunk
  assemble          : full HR feature field (device-resident)
  pass 2 (per chunk): stage C+D gathering from the full field -> RGB chunk

Each pass is ONE jitted program reused across chunks (queries padded to a
chunk multiple), so peak memory scales with the chunk size, not the frame
size. Exactly equivalent to the unchunked decode (the chunk boundaries cut
only embarrassingly-parallel query dimensions).

With a ``mesh``, chunks are dispatched device-parallel: each superstep
evaluates ``n_devices`` chunks in one program with the query axis sharded
over the mesh (every chip gathers from its replicated copy of the feature
field), so peak *per-device* memory still scales with the chunk size while
wall-clock scales down with the device count — the scale-out version of the
reference's sequential 3-/12-way loops.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stif_tpu.ops.coords import make_coord

_EPS = 1e-6


def _base_grid_xy(HH: int, WW: int) -> np.ndarray:
    """(HH*WW, 2) align_corners=True lattice values in (x, y) order."""
    gx = np.linspace(-1.0, 1.0, WW, dtype=np.float32)
    gy = np.linspace(-1.0, 1.0, HH, dtype=np.float32)
    g = np.stack(np.meshgrid(gx, gy, indexing="xy"), axis=-1)
    return g.reshape(-1, 2)


class ChunkedDecoder:
    """Bind a LunaTokis-family model + params for chunked decoding."""

    def __init__(self, model, params, chunk_size: int = 65536,
                 mesh: Optional[Mesh] = None, mesh_axis: str = "model"):
        self.model = model
        self.chunk = chunk_size
        self.mesh = mesh if (mesh and mesh.shape.get(mesh_axis, 1) > 1) \
            else None
        self.mesh_axis = mesh_axis
        self.n_par = self.mesh.shape[mesh_axis] if self.mesh else 1
        if self.mesh:
            # params replicated across the mesh; query inputs sharded on
            # axis 1 — jit propagates both through the per-query stages
            params = jax.device_put(params, NamedSharding(self.mesh, P()))
            self._qshard = NamedSharding(
                self.mesh, P(None, mesh_axis))
        self.params = params
        m = model
        self._prep = jax.jit(
            lambda p, f, x, up: m.apply(p, f, x, up, method=m._decode_prep),
            static_argnums=(3,),
        )
        self._ab = jax.jit(
            lambda p, feat, inp_cat, hr_inp, coord, t: m.apply(
                p, feat, inp_cat, hr_inp, coord, t,
                method=m.decode_chunk_ab)
        )
        self._cd = jax.jit(
            lambda p, hrfeat, feat, hr_inp, flow, bg, t, sk, hh, ww: m.apply(
                p, hrfeat, feat, hr_inp, flow, bg, t, (hh, ww), skip_hr=sk,
                method=m.decode_chunk_cd),
            static_argnums=(8, 9),
        )
        self._skip = jax.jit(
            lambda p, inp_cat, hh, ww: m.apply(
                p, inp_cat, (hh, ww), True, method=m._skip_source),
            static_argnums=(2, 3),
        )

    def decode(self, feat_t, inp, times, out_size: Tuple[int, int],
               hr_inp_upsample: bool = False):
        """feat_t: gen_feat output; returns (nt, B, HH, WW, 3) numpy."""
        HH, WW = out_size
        Q = HH * WW
        # one dispatch covers n_par chunks (query axis sharded over the mesh)
        C = min(self.chunk, math.ceil(Q / self.n_par))
        S = C * self.n_par
        n_steps = math.ceil(Q / S)
        Qp = n_steps * S

        feat, inp_cat, hr_inp = self._prep(self.params, feat_t, inp,
                                           hr_inp_upsample)
        B = feat.shape[0]
        nt = int(np.asarray(times).reshape(-1).shape[0])

        coord = np.asarray(
            jnp.clip(make_coord((HH, WW)), -1 + _EPS, 1 - _EPS)
        )
        base_grid = _base_grid_xy(HH, WW)
        if Qp != Q:  # pad with the last coord (cropped after)
            coord = np.concatenate(
                [coord, np.repeat(coord[-1:], Qp - Q, 0)], 0)
            base_grid = np.concatenate(
                [base_grid, np.repeat(base_grid[-1:], Qp - Q, 0)], 0)

        def put_queries(x, axis):
            if self.mesh is None:
                return jnp.asarray(x)
            spec = [None] * x.ndim
            spec[axis] = self.mesh_axis
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

        # pass 1: stage A+B, n_par device-parallel chunks per dispatch
        hr_chunks, flow_chunks = [], []
        for i in range(n_steps):
            cc = np.broadcast_to(coord[None, i * S:(i + 1) * S], (B, S, 2))
            hrf, flw = self._ab(self.params, feat, inp_cat, hr_inp,
                                put_queries(cc, 1), times)
            hr_chunks.append(hrf)
            flow_chunks.append(flw)
        hrfeat_full = jnp.concatenate(hr_chunks, axis=1)[:, :Q]
        hrfeat_full = hrfeat_full.reshape(nt * B, HH, WW, -1)
        if self.mesh is not None:  # pass 2 gathers anywhere: replicate
            hrfeat_full = jax.device_put(
                hrfeat_full, NamedSharding(self.mesh, P()))

        # rgb_skip_bicubic: bicubic pre-upsample of [first, last] input
        # frames, computed once and gathered per chunk (like hrfeat_full)
        skip_hr = None
        if getattr(self.model, "rgb_skip", False) and \
                getattr(self.model, "rgb_skip_bicubic", False):
            skip_hr = self._skip(self.params, inp_cat, HH, WW)
            if self.mesh is not None:
                skip_hr = jax.device_put(
                    skip_hr, NamedSharding(self.mesh, P()))

        # pass 2: stage C+D per dispatch from the full field
        outs = []
        for i in range(n_steps):
            bg = put_queries(base_grid[i * S:(i + 1) * S], 0)
            rgb = self._cd(self.params, hrfeat_full, feat, hr_inp,
                           flow_chunks[i], bg, times, skip_hr, HH, WW)
            outs.append(np.asarray(rgb))
        out = np.concatenate(outs, axis=1)[:, :Q]
        return out.reshape(nt, B, HH, WW, 3)
