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
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

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

    def __init__(self, model, params, chunk_size: int = 65536):
        self.model = model
        self.params = params
        self.chunk = chunk_size
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
            lambda p, hrfeat, feat, hr_inp, flow, bg, t, hh, ww: m.apply(
                p, hrfeat, feat, hr_inp, flow, bg, t, (hh, ww),
                method=m.decode_chunk_cd),
            static_argnums=(7, 8),
        )

    def decode(self, feat_t, inp, times, out_size: Tuple[int, int],
               hr_inp_upsample: bool = False):
        """feat_t: gen_feat output; returns (nt, B, HH, WW, 3) numpy."""
        HH, WW = out_size
        Q = HH * WW
        C = min(self.chunk, Q)
        n_chunks = math.ceil(Q / C)
        Qp = n_chunks * C

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

        # pass 1: stage A+B per chunk
        hr_chunks, flow_chunks = [], []
        for i in range(n_chunks):
            cc = jnp.asarray(coord[i * C:(i + 1) * C])
            cc = jnp.broadcast_to(cc[None], (B, C, 2))
            hrf, flw = self._ab(self.params, feat, inp_cat, hr_inp, cc, times)
            hr_chunks.append(hrf)
            flow_chunks.append(flw)
        hrfeat_full = jnp.concatenate(hr_chunks, axis=1)[:, :Q]
        hrfeat_full = hrfeat_full.reshape(nt * B, HH, WW, -1)

        # pass 2: stage C+D per chunk from the full field
        outs = []
        for i in range(n_chunks):
            bg = jnp.asarray(base_grid[i * C:(i + 1) * C])
            rgb = self._cd(self.params, hrfeat_full, feat, hr_inp,
                           flow_chunks[i], bg, times, HH, WW)
            outs.append(np.asarray(rgb))
        out = np.concatenate(outs, axis=1)[:, :Q]
        return out.reshape(nt, B, HH, WW, 3)
