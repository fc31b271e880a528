"""Inference pipeline: padding, shape-bucketed jit caching, sequence windows.

Parity targets: the reference's driver-side plumbing —
  * pad H, W up to multiples of 4 before the model, crop after
    (``codes/custom_video_test.py:45-48``);
  * sliding frame-pair windows over long sequences (``:81-97``) and
    ``test_index_generation`` window plans (``codes/utils/util.py:273-318``);
  * the x2 LR degradation (MATLAB bicubic, ``:87-88``).

TPU-specific: XLA compiles per shape, so the pipeline buckets input sizes
(pad up to the next multiple of ``bucket``) and caches the jitted forward per
bucket. A long video becomes a stream of identical-shape programs.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def pad_to_multiple(x: np.ndarray, multiple: int = 4,
                    bucket: int = 1) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Zero-pad (..., H, W, C) so H, W are multiples of ``multiple`` (and of
    ``bucket`` for compile reuse). Returns (padded, (H, W) original)."""
    h, w = x.shape[-3], x.shape[-2]
    m = max(multiple, bucket)
    hp = int(m * math.ceil(h / m))
    wp = int(m * math.ceil(w / m))
    pad = [(0, 0)] * (x.ndim - 3) + [(0, hp - h), (0, wp - w), (0, 0)]
    return np.pad(x, pad), (h, w)


def window_plan(skip: bool, n_out: int, len_in: int) -> List[List[List[int]]]:
    """Sliding-window index plans for long sequences — exact port of the
    reference's ``test_index_generation`` (``codes/utils/util.py:273-318``).

    Returns a list of [input_indices, output_indices] windows; with ``skip``,
    inputs are every 2nd frame of each ``n_out``-frame output window.
    """
    n_in = 1 + n_out // 2
    assert n_in <= len_in, "input too short for one window"
    sele_list = []
    if skip:
        right = n_out
        while right <= len_in:
            h_list = [right - n_out + x for x in range(n_out)]
            l_list = h_list[::2]
            right += n_out - 1
            sele_list.append([l_list, h_list])
        if right < len_in - 1:
            h_list = [len_in - n_out + x for x in range(n_out)]
            sele_list.append([h_list[::2], h_list])
    else:
        right = n_out
        right_in = n_in
        while right_in <= len_in:
            h_list = [right - n_out + x for x in range(n_out)]
            l_list = [right_in - n_in + x for x in range(n_in)]
            right += n_out - 1
            right_in += n_in - 1
            sele_list.append([l_list, h_list])
        if right_in < len_in - 1:
            right = len_in * 2 - 1
            h_list = [right - n_out + x for x in range(n_out)]
            l_list = [len_in - n_in + x for x in range(n_in)]
            sele_list.append([l_list, h_list])
    return sele_list


class InferencePipeline:
    """Shape-bucketed jitted inference over frame pairs / windows."""

    def __init__(self, model, params, scale: int = 4, bucket: int = 16,
                 device=None, test_mode: bool = False,
                 local_ensemble: bool = False, self_ensemble: bool = False):
        self.model = model
        self.scale = scale
        self.bucket = bucket
        self.test_mode = test_mode
        # decoding_localensemble: 4 area-weighted shifted decode passes
        # (reference ``Sakuya_arch_test.py:962-1085``) — a quality/compute
        # trade the reference exposes as its own eval mode
        self.local_ensemble = local_ensemble
        # geometric self-ensemble (the standard EDSR x8 dihedral average) —
        # NOT a reference mode; an optional beyond-parity quality/compute
        # trade. Purely spatial transforms, so query times are unchanged.
        self.self_ensemble = self_ensemble
        self.device = device or jax.devices()[0]
        self.params = jax.device_put(params, self.device)
        self._cache: Dict[Tuple, object] = {}

    def _fwd(self, shape, nt, out_size):
        key = (shape, nt, out_size)
        if key not in self._cache:
            model = self.model
            test = self.test_mode
            le = self.local_ensemble

            def f(params, x, times):
                return model.apply(params, x, times, out_size=out_size,
                                   test=test, local_ensemble=le)

            self._cache[key] = jax.jit(f)
        return self._cache[key]

    def render_window(self, frames: np.ndarray,
                      times: Sequence[float]) -> np.ndarray:
        """frames: (N, H, W, 3) float32 [0,1] RGB LR frames ->
        (nt, H*scale, W*scale, 3)."""
        if self.self_ensemble:
            return self._render_window_ensemble(frames, times)
        return self._render_window_raw(frames, times)

    def _render_window_raw(self, frames: np.ndarray,
                           times: Sequence[float]) -> np.ndarray:
        x, (h, w) = pad_to_multiple(frames, 4, self.bucket)
        x = jnp.asarray(x[None])
        t = jnp.asarray(np.asarray(times, np.float32))
        hp, wp = x.shape[2], x.shape[3]
        out_size = (hp * self.scale, wp * self.scale)
        fwd = self._fwd(tuple(x.shape), len(times), out_size)
        out = fwd(self.params, x, t)
        out = np.asarray(out)[:, 0]
        return out[:, : h * self.scale, : w * self.scale]

    def _render_window_ensemble(self, frames: np.ndarray,
                                times: Sequence[float]) -> np.ndarray:
        """x8 geometric self-ensemble: average the prediction over the
        dihedral group (flips + transpose); 8x compute, two compiled shapes
        (the transpose swaps H and W)."""
        acc = None
        for k in range(8):
            f = frames
            if k & 1:
                f = f[:, :, ::-1]
            if k & 2:
                f = f[:, ::-1]
            if k & 4:
                f = np.transpose(f, (0, 2, 1, 3))
            o = self._render_window_raw(np.ascontiguousarray(f), times)
            if k & 4:
                o = np.transpose(o, (0, 2, 1, 3))
            if k & 2:
                o = o[:, ::-1]
            if k & 1:
                o = o[:, :, ::-1]
            acc = o if acc is None else acc + o
        return acc / 8.0

    def render_window_tmnet(self, frames: np.ndarray,
                            times: Sequence[float]) -> np.ndarray:
        """TMNet-mode window render (reference ``custom_video_test`` TMNet
        branch): t enters as (B, t_N) modulation; output is the fixed-x4
        interleaved sequence (T = N + (N-1)*t_N outputs for N inputs)."""
        x, (h, w) = pad_to_multiple(frames, 4, self.bucket)
        x = jnp.asarray(x[None])
        t = jnp.asarray(np.asarray(times, np.float32))[None]  # (1, t_N)
        key = ("tmnet", tuple(x.shape), t.shape[1])
        if key not in self._cache:
            model = self.model
            self._cache[key] = jax.jit(
                lambda p, x, t: model.apply(p, x, t))
        out = np.asarray(self._cache[key](self.params, x, t))[0]
        return out[:, : h * 4, : w * 4]

    def render_pairs(self, pairs: np.ndarray, times: Sequence[float],
                     chunk_size: int = 65536) -> np.ndarray:
        """Batched-pair decode: (B, 2, H, W, 3) distinct LR pairs ->
        (B, nt, HH, WW, 3).

        The encoder runs at batch B in one program (amortizing dispatch and
        small-op overhead across pairs); the decoder goes through the
        ChunkedDecoder so the B*nt query set stays memory-bounded (a full
        B>=2 decode at production sizes OOMs)."""
        from stif_tpu.runtime.chunked import ChunkedDecoder

        x, (h, w) = pad_to_multiple(pairs, 4, self.bucket)
        x = jnp.asarray(x)
        key = ("genfeat", tuple(x.shape))
        if key not in self._cache:
            m = self.model
            self._cache[key] = jax.jit(
                lambda p, x: m.apply(p, x, method=m.gen_feat))
        feat = self._cache[key](self.params, x)
        if not hasattr(self, "_chunked") or self._chunked.chunk != chunk_size:
            self._chunked = ChunkedDecoder(self.model, self.params,
                                           chunk_size=chunk_size)
        hp, wp = x.shape[2], x.shape[3]
        out = self._chunked.decode(
            feat, x, jnp.asarray(np.asarray(times, np.float32)),
            (hp * self.scale, wp * self.scale),
            hr_inp_upsample=self.test_mode)
        out = np.moveaxis(out, 0, 1)  # (B, nt, HH, WW, 3)
        return out[:, :, : h * self.scale, : w * self.scale]

    def render_sequence(self, frames: np.ndarray, n_times: int = 8):
        """Stream a long sequence (T, H, W, 3) through overlapping frame
        pairs, ``n_times`` interpolated frames per pair (the
        ``custom_video_test`` loop). Double-buffered: pair i's host transfer
        overlaps pair i+1's compute (+~20% measured on v5e).
        Returns list of (nt, HH, WW, 3)."""
        times = jnp.asarray(np.asarray(
            [i / n_times for i in range(n_times)], np.float32))

        def launch(i):
            x, (h, w) = pad_to_multiple(frames[i:i + 2], 4, self.bucket)
            x = jnp.asarray(x[None])
            hp, wp = x.shape[2], x.shape[3]
            out_size = (hp * self.scale, wp * self.scale)
            fwd = self._fwd(tuple(x.shape), n_times, out_size)
            return fwd(self.params, x, times), (h, w)

        def fetch(pending):
            out, (h, w) = pending
            out = np.asarray(out)[:, 0]
            return out[:, : h * self.scale, : w * self.scale]

        outs = []
        pending = launch(0)
        for i in range(1, frames.shape[0] - 1):
            nxt = launch(i)
            outs.append(fetch(pending))
            pending = nxt
        outs.append(fetch(pending))
        return outs
