"""The Sakuya_arch ablation family — one configurable model, seven presets.

The reference carries nine ``Sakuya_arch*`` files sharing a byte-identical
encoder and differing only in decoder MLP dims and stage wiring. This module
expresses the remaining family members (beyond the flagship / train / ZSM /
noflow / S variants) as ONE parameterized model plus a preset table:

  * ``test3``  (``Sakuya_arch_test3.py:303-308``): 192-ch HR field, deeper
    5-layer MLPs, fold-27 patch output, train-style stage wiring.
  * ``test4`` / ``nomul`` (``Sakuya_arch_test4.py:303-308``, identical
    models): minimal decoder — stage A [feat, rel, pe] (195->64), flow from
    the HR field + time alone (65->4), RGB from the two warped HR fields
    (128->3). These two files also carry the RUNNABLE ``decoding_mulfeat``.
  * ``test5``  (``Sakuya_arch_test5.py``): dims identical to the train
    variant (``Sakuya_arch.py``); only the int-scale branch differs.
  * ``single`` (``Sakuya_arch_test_single.py``): test3-style wiring with
    4-layer MLPs, 32-ch output field refined to RGB by a 2-conv head
    (``final_conv``, ``:310-313``).
  * ``continuous`` (``Sakuya_arch_test_continuous.py``): flagship-like
    wiring without pe in stages A/D, bilinear stage-B resamples, train-order
    stage-D concat (524->3).
  * ``test2``  (``Sakuya_arch_test2.py``): the multi-feature decode —
    ≥4-input-frame windows decoded as 3 overlapping pair fields
    (``decoding_mulfeat``, ``:564-631``). NOTE: the reference file's declared
    imnet dims (200/391/780) are inconsistent with what its own method feeds
    (its stage A feeds 192+2+1 channels, stage B 192+1, stage D 2x192) and
    cannot execute; this preset keeps the method's actual data flow with the
    declared 192-ch HR field. ``test4``'s mulfeat (64-ch field) IS
    self-consistent and is the verified configuration.

All presets support ``decode`` (single pair window, any times/out_size) and
``decode_mulfeat`` (reference ``decoding_mulfeat``: windows (0,1,2), (2,3,4),
(4,5,6) of the 2N-1 feature sequence, per-window time grids [0, .5] /
[0, .5, 1]).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.models.luna_tokis import _times_nb
from stif_tpu.models.luna_tokis_variants import _Encoder
from stif_tpu.models.registry import register_model
from stif_tpu.nn.siren import Siren
from stif_tpu.ops.coords import make_coord
from stif_tpu.ops.fold import fold3x3
from stif_tpu.ops.grid_sample import grid_sample
from stif_tpu.ops.warp import warp_grid

_EPS = 1e-6


class LunaTokisAblation(nn.Module):
    """Configurable Sakuya ablation decoder over the shared encoder.

    ``stage_a``: "feat_rel_pe" (195-style) | "feat_inp_rel" (200-style).
    ``stage_b``: "hr_pe" | "train" (all-nearest: hr, feat0, inp, rel, pe) |
                 "cont" (bilinear: hr, feat0, inp, pe).
    ``stage_d``: "two_hr" ([q1, q2]) | "six" (train order
                 [q1, q3, qi1, q2, q4, qi2]).
    ``encode_out``: output channels; 27 with ``fold`` -> 3-ch overlap-add.
    ``final_rgb``: apply the ``single`` variant's 2-conv RGB head
    (``Sakuya_arch_test_single.py:310-313``: 3x3 convs out->16->3, no
    activation between) to the decoded field.
    """

    nf: int = 64
    nframes: int = 6
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 40
    hr_ch: int = 64
    stage_a: str = "feat_rel_pe"
    stage_b: str = "hr_pe"
    stage_d: str = "two_hr"
    encode_out: int = 3
    fold: bool = False
    final_rgb: bool = False
    feat_widths: Tuple[int, ...] = (64, 64, 256)
    flow_widths: Tuple[int, ...] = (64, 64, 256)
    encode_widths: Tuple[int, ...] = (64, 64, 256, 256)

    def setup(self):
        self.encoder = _Encoder(self.nf, self.groups, self.front_RBs,
                                self.back_RBs)
        self.feat_imnet = Siren(list(self.feat_widths),
                                len(self.feat_widths) - 1, self.hr_ch,
                                outermost_linear=True)
        self.flow_imnet = Siren(list(self.flow_widths),
                                len(self.flow_widths) - 1, 4,
                                outermost_linear=True)
        self.encode_imnet = Siren(list(self.encode_widths),
                                  len(self.encode_widths) - 1,
                                  self.encode_out, outermost_linear=True)
        if self.final_rgb:
            self.final_conv0 = nn.Conv(16, (3, 3), padding="SAME")
            self.final_conv1 = nn.Conv(3, (3, 3), padding="SAME")

    def gen_feat(self, x):
        return self.encoder(x)

    def _decode_window(self, feat, inp_cat, times, HH: int, WW: int):
        """One decode pass over a (HH, WW) query grid from a window field
        ``feat`` (B, H, W, 3nf). Returns (nt, B, HH, WW, C_out)."""
        B, H, W = feat.shape[0], feat.shape[1], feat.shape[2]
        Q = HH * WW
        coord = jnp.clip(make_coord((HH, WW)), -1 + _EPS, 1 - _EPS)
        coord = jnp.broadcast_to(coord[None], (B, Q, 2))
        cxy = coord[..., ::-1]
        feat_coord = jnp.broadcast_to(
            make_coord((H, W), flatten=False)[None], (B, H, W, 2))

        q_feat_a = grid_sample(feat, cxy, mode="nearest")
        q_coord = grid_sample(feat_coord, cxy, mode="nearest")
        rel = (coord - q_coord) * jnp.asarray([H, W], coord.dtype)

        t_nb = _times_nb(times, B, jnp.float32)
        nt = t_nb.shape[0]

        def tile_t(v):
            return jnp.broadcast_to(v[None], (nt,) + v.shape).reshape(
                (nt * v.shape[0],) + v.shape[1:])

        pe = jnp.broadcast_to(t_nb[:, :, None, None],
                              (nt, B, Q, 1)).reshape(nt * B, Q, 1)

        if self.stage_a == "feat_rel_pe":
            hrfeat_q = self.feat_imnet(
                (tile_t(jnp.concatenate([q_feat_a, rel], -1)), pe))
        else:  # feat_inp_rel: adds the nearest input sample, no time code
            q_inp_a = grid_sample(inp_cat, cxy, mode="nearest")
            hrfeat_q = self.feat_imnet(
                tile_t(jnp.concatenate([q_feat_a, q_inp_a, rel], -1)))
        hrfeat = hrfeat_q.reshape(nt * B, HH, WW, -1)

        # stage B: the resample of the HR field at its own canonical cell
        # centers is the identity for BOTH nearest and bilinear (cell centers
        # unnormalize to exact integer pixels, so bilinear weights collapse)
        if self.stage_b == "hr_pe":
            flow_q = self.flow_imnet((hrfeat_q, pe))
        elif self.stage_b == "train":
            q_inp_a = grid_sample(inp_cat, cxy, mode="nearest")
            flow_q = self.flow_imnet(
                (hrfeat_q, tile_t(q_feat_a), tile_t(q_inp_a), tile_t(rel),
                 pe))
        else:  # cont: bilinear resamples, no rel. The reference bilinearly
            # REgathers the HR field at the clamped query coords
            # (Sakuya_arch_test_continuous.py:400-403) — at boundary cells
            # the clamp makes this differ (by ~1e-5) from the identity, so
            # no shortcut here.
            q_b = grid_sample(jnp.concatenate([feat, inp_cat], -1), cxy,
                              mode="bilinear")
            nfc = feat.shape[-1]
            q_hr_b = grid_sample(hrfeat, tile_t(cxy), mode="bilinear")
            flow_q = self.flow_imnet(
                (q_hr_b, tile_t(q_b[..., :nfc]), tile_t(q_b[..., nfc:]),
                 pe))
        flow = flow_q.reshape(nt * B, HH, WW, 4)
        g1 = jnp.clip(warp_grid(flow[..., :2]), -1 + _EPS, 1 - _EPS)
        g2 = jnp.clip(warp_grid(flow[..., 2:]), -1 + _EPS, 1 - _EPS)
        g1 = g1.reshape(nt * B, Q, 2)
        g2 = g2.reshape(nt * B, Q, 2)
        q_feat1 = grid_sample(hrfeat, g1, mode="bilinear")
        q_feat2 = grid_sample(hrfeat, g2, mode="bilinear")
        if self.stage_d == "two_hr":
            out = self.encode_imnet((q_feat1, q_feat2))
        else:  # six, train order
            feat_tl = tile_t(feat)
            inp_tl = tile_t(inp_cat)
            q_feat3 = grid_sample(feat_tl, g1, mode="bilinear")
            q_inp1 = grid_sample(inp_tl, g1, mode="bilinear")
            q_feat4 = grid_sample(feat_tl, g2, mode="bilinear")
            q_inp2 = grid_sample(inp_tl, g2, mode="bilinear")
            out = self.encode_imnet(
                (q_feat1, q_feat3, q_inp1, q_feat2, q_feat4, q_inp2))
        if self.fold:
            rgb = fold3x3(out.reshape(nt * B, HH, WW, self.encode_out))
            return rgb.reshape(nt, B, HH, WW, 3)
        out = out.reshape(nt * B, HH, WW, self.encode_out)
        if self.final_rgb:
            out = self.final_conv1(self.final_conv0(out))
        return out.reshape(nt, B, HH, WW, out.shape[-1])

    def decode(self, feat_t, inp, times, out_size=None):
        """Single pair window: first 3 temporal maps (reference convention)."""
        feat = feat_t[:, :3].transpose(0, 2, 3, 1, 4)
        B, H, W = feat.shape[0], feat.shape[1], feat.shape[2]
        feat = feat.reshape(B, H, W, -1)
        N = inp.shape[1]
        inp_cat = inp.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * 3)
        HH, WW = out_size or (H * 4, W * 4)
        return self._decode_window(feat, inp_cat, times, HH, WW)

    def decode_mulfeat(self, feat_t, inp,
                       window_times: Optional[Sequence[Sequence[float]]] = None,
                       out_size=None):
        """Reference ``decoding_mulfeat`` (``Sakuya_arch_test4.py``, runnable
        twin of ``Sakuya_arch_test2.py:564-631``): decode 3 overlapping pair
        windows (temporal maps (0,1,2), (2,3,4), (4,5,6)) of a >=4-frame
        input, each at its own time grid (default [0, .5], [0, .5], [0, .5, 1]
        — a continuous x2-temporal upsample across the window). Returns
        (sum(nt_i), B, HH, WW, C)."""
        assert feat_t.shape[1] >= 7, "mulfeat needs >=4 input frames (T>=7)"
        B, _, H, W = feat_t.shape[:4]
        N = inp.shape[1]
        inp_cat = inp.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * 3)
        HH, WW = out_size or (H * 4, W * 4)
        if window_times is None:
            window_times = ([0.0, 0.5], [0.0, 0.5], [0.0, 0.5, 1.0])
        outs = []
        for fid in range(3):
            feat = feat_t[:, 2 * fid:2 * fid + 3].transpose(0, 2, 3, 1, 4)
            feat = feat.reshape(B, H, W, -1)
            outs.append(self._decode_window(
                feat, inp_cat, jnp.asarray(window_times[fid], jnp.float32),
                HH, WW))
        return jnp.concatenate(outs, axis=0)

    def __call__(self, x, times, out_size=None, mulfeat: bool = False):
        feat = self.encoder(x)
        if mulfeat:
            return self.decode_mulfeat(feat, x, out_size=out_size)
        return self.decode(feat, x, times, out_size)


_PRESETS = {
    # Sakuya_arch_test3.py: 192-ch field, 5-layer MLPs, fold-27
    "test3": dict(hr_ch=192, stage_a="feat_inp_rel", stage_b="train",
                  stage_d="six", encode_out=27, fold=True,
                  feat_widths=(64, 64, 64, 64, 256),
                  flow_widths=(64, 64, 64, 64, 256),
                  encode_widths=(64, 64, 64, 256, 256)),
    # Sakuya_arch_test4.py / _nomul.py: minimal decoder (+ runnable mulfeat)
    "test4": dict(hr_ch=64, stage_a="feat_rel_pe", stage_b="hr_pe",
                  stage_d="two_hr", encode_out=3, fold=False,
                  feat_widths=(64, 64, 256), flow_widths=(64, 64, 256),
                  encode_widths=(64, 64, 256, 256)),
    # Sakuya_arch_test5.py: dims identical to the train variant
    "test5": dict(hr_ch=128, stage_a="feat_inp_rel", stage_b="train",
                  stage_d="six", encode_out=27, fold=True,
                  feat_widths=(64, 64, 64, 256),
                  flow_widths=(64, 64, 64, 256),
                  encode_widths=(64, 64, 64, 256, 256)),
    # Sakuya_arch_test_single.py: 32-ch field + 2-conv RGB head
    "single": dict(hr_ch=192, stage_a="feat_inp_rel", stage_b="train",
                   stage_d="six", encode_out=32, fold=False, final_rgb=True,
                   feat_widths=(64, 64, 64, 256),
                   flow_widths=(64, 64, 64, 256),
                   encode_widths=(64, 64, 64, 256, 256)),
    # Sakuya_arch_test_continuous.py: flagship-like, no pe in A/D
    "continuous": dict(hr_ch=64, stage_a="feat_inp_rel", stage_b="cont",
                       stage_d="six", encode_out=3, fold=False,
                       feat_widths=(64, 64, 256), flow_widths=(64, 64, 256),
                       encode_widths=(64, 64, 256, 256)),
    # Sakuya_arch_test2.py: mulfeat with the declared 192-ch field (see
    # module docstring: the file's own dims are inconsistent; this keeps the
    # method's data flow)
    "test2": dict(hr_ch=192, stage_a="feat_rel_pe", stage_b="hr_pe",
                  stage_d="two_hr", encode_out=3, fold=False,
                  feat_widths=(64, 64, 256), flow_widths=(64, 64, 256),
                  encode_widths=(64, 64, 256, 256)),
}
_PRESETS["nomul"] = dict(_PRESETS["test4"])


def make_ablation(preset: str, **overrides) -> LunaTokisAblation:
    cfg = dict(_PRESETS[preset])
    cfg.update(overrides)
    return LunaTokisAblation(**cfg)


import functools

for _name in _PRESETS:
    register_model(f"LIIF_{_name}")(functools.partial(make_ablation, _name))
