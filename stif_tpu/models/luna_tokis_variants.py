"""LunaTokis family variants.

Parity targets:
  * ``LunaTokisZSM``  — the original fixed-x4 Zooming-Slow-Mo model
    (``codes/models/modules/Sakuya_arch_o.py:263-349``): same encoder, no
    continuous decoder, pixel-shuffle x4 head over every time step. Selected
    by ``which_model_G: LunaTokis`` (``networks.py:15-18``).
  * ``LunaTokisTrain`` — the training variant (``codes/models/modules/
    Sakuya_arch.py:268-459``): feat_imnet 200->128 (no time code in stage A),
    flow_imnet 329->4 (adds rel_coord + time; all stage-B gathers *nearest*
    at LR resolution), encode_imnet 652->27 (no time code) assembled with a
    3x3 overlap-add fold — i.e. overlapping RGB patch prediction.
  * ``LunaTokisNoFlow`` — ablation ``Sakuya_arch_test_noflow.py``: a single
    SIREN (201->3) decodes RGB directly from stage-A features — pure LIIF, no
    flow/warp stages.

All variants share the encoder (conv_first -> residual blocks -> pyramid ->
PCD -> bidirectional deformable ConvLSTM -> recon trunk), expressed once via
``_Encoder``.
"""

from __future__ import annotations


import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.models.luna_tokis import _times_nb
from stif_tpu.models.registry import register_model
from stif_tpu.nn.blocks import Conv, ResidualTrunk, lrelu
from stif_tpu.nn.convlstm import BiDeformableConvLSTM
from stif_tpu.nn.pcd import PCDAlign
from stif_tpu.nn.siren import Siren
from stif_tpu.ops.coords import make_coord
from stif_tpu.ops.fold import fold3x3
from stif_tpu.ops.grid_sample import grid_sample
from stif_tpu.ops.pixel_shuffle import pixel_shuffle
from stif_tpu.ops.warp import warp_grid

_EPS = 1e-6


class _Encoder(nn.Module):
    """Shared LunaTokis encoder (``gen_feat``)."""

    nf: int = 64
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 40

    @nn.compact
    def __call__(self, x):
        nf = self.nf
        B, N, H, W, C = x.shape
        xf = x.reshape(B * N, H, W, C)
        l1 = lrelu(Conv(nf, 3, 1, 1, name="conv_first")(xf))
        l1 = ResidualTrunk(nf, self.front_RBs, name="feature_extraction")(l1)
        l2 = lrelu(Conv(nf, 3, 2, 1, name="fea_L2_conv1")(l1))
        l2 = lrelu(Conv(nf, 3, 1, 1, name="fea_L2_conv2")(l2))
        l3 = lrelu(Conv(nf, 3, 2, 1, name="fea_L3_conv1")(l2))
        l3 = lrelu(Conv(nf, 3, 1, 1, name="fea_L3_conv2")(l3))
        l1 = l1.reshape(B, N, H, W, -1)
        l2 = l2.reshape(B, N, H // 2, W // 2, -1)
        l3 = l3.reshape(B, N, H // 4, W // 4, -1)

        pcd = PCDAlign(nf, self.groups, name="pcd_align")
        fusion = Conv(nf, 1, 1, 0, name="fusion")
        seq = []
        for idx in range(N - 1):
            fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
            fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
            fused = fusion(pcd(fea1, fea2))
            if idx == 0:
                seq.append(fea1[0])
            seq.append(fused)
            seq.append(fea2[0])
        lstm_feats = jnp.stack(seq, axis=1)
        feats = BiDeformableConvLSTM(nf, self.groups, name="ConvBLSTM")(
            lstm_feats
        )
        B2, T, Hf, Wf, Cf = feats.shape
        out = ResidualTrunk(nf, self.back_RBs, name="recon_trunk")(
            feats.reshape(B2 * T, Hf, Wf, Cf)
        )
        return out.reshape(B2, T, Hf, Wf, Cf)


@register_model("LunaTokisZSM")
class LunaTokisZSM(nn.Module):
    """Fixed-x4 ZSM: returns (B, 2N-1, 4H, 4W, 3)."""

    nf: int = 64
    nframes: int = 3
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 40

    @nn.compact
    def __call__(self, x):
        feat = _Encoder(self.nf, self.groups, self.front_RBs, self.back_RBs,
                        name="encoder")(x)
        B, T, H, W, C = feat.shape
        z = feat.reshape(B * T, H, W, C)
        z = lrelu(pixel_shuffle(Conv(self.nf * 4, 3, 1, 1, name="upconv1")(z), 2))
        z = lrelu(pixel_shuffle(Conv(64 * 4, 3, 1, 1, name="upconv2")(z), 2))
        z = lrelu(Conv(64, 3, 1, 1, name="HRconv")(z))
        z = Conv(3, 3, 1, 1, name="conv_last")(z)
        return z.reshape(B, T, 4 * H, 4 * W, 3)


@register_model("LunaTokisTrain")
class LunaTokisTrain(nn.Module):
    """Training variant: fold-27 patch decoder (``Sakuya_arch.py``)."""

    nf: int = 64
    nframes: int = 7
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 40
    use_pallas: bool = False

    def setup(self):
        self.encoder = _Encoder(self.nf, self.groups, self.front_RBs,
                                self.back_RBs)
        up = self.use_pallas
        # dims from Sakuya_arch.py:303-308
        self.feat_imnet = Siren([64, 64, 64, 256], 3, 128,
                                outermost_linear=True, use_pallas=up)
        self.flow_imnet = Siren([64, 64, 64, 256], 3, 4,
                                outermost_linear=True, use_pallas=up)
        self.encode_imnet = Siren([64, 64, 64, 256, 256], 4, 27,
                                  outermost_linear=True, use_pallas=up)

    def gen_feat(self, x):
        return self.encoder(x)

    def decode(self, feat_t, inp, times, out_size=None):
        feat = feat_t[:, :3].transpose(0, 2, 3, 1, 4)  # first 3 steps (:363)
        B, H, W = feat.shape[0], feat.shape[1], feat.shape[2]
        feat = feat.reshape(B, H, W, -1)
        N = inp.shape[1]
        inp_cat = inp.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * 3)
        if out_size is None:
            out_size = (H * 4, W * 4)
        HH, WW = out_size
        Q = HH * WW

        coord = jnp.clip(make_coord((HH, WW)), -1 + _EPS, 1 - _EPS)
        coord = jnp.broadcast_to(coord[None], (B, Q, 2))
        cxy = coord[..., ::-1]
        feat_coord = jnp.broadcast_to(
            make_coord((H, W), flatten=False)[None], (B, H, W, 2)
        )

        q_feat_a = grid_sample(feat, cxy, mode="nearest")
        q_inp_a = grid_sample(inp_cat, cxy, mode="nearest")
        q_coord = grid_sample(feat_coord, cxy, mode="nearest")
        rel = (coord - q_coord) * jnp.asarray([H, W], coord.dtype)

        t_nb = _times_nb(times, B, jnp.float32)  # (nt, B)
        nt = t_nb.shape[0]

        def tile_t(v):
            return jnp.broadcast_to(v[None], (nt,) + v.shape).reshape(
                (nt * v.shape[0],) + v.shape[1:]
            )

        pe = jnp.broadcast_to(t_nb[:, :, None, None],
                              (nt, B, Q, 1)).reshape(nt * B, Q, 1)

        # stage A (no time code): 192 + 6 + 2 = 200 -> 128
        hrfeat_q = self.feat_imnet(
            tile_t(jnp.concatenate([q_feat_a, q_inp_a, rel], axis=-1))
        )
        hrfeat = hrfeat_q.reshape(nt * B, HH, WW, -1)
        # stage B: ALL nearest gathers at LR res + rel + pe: 329 -> 4
        q_feat_b = grid_sample(hrfeat, tile_t(cxy), mode="nearest")
        flow_q = self.flow_imnet(
            jnp.concatenate(
                [q_feat_b, tile_t(q_feat_a), tile_t(q_inp_a), tile_t(rel), pe],
                axis=-1,
            )
        )
        flow = flow_q.reshape(nt * B, HH, WW, 4)
        g1 = jnp.clip(warp_grid(flow[..., :2]), -1 + _EPS, 1 - _EPS)
        g2 = jnp.clip(warp_grid(flow[..., 2:]), -1 + _EPS, 1 - _EPS)
        g1 = g1.reshape(nt * B, Q, 2)
        g2 = g2.reshape(nt * B, Q, 2)
        feat_tl = tile_t(feat)
        inp_tl = tile_t(inp_cat)
        q_feat1 = grid_sample(hrfeat, g1, mode="bilinear")
        q_feat3 = grid_sample(feat_tl, g1, mode="bilinear")
        q_inp1 = grid_sample(inp_tl, g1, mode="bilinear")
        q_feat2 = grid_sample(hrfeat, g2, mode="bilinear")
        q_feat4 = grid_sample(feat_tl, g2, mode="bilinear")
        q_inp2 = grid_sample(inp_tl, g2, mode="bilinear")
        # stage D (no time code): 128*2 + 192*2 + 12 = 652 -> 27 -> fold3x3
        patches = self.encode_imnet(
            jnp.concatenate(
                [q_feat1, q_feat3, q_inp1, q_feat2, q_feat4, q_inp2], axis=-1
            )
        )
        rgb = fold3x3(patches.reshape(nt * B, HH, WW, 27))
        return rgb.reshape(nt, B, HH, WW, 3)

    def __call__(self, x, times, out_size=None):
        feat = self.encoder(x)
        return self.decode(feat, x, times, out_size)


@register_model("LunaTokisS")
class LunaTokisS(nn.Module):
    """Ablation ``Sakuya_arch_test_S.py``: no feat_imnet — the flow comes
    straight from the encoder feature (201->4), and the encoder decodes RGB
    from the two warped encoder-feature/image samples (396->3, no time code
    in stage D). HR input is the bilinear x4 upsample."""

    nf: int = 64
    nframes: int = 6
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 40
    use_pallas: bool = False

    def setup(self):
        self.encoder = _Encoder(self.nf, self.groups, self.front_RBs,
                                self.back_RBs)
        up = self.use_pallas
        self.flow_imnet = Siren([64, 64, 256], 2, 4, outermost_linear=True,
                                use_pallas=up)
        self.encode_imnet = Siren([64, 64, 256, 256], 3, 3,
                                  outermost_linear=True, use_pallas=up)

    def __call__(self, x, times, out_size=None):
        from stif_tpu.ops.resize import resize_bilinear

        feat_t = self.encoder(x)
        feat = feat_t[:, :3].transpose(0, 2, 3, 1, 4)
        B, H, W = feat.shape[0], feat.shape[1], feat.shape[2]
        feat = feat.reshape(B, H, W, -1)
        N = x.shape[1]
        inp_cat = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * 3)
        if out_size is None:
            out_size = (H * 4, W * 4)
        HH, WW = out_size
        Q = HH * WW
        coord = jnp.clip(make_coord((HH, WW)), -1 + _EPS, 1 - _EPS)
        coord = jnp.broadcast_to(coord[None], (B, Q, 2))
        cxy = coord[..., ::-1]
        feat_coord = jnp.broadcast_to(
            make_coord((H, W), flatten=False)[None], (B, H, W, 2)
        )
        q_feat = grid_sample(feat, cxy, mode="nearest")
        q_inp = grid_sample(inp_cat, cxy, mode="nearest")
        q_coord = grid_sample(feat_coord, cxy, mode="nearest")
        rel = (coord - q_coord) * jnp.asarray([H, W], coord.dtype)

        t_nb = _times_nb(times, B, jnp.float32)  # (nt, B)
        nt = t_nb.shape[0]

        def tile_t(v):
            return jnp.broadcast_to(v[None], (nt,) + v.shape).reshape(
                (nt * v.shape[0],) + v.shape[1:])

        pe = jnp.broadcast_to(t_nb[:, :, None, None],
                              (nt, B, Q, 1)).reshape(nt * B, Q, 1)
        flow_q = self.flow_imnet(
            (tile_t(jnp.concatenate([q_feat, q_inp, rel], axis=-1)), pe))
        flow = flow_q.reshape(nt * B, HH, WW, 4)
        hr_inp = resize_bilinear(inp_cat, scale_factor=4, align_corners=False)
        g1 = jnp.clip(warp_grid(flow[..., :2]), -1 + _EPS, 1 - _EPS)
        g2 = jnp.clip(warp_grid(flow[..., 2:]), -1 + _EPS, 1 - _EPS)
        g1 = g1.reshape(nt * B, Q, 2)
        g2 = g2.reshape(nt * B, Q, 2)
        feat_tl = tile_t(feat)
        hr_tl = tile_t(hr_inp)
        q_feat3 = grid_sample(feat_tl, g1, mode="bilinear")
        q_img1 = grid_sample(hr_tl, g1, mode="bilinear")
        q_feat4 = grid_sample(feat_tl, g2, mode="bilinear")
        q_img2 = grid_sample(hr_tl, g2, mode="bilinear")
        rgb = self.encode_imnet((q_feat3, q_feat4, q_img1, q_img2))
        return rgb.reshape(nt, B, HH, WW, 3)


@register_model("LunaTokisNoFlow")
class LunaTokisNoFlow(nn.Module):
    """Pure-LIIF ablation: single SIREN 201->3, no flow/warp stages
    (``Sakuya_arch_test_noflow.py:303-304``: ``feat_imnet`` with hidden
    [64, 64, 256, 256, 256], decoding over the first 3 feature maps)."""

    nf: int = 64
    nframes: int = 6
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 40
    use_pallas: bool = False

    def setup(self):
        self.encoder = _Encoder(self.nf, self.groups, self.front_RBs,
                                self.back_RBs)
        self.feat_imnet = Siren([64, 64, 256, 256, 256], 4, 3,
                                outermost_linear=True,
                                use_pallas=self.use_pallas)

    def __call__(self, x, times, out_size=None):
        feat_t = self.encoder(x)
        feat = feat_t[:, :3].transpose(0, 2, 3, 1, 4)
        B, H, W = feat.shape[0], feat.shape[1], feat.shape[2]
        feat = feat.reshape(B, H, W, -1)
        N = x.shape[1]
        inp_cat = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * 3)
        if out_size is None:
            out_size = (H * 4, W * 4)
        HH, WW = out_size
        Q = HH * WW
        coord = jnp.clip(make_coord((HH, WW)), -1 + _EPS, 1 - _EPS)
        coord = jnp.broadcast_to(coord[None], (B, Q, 2))
        cxy = coord[..., ::-1]
        feat_coord = jnp.broadcast_to(
            make_coord((H, W), flatten=False)[None], (B, H, W, 2)
        )
        q_feat = grid_sample(feat, cxy, mode="nearest")
        q_inp = grid_sample(inp_cat, cxy, mode="nearest")
        q_coord = grid_sample(feat_coord, cxy, mode="nearest")
        rel = (coord - q_coord) * jnp.asarray([H, W], coord.dtype)

        t_nb = _times_nb(times, B, jnp.float32)  # (nt, B)
        nt = t_nb.shape[0]
        base = jnp.concatenate([q_feat, q_inp, rel], axis=-1)
        base = jnp.broadcast_to(base[None], (nt,) + base.shape)
        pe = jnp.broadcast_to(t_nb[:, :, None, None], (nt, B, Q, 1))
        rgb = self.feat_imnet(jnp.concatenate([base, pe], axis=-1))
        return rgb.reshape(nt, B, HH, WW, 3)
