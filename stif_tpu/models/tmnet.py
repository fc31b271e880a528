"""TMNet — temporal-modulation STVSR model.

Parity target: ``codes/models/modules/STVSR.py``: the Zooming-Slow-Mo
skeleton where PCD alignment gains TMB (Temporal Modulation Block) branches
conditioned on the query time (``:14-36, 89-95, 107-151``), a 3-frame
"non-linear comparison" refinement with two extra DCN_sep alignments
(``:335-357, 424-444``), and a fixed x4 pixel-shuffle output (``:452-459``).

Selected via ``which_model_G: TMNet`` in the reference's network factory
(``codes/models/networks.py:19-22``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.models.registry import register_model
from stif_tpu.nn.blocks import Conv, ResidualTrunk, lrelu
from stif_tpu.nn.convlstm import BiDeformableConvLSTM
from stif_tpu.nn.dcn import DCNSep
from stif_tpu.ops.pixel_shuffle import pixel_shuffle


class TMB(nn.Module):
    """feature * MLP(t): t enters as a (B, 1, 1, 1) one-channel map through
    three bias-free 1x1 convs; the feature branch is two 3x3 convs.
    (The reference hardcodes 64 channels — ``nf`` generalizes it.)"""

    nf: int = 64

    @nn.compact
    def __call__(self, x, t):
        nf = self.nf
        m = lrelu(Conv(nf, 1, 1, 0, use_bias=False, name="t_process_0")(t))
        m = lrelu(Conv(nf, 1, 1, 0, use_bias=False, name="t_process_2")(m))
        m = lrelu(Conv(nf, 1, 1, 0, use_bias=False, name="t_process_4")(m))
        f = lrelu(Conv(nf, 3, 1, 1, name="f_process_0")(x))
        f = lrelu(Conv(nf, 3, 1, 1, name="f_process_2")(f))
        return f * m


class PCDAlignTM(nn.Module):
    """PCD alignment with optional TMB time modulation added to the last
    offset conv of each level (``STVSR.py:107-151``)."""

    nf: int = 64
    groups: int = 8
    use_time: bool = True

    @nn.compact
    def __call__(self, fea1, fea2, t=None, t_back=None):
        nf, G = self.nf, self.groups
        from stif_tpu.ops.resize import resize_bilinear

        def up_to(x, ref):
            return resize_bilinear(x, size=ref.shape[1:3], align_corners=False)

        tmbs = {}
        if self.use_time:
            for side in ("A", "B"):
                for lvl in (1, 2, 3):
                    name = f"TMB_{side}_l{lvl}"
                    tmbs[name] = TMB(nf, name=name)

        outs = []
        for suffix, a, b, tt in (("1", fea1, fea2, t), ("2", fea2, fea1, t_back)):
            side = "A" if suffix == "1" else "B"

            def with_tmb(base, lvl, off):
                if self.use_time and tt is not None:
                    return base + tmbs[f"TMB_{side}_l{lvl}"](off, tt)
                return base

            # L3
            off = jnp.concatenate([a[2], b[2]], axis=-1)
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L3_offset_conv1_{suffix}")(off))
            pre = off
            off = with_tmb(
                lrelu(Conv(nf, 3, 1, 1, name=f"L3_offset_conv2_{suffix}")(pre)),
                3, pre,
            )
            l3_fea = lrelu(DCNSep(nf, deformable_groups=G,
                                  name=f"L3_dcnpack_{suffix}")(a[2], off))
            l3_offset = off
            # L2
            off = jnp.concatenate([a[1], b[1]], axis=-1)
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L2_offset_conv1_{suffix}")(off))
            off = lrelu(
                Conv(nf, 3, 1, 1, name=f"L2_offset_conv2_{suffix}")(
                    jnp.concatenate([off, up_to(l3_offset, a[1]) * 2], axis=-1)
                )
            )
            pre = off
            off = with_tmb(
                lrelu(Conv(nf, 3, 1, 1, name=f"L2_offset_conv3_{suffix}")(pre)),
                2, pre,
            )
            l2_fea = DCNSep(nf, deformable_groups=G,
                            name=f"L2_dcnpack_{suffix}")(a[1], off)
            l2_fea = lrelu(
                Conv(nf, 3, 1, 1, name=f"L2_fea_conv_{suffix}")(
                    jnp.concatenate([l2_fea, up_to(l3_fea, a[1])], axis=-1)
                )
            )
            l2_offset = off
            # L1
            off = jnp.concatenate([a[0], b[0]], axis=-1)
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L1_offset_conv1_{suffix}")(off))
            off = lrelu(
                Conv(nf, 3, 1, 1, name=f"L1_offset_conv2_{suffix}")(
                    jnp.concatenate([off, up_to(l2_offset, a[0]) * 2], axis=-1)
                )
            )
            pre = off
            off = with_tmb(
                lrelu(Conv(nf, 3, 1, 1, name=f"L1_offset_conv3_{suffix}")(pre)),
                1, pre,
            )
            l1_fea = DCNSep(nf, deformable_groups=G,
                            name=f"L1_dcnpack_{suffix}")(a[0], off)
            l1_fea = Conv(nf, 3, 1, 1, name=f"L1_fea_conv_{suffix}")(
                jnp.concatenate([l1_fea, up_to(l2_fea, a[0])], axis=-1)
            )
            outs.append(l1_fea)
        return jnp.concatenate(outs, axis=-1)


@register_model("TMNet")
class TMNet(nn.Module):
    nf: int = 64
    nframes: int = 3
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 10

    def setup(self):
        nf = self.nf
        self.conv_first = Conv(nf, 3, 1, 1)
        self.feature_extraction = ResidualTrunk(nf, self.front_RBs)
        self.fea_L2_conv1 = Conv(nf, 3, 2, 1)
        self.fea_L2_conv2 = Conv(nf, 3, 1, 1)
        self.fea_L3_conv1 = Conv(nf, 3, 2, 1)
        self.fea_L3_conv2 = Conv(nf, 3, 1, 1)
        self.pcd_align = PCDAlignTM(nf, self.groups, use_time=True)
        self.fusion = Conv(nf, 1, 1, 0)
        self.ConvBLSTM = BiDeformableConvLSTM(nf, self.groups)
        self.recon_trunk = ResidualTrunk(nf, self.back_RBs)
        self.upconv1 = Conv(nf * 4, 3, 1, 1)
        self.upconv2 = Conv(64 * 4, 3, 1, 1)
        self.HRconv = Conv(64, 3, 1, 1)
        self.conv_last = Conv(3, 3, 1, 1)
        # non-linear comparison refinement (:335-357)
        self.layersAtBOffset_0 = Conv(nf, 3, 1, 1)
        self.layersAtBOffset_2 = Conv(nf, 3, 1, 1)
        self.layersAtB = DCNSep(nf, deformable_groups=self.groups)
        self.layersCtBOffset_0 = Conv(nf, 3, 1, 1)
        self.layersCtBOffset_2 = Conv(nf, 3, 1, 1)
        self.layersCtB = DCNSep(nf, deformable_groups=self.groups)
        self.layersFusion_0 = Conv(3 * nf, 1, 1, 0)
        self.layersFusion_2 = Conv(3 * nf, 1, 1, 0)
        self.layersFusion_4 = Conv(3 * nf, 1, 1, 0)
        self.layersFusion_6 = Conv(nf, 1, 1, 0)

    def __call__(self, x, t=None):
        """x: (B, N, H, W, 3); t: (B, t_N) query times or None (plain ZSM
        interleaving). Returns (B, T, 4H, 4W, 3)."""
        use_time = t is not None
        if use_time:
            t = jnp.asarray(t)
            t_back = 1.0 - t
            t_n = (t / 0.5) - 1.0       # (B, t_N), normalized to [-1, 1]
            t_back_n = (t_back / 0.5) - 1.0
            t_N = t.shape[1]

        B, N, H, W, C = x.shape
        xf = x.reshape(B * N, H, W, C)
        l1 = lrelu(self.conv_first(xf))
        l1 = self.feature_extraction(l1)
        l2 = lrelu(self.fea_L2_conv1(l1))
        l2 = lrelu(self.fea_L2_conv2(l2))
        l3 = lrelu(self.fea_L3_conv1(l2))
        l3 = lrelu(self.fea_L3_conv2(l3))
        l1 = l1.reshape(B, N, H, W, -1)
        l2 = l2.reshape(B, N, H // 2, W // 2, -1)
        l3 = l3.reshape(B, N, H // 4, W // 4, -1)

        seq = []
        for idx in range(N - 1):
            fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
            fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
            if idx == 0:
                seq.append(fea1[0])
            if use_time:
                for i in range(t_N):
                    ti = t_n[:, i].reshape(B, 1, 1, 1)
                    tbi = t_back_n[:, i].reshape(B, 1, 1, 1)
                    aligned = self.pcd_align(fea1, fea2, ti, tbi)
                    seq.append(self.fusion(aligned))
            else:
                aligned = self.pcd_align(fea1, fea2)
                seq.append(self.fusion(aligned))
            seq.append(fea2[0])
        dnc_feats = jnp.stack(seq, axis=1)  # (B, T, H, W, nf)
        back_feats = dnc_feats
        T = dnc_feats.shape[1]

        # non-linear comparison: align (i-1, i+1) to i, fuse, residual
        refined = []
        for i in range(T):
            i0 = 0 if i == 0 else i - 1
            i2 = T - 1 if i == T - 1 else i + 1
            fea0 = dnc_feats[:, i0]
            fea1_ = dnc_feats[:, i]
            fea2 = dnc_feats[:, i2]
            off_a = self.layersAtBOffset_2(
                lrelu(self.layersAtBOffset_0(
                    jnp.concatenate([fea0, fea1_], axis=-1)))
            )
            fea0_al = lrelu(self.layersAtB(fea0, off_a))
            off_c = self.layersCtBOffset_2(
                lrelu(self.layersCtBOffset_0(
                    jnp.concatenate([fea2, fea1_], axis=-1)))
            )
            fea2_al = lrelu(self.layersCtB(fea2, off_c))
            f = jnp.concatenate([fea0_al, fea1_, fea2_al], axis=-1)
            f = lrelu(self.layersFusion_0(f))
            f = lrelu(self.layersFusion_2(f))
            f = lrelu(self.layersFusion_4(f))
            refined.append(self.layersFusion_6(f))
        lstm_feats = dnc_feats + jnp.stack(refined, axis=1)

        feats = self.ConvBLSTM(lstm_feats)
        B2, T2, Hf, Wf, Cf = feats.shape
        out = self.recon_trunk(feats.reshape(B2 * T2, Hf, Wf, Cf))
        out = out + back_feats.reshape(B2 * T2, Hf, Wf, Cf)
        out = lrelu(pixel_shuffle(self.upconv1(out), 2))
        out = lrelu(pixel_shuffle(self.upconv2(out), 2))
        out = lrelu(self.HRconv(out))
        out = self.conv_last(out)
        return out.reshape(B2, T2, 4 * Hf, 4 * Wf, 3)
