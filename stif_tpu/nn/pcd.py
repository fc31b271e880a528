"""PCD (Pyramid, Cascading & Deformable) alignment.

Parity target: ``PCD_Align`` / ``Easy_PCD``
(``codes/models/modules/Sakuya_arch_test.py:20-166``): 3-level bidirectional
pyramid alignment with 6 DCN_sep instances; coarser offsets are bilinearly
upsampled x2 and scaled x2. Activation placement (which convs get leaky-ReLU
and which don't) follows the reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.nn.blocks import Conv, lrelu
from stif_tpu.nn.dcn import DCNSep
from stif_tpu.ops.resize import resize_bilinear


def _up2(x):
    return resize_bilinear(x, scale_factor=2, align_corners=False)


def _dual_conv(c1: Conv, c2: Conv, xd):
    """Evaluate two same-shaped 3x3 convs as ONE grouped conv.

    ``xd`` is a "dual tensor" (..., 2*cin): direction-1 channels then
    direction-2 channels. Direction 1 goes through ``c1``'s weights,
    direction 2 through ``c2``'s (``feature_group_count=2`` keeps the groups
    independent), so the result is numerically identical to two separate
    calls while halving the conv op count — the small L2/L3 pyramid convs
    are dispatch-bound on TPU.
    """
    cin = xd.shape[-1] // 2
    k1, b1 = c1.weights(cin)
    k2, b2 = c2.weights(cin)
    k = jnp.concatenate([k1, k2], axis=-1)  # (3, 3, cin, 2*nf)
    dn = jax.lax.conv_dimension_numbers(xd.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xd, k.astype(xd.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=dn,
        feature_group_count=2,
    )
    if b1 is not None:
        y = y + jnp.concatenate([b1, b2]).astype(y.dtype)
    return y


def _dual_cat(xd, yd):
    """Concat two dual tensors per direction: [x1|x2] + [y1|y2] ->
    [x1 y1 | x2 y2]."""
    cx = xd.shape[-1] // 2
    cy = yd.shape[-1] // 2
    return jnp.concatenate(
        [xd[..., :cx], yd[..., :cy], xd[..., cx:], yd[..., cy:]], axis=-1)


class PCDAlign(nn.Module):
    nf: int = 64
    groups: int = 8
    # evaluate the two alignment directions' convs as grouped convs
    # (numerically identical; fewer, larger ops)
    fuse_dirs: bool = True
    gather_dtype: object = None  # e.g. jnp.bfloat16 for faster DCN gathers

    @nn.compact
    def __call__(self, fea1, fea2):
        """fea1, fea2: [L1, L2, L3] NHWC pyramids. Returns (B, H, W, 2*nf):
        both directions' aligned L1 features, concatenated."""
        nf, G = self.nf, self.groups
        if self.fuse_dirs:
            return self._fused(fea1, fea2)
        outs = []
        for suffix, a, b in (("1", fea1, fea2), ("2", fea2, fea1)):
            # L3
            off = jnp.concatenate([a[2], b[2]], axis=-1)
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L3_offset_conv1_{suffix}")(off))
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L3_offset_conv2_{suffix}")(off))
            l3_fea = lrelu(
                DCNSep(nf, deformable_groups=G,
                       gather_dtype=self.gather_dtype,
                       name=f"L3_dcnpack_{suffix}")(a[2], off)
            )
            l3_offset = off
            # L2
            off = jnp.concatenate([a[1], b[1]], axis=-1)
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L2_offset_conv1_{suffix}")(off))
            off = lrelu(
                Conv(nf, 3, 1, 1, name=f"L2_offset_conv2_{suffix}")(
                    jnp.concatenate([off, _up2(l3_offset) * 2], axis=-1)
                )
            )
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L2_offset_conv3_{suffix}")(off))
            l2_fea = DCNSep(nf, deformable_groups=G,
                            gather_dtype=self.gather_dtype,
                            name=f"L2_dcnpack_{suffix}")(a[1], off)
            l2_fea = lrelu(
                Conv(nf, 3, 1, 1, name=f"L2_fea_conv_{suffix}")(
                    jnp.concatenate([l2_fea, _up2(l3_fea)], axis=-1)
                )
            )
            l2_offset = off
            # L1
            off = jnp.concatenate([a[0], b[0]], axis=-1)
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L1_offset_conv1_{suffix}")(off))
            off = lrelu(
                Conv(nf, 3, 1, 1, name=f"L1_offset_conv2_{suffix}")(
                    jnp.concatenate([off, _up2(l2_offset) * 2], axis=-1)
                )
            )
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L1_offset_conv3_{suffix}")(off))
            l1_fea = DCNSep(nf, deformable_groups=G,
                            gather_dtype=self.gather_dtype,
                            name=f"L1_dcnpack_{suffix}")(a[0], off)
            # final fea conv has no activation (Sakuya_arch_test.py:100, 126)
            l1_fea = Conv(nf, 3, 1, 1, name=f"L1_fea_conv_{suffix}")(
                jnp.concatenate([l1_fea, _up2(l2_fea)], axis=-1)
            )
            outs.append(l1_fea)
        return jnp.concatenate(outs, axis=-1)

    def _fused(self, fea1, fea2):
        """Both directions in one pass: every conv pair becomes a grouped
        conv over a "dual tensor" [dir1 channels | dir2 channels]. Same
        parameters, same math, half the conv ops; the 6 DCNs stay separate
        (gather-dominated)."""
        nf, G = self.nf, self.groups

        def C(name):
            return Conv(nf, 3, 1, 1, name=name)

        def dcn(level, src1, src2, od):
            y1 = DCNSep(nf, deformable_groups=G,
                        gather_dtype=self.gather_dtype,
                        name=f"{level}_dcnpack_1")(src1, od[..., :nf])
            y2 = DCNSep(nf, deformable_groups=G,
                        gather_dtype=self.gather_dtype,
                        name=f"{level}_dcnpack_2")(src2, od[..., nf:])
            return jnp.concatenate([y1, y2], axis=-1)

        # L3
        od = jnp.concatenate([fea1[2], fea2[2], fea2[2], fea1[2]], axis=-1)
        od = lrelu(_dual_conv(C("L3_offset_conv1_1"),
                              C("L3_offset_conv1_2"), od))
        od = lrelu(_dual_conv(C("L3_offset_conv2_1"),
                              C("L3_offset_conv2_2"), od))
        l3_offset_d = od
        l3_fea_d = lrelu(dcn("L3", fea1[2], fea2[2], od))
        # L2
        od = jnp.concatenate([fea1[1], fea2[1], fea2[1], fea1[1]], axis=-1)
        od = lrelu(_dual_conv(C("L2_offset_conv1_1"),
                              C("L2_offset_conv1_2"), od))
        od = lrelu(_dual_conv(C("L2_offset_conv2_1"), C("L2_offset_conv2_2"),
                              _dual_cat(od, _up2(l3_offset_d) * 2)))
        od = lrelu(_dual_conv(C("L2_offset_conv3_1"),
                              C("L2_offset_conv3_2"), od))
        l2_offset_d = od
        l2_fea_d = _dual_conv(C("L2_fea_conv_1"), C("L2_fea_conv_2"),
                              _dual_cat(dcn("L2", fea1[1], fea2[1], od),
                                        _up2(l3_fea_d)))
        l2_fea_d = lrelu(l2_fea_d)
        # L1
        od = jnp.concatenate([fea1[0], fea2[0], fea2[0], fea1[0]], axis=-1)
        od = lrelu(_dual_conv(C("L1_offset_conv1_1"),
                              C("L1_offset_conv1_2"), od))
        od = lrelu(_dual_conv(C("L1_offset_conv2_1"), C("L1_offset_conv2_2"),
                              _dual_cat(od, _up2(l2_offset_d) * 2)))
        od = lrelu(_dual_conv(C("L1_offset_conv3_1"),
                              C("L1_offset_conv3_2"), od))
        # final fea conv has no activation (Sakuya_arch_test.py:100, 126)
        return _dual_conv(C("L1_fea_conv_1"), C("L1_fea_conv_2"),
                          _dual_cat(dcn("L1", fea1[0], fea2[0], od),
                                    _up2(l2_fea_d)))


class EasyPCD(nn.Module):
    """Build L2/L3 pyramids from two single-level maps, align, fuse 1x1."""

    nf: int = 64
    groups: int = 8
    gather_dtype: object = None

    @nn.compact
    def __call__(self, f1, f2):
        nf = self.nf
        x = jnp.concatenate([f1, f2], axis=0)  # stack pair along batch
        l2 = lrelu(Conv(nf, 3, 2, 1, name="fea_L2_conv1")(x))
        l2 = lrelu(Conv(nf, 3, 1, 1, name="fea_L2_conv2")(l2))
        l3 = lrelu(Conv(nf, 3, 2, 1, name="fea_L3_conv1")(l2))
        l3 = lrelu(Conv(nf, 3, 1, 1, name="fea_L3_conv2")(l3))
        B = f1.shape[0]
        fea1 = [x[:B], l2[:B], l3[:B]]
        fea2 = [x[B:], l2[B:], l3[B:]]
        aligned = PCDAlign(nf, self.groups, gather_dtype=self.gather_dtype,
                           name="pcd_align")(fea1, fea2)
        return Conv(nf, 1, 1, 0, name="fusion")(aligned)
