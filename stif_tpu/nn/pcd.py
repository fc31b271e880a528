"""PCD (Pyramid, Cascading & Deformable) alignment.

Parity target: ``PCD_Align`` / ``Easy_PCD``
(``codes/models/modules/Sakuya_arch_test.py:20-166``): 3-level bidirectional
pyramid alignment with 6 DCN_sep instances; coarser offsets are bilinearly
upsampled x2 and scaled x2. Activation placement (which convs get leaky-ReLU
and which don't) follows the reference exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.nn.blocks import Conv, lrelu
from stif_tpu.nn.dcn import DCNSep
from stif_tpu.ops.resize import resize_bilinear


def _up2(x):
    return resize_bilinear(x, scale_factor=2, align_corners=False)


class PCDAlign(nn.Module):
    nf: int = 64
    groups: int = 8

    @nn.compact
    def __call__(self, fea1, fea2):
        """fea1, fea2: [L1, L2, L3] NHWC pyramids. Returns (B, H, W, 2*nf):
        both directions' aligned L1 features, concatenated."""
        nf, G = self.nf, self.groups
        outs = []
        for suffix, a, b in (("1", fea1, fea2), ("2", fea2, fea1)):
            # L3
            off = jnp.concatenate([a[2], b[2]], axis=-1)
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L3_offset_conv1_{suffix}")(off))
            off = lrelu(Conv(nf, 3, 1, 1, name=f"L3_offset_conv2_{suffix}")(off))
            l3_fea = lrelu(
                DCNSep(nf, deformable_groups=G, name=f"L3_dcnpack_{suffix}")(
                    a[2], off
                )
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
                            name=f"L1_dcnpack_{suffix}")(a[0], off)
            # final fea conv has no activation (Sakuya_arch_test.py:100, 126)
            l1_fea = Conv(nf, 3, 1, 1, name=f"L1_fea_conv_{suffix}")(
                jnp.concatenate([l1_fea, _up2(l2_fea)], axis=-1)
            )
            outs.append(l1_fea)
        return jnp.concatenate(outs, axis=-1)


class EasyPCD(nn.Module):
    """Build L2/L3 pyramids from two single-level maps, align, fuse 1x1."""

    nf: int = 64
    groups: int = 8

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
        aligned = PCDAlign(nf, self.groups, name="pcd_align")(fea1, fea2)
        return Conv(nf, 1, 1, 0, name="fusion")(aligned)
