"""Independent PyTorch implementation of the STIF model family.

Purpose (not part of the TPU framework):
  1. parity oracle — built from the reference's documented semantics
     (``codes/models/modules/Sakuya_arch_test.py``), using torch's own
     ``F.grid_sample`` / ``F.interpolate`` kernels, so the JAX model can be
     verified end-to-end against a genuinely different execution stack;
  2. CPU baseline for BASELINE.md's frames/sec comparison (the reference
     itself cannot run anywhere without its CUDA-only DCNv2 extension).

Weights interop with the flax model via
``stif_tpu.convert.flax_params_to_torch_state``.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------- DCNv2


def dcn_v2_forward(x, offset, mask, weight, bias, stride=1, padding=1,
                   dilation=1, deformable_groups=8):
    """Vectorized modulated deformable conv, CUDA-kernel semantics
    (zero-padded bilinear sampling, per-group offsets, dense contraction).

    x: (B, Cin, H, W); offset: (B, 2*G*K, Ho, Wo) interleaved (dy, dx) per
    group; mask: (B, G*K, Ho, Wo); weight: (Cout, Cin, kh, kw).
    """
    B, Cin, H, W = x.shape
    Cout, _, kh, kw = weight.shape
    K = kh * kw
    G = deformable_groups
    CpG = Cin // G
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    off = offset.view(B, G, K, 2, Ho, Wo)
    m = mask.view(B, G, K, Ho, Wo)

    ys = torch.arange(Ho, dtype=x.dtype) * stride - padding
    xs = torch.arange(Wo, dtype=x.dtype) * stride - padding
    ti = (torch.arange(kh, dtype=x.dtype) * dilation).repeat_interleave(kw)
    tj = (torch.arange(kw, dtype=x.dtype) * dilation).repeat(kh)

    py = ys.view(1, 1, 1, Ho, 1) + ti.view(1, 1, K, 1, 1) + off[:, :, :, 0]
    px = xs.view(1, 1, 1, 1, Wo) + tj.view(1, 1, K, 1, 1) + off[:, :, :, 1]

    y0 = torch.floor(py)
    x0 = torch.floor(px)
    ly, lx = py - y0, px - x0
    y0, x0 = y0.long(), x0.long()
    y1, x1 = y0 + 1, x0 + 1

    xg = x.view(B, G, CpG, H * W)

    def corner(yc, xc, w):
        valid = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
        idx = (yc.clamp(0, H - 1) * W + xc.clamp(0, W - 1))  # (B,G,K,Ho,Wo)
        idx = idx.view(B, G, 1, K * Ho * Wo).expand(B, G, CpG, K * Ho * Wo)
        v = torch.gather(xg, 3, idx).view(B, G, CpG, K, Ho, Wo)
        return v * (w * valid.to(x.dtype)).unsqueeze(2)

    col = (
        corner(y0, x0, (1 - ly) * (1 - lx))
        + corner(y0, x1, (1 - ly) * lx)
        + corner(y1, x0, ly * (1 - lx))
        + corner(y1, x1, ly * lx)
    )
    col = col * m.unsqueeze(2)  # (B, G, CpG, K, Ho, Wo)
    wr = weight.view(Cout, G, CpG, K)
    out = torch.einsum("bgckyx,ogck->boyx", col, wr)
    return out + bias.view(1, Cout, 1, 1)


class DCNSep(nn.Module):
    def __init__(self, nf=64, groups=8, k=3):
        super().__init__()
        self.groups = groups
        self.conv_offset_mask = nn.Conv2d(nf, groups * 3 * k * k, k, 1, k // 2)
        self.weight = nn.Parameter(torch.zeros(nf, nf, k, k))
        self.bias = nn.Parameter(torch.zeros(nf))
        self.k = k

    def forward(self, x, fea):
        out = self.conv_offset_mask(fea)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        return dcn_v2_forward(x, offset, mask, self.weight, self.bias,
                              deformable_groups=self.groups)


# ----------------------------------------------------------------- encoder


def lrelu(x):
    return F.leaky_relu(x, 0.1)


class ResBlock(nn.Module):
    def __init__(self, nf):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv2 = nn.Conv2d(nf, nf, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(x)))


def _up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


class PCDAlign(nn.Module):
    def __init__(self, nf=64, groups=8):
        super().__init__()
        for s in ("1", "2"):
            setattr(self, f"L3_offset_conv1_{s}", nn.Conv2d(nf * 2, nf, 3, 1, 1))
            setattr(self, f"L3_offset_conv2_{s}", nn.Conv2d(nf, nf, 3, 1, 1))
            setattr(self, f"L3_dcnpack_{s}", DCNSep(nf, groups))
            setattr(self, f"L2_offset_conv1_{s}", nn.Conv2d(nf * 2, nf, 3, 1, 1))
            setattr(self, f"L2_offset_conv2_{s}", nn.Conv2d(nf * 2, nf, 3, 1, 1))
            setattr(self, f"L2_offset_conv3_{s}", nn.Conv2d(nf, nf, 3, 1, 1))
            setattr(self, f"L2_dcnpack_{s}", DCNSep(nf, groups))
            setattr(self, f"L2_fea_conv_{s}", nn.Conv2d(nf * 2, nf, 3, 1, 1))
            setattr(self, f"L1_offset_conv1_{s}", nn.Conv2d(nf * 2, nf, 3, 1, 1))
            setattr(self, f"L1_offset_conv2_{s}", nn.Conv2d(nf * 2, nf, 3, 1, 1))
            setattr(self, f"L1_offset_conv3_{s}", nn.Conv2d(nf, nf, 3, 1, 1))
            setattr(self, f"L1_dcnpack_{s}", DCNSep(nf, groups))
            setattr(self, f"L1_fea_conv_{s}", nn.Conv2d(nf * 2, nf, 3, 1, 1))

    def forward(self, fea1, fea2):
        ys = []
        for s, a, b in (("1", fea1, fea2), ("2", fea2, fea1)):
            g = lambda n: getattr(self, f"{n}_{s}")
            off = torch.cat([a[2], b[2]], dim=1)
            off = lrelu(g("L3_offset_conv1")(off))
            off = lrelu(g("L3_offset_conv2")(off))
            l3_fea = lrelu(g("L3_dcnpack")(a[2], off))
            l3_off = off
            off = torch.cat([a[1], b[1]], dim=1)
            off = lrelu(g("L2_offset_conv1")(off))
            off = lrelu(g("L2_offset_conv2")(torch.cat([off, _up2(l3_off) * 2], 1)))
            off = lrelu(g("L2_offset_conv3")(off))
            l2_fea = g("L2_dcnpack")(a[1], off)
            l2_fea = lrelu(g("L2_fea_conv")(torch.cat([l2_fea, _up2(l3_fea)], 1)))
            l2_off = off
            off = torch.cat([a[0], b[0]], dim=1)
            off = lrelu(g("L1_offset_conv1")(off))
            off = lrelu(g("L1_offset_conv2")(torch.cat([off, _up2(l2_off) * 2], 1)))
            off = lrelu(g("L1_offset_conv3")(off))
            l1_fea = g("L1_dcnpack")(a[0], off)
            l1_fea = g("L1_fea_conv")(torch.cat([l1_fea, _up2(l2_fea)], 1))
            ys.append(l1_fea)
        return torch.cat(ys, dim=1)


class EasyPCD(nn.Module):
    def __init__(self, nf=64, groups=8):
        super().__init__()
        self.fea_L2_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L2_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.fea_L3_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L3_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.pcd_align = PCDAlign(nf, groups)
        self.fusion = nn.Conv2d(2 * nf, nf, 1, 1)

    def forward(self, f1, f2):
        l1 = torch.stack([f1, f2], dim=1)
        B, N, C, H, W = l1.shape
        l1 = l1.view(-1, C, H, W)
        l2 = lrelu(self.fea_L2_conv2(lrelu(self.fea_L2_conv1(l1))))
        l3 = lrelu(self.fea_L3_conv2(lrelu(self.fea_L3_conv1(l2))))
        l1 = l1.view(B, N, -1, H, W)
        l2 = l2.view(B, N, -1, H // 2, W // 2)
        l3 = l3.view(B, N, -1, H // 4, W // 4)
        fea1 = [l1[:, 0], l2[:, 0], l3[:, 0]]
        fea2 = [l1[:, 1], l2[:, 1], l3[:, 1]]
        return self.fusion(self.pcd_align(fea1, fea2))


class ConvLSTMCell(nn.Module):
    def __init__(self, nf=64):
        super().__init__()
        self.conv = nn.Conv2d(2 * nf, 4 * nf, 3, 1, 1)

    def forward(self, x, state):
        h, c = state
        gates = self.conv(torch.cat([x, h], dim=1))
        i, f, o, g = torch.chunk(gates, 4, dim=1)
        c_next = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        h_next = torch.sigmoid(o) * torch.tanh(c_next)
        return h_next, c_next


class DeformableConvLSTM(nn.Module):
    def __init__(self, nf=64, groups=8):
        super().__init__()
        self.pcd_h = EasyPCD(nf, groups)
        self.pcd_c = EasyPCD(nf, groups)
        self.cell_list = nn.ModuleList([ConvLSTMCell(nf)])
        self.nf = nf

    def forward(self, x):
        B, T, C, H, W = x.shape
        h = x.new_zeros(B, self.nf, H, W)
        c = x.new_zeros(B, self.nf, H, W)
        outs = []
        for t in range(T):
            xt = x[:, t]
            h_temp = self.pcd_h(xt, h)
            c_temp = self.pcd_c(xt, c)
            h, c = self.cell_list[0](xt, (h_temp, c_temp))
            outs.append(h)
        return torch.stack(outs, dim=1)


class BiDeformableConvLSTM(nn.Module):
    def __init__(self, nf=64, groups=8):
        super().__init__()
        self.forward_net = DeformableConvLSTM(nf, groups)
        self.conv_1x1 = nn.Conv2d(2 * nf, nf, 1, 1)

    def forward(self, x):
        rev = torch.flip(x, dims=[1])
        out_f = self.forward_net(x)
        out_r = torch.flip(self.forward_net(rev), dims=[1])
        B, T, C, H, W = out_f.shape
        merged = torch.cat([out_f, out_r], dim=2).view(B * T, 2 * C, H, W)
        return self.conv_1x1(merged).view(B, T, C, H, W)


# --------------------------------------------------------------- full model


def make_coord(shape, flatten=True):
    seqs = []
    for n in shape:
        r = 1.0 / n
        seqs.append(-1 + r + 2 * r * torch.arange(n).float())
    ret = torch.stack(torch.meshgrid(*seqs, indexing="ij"), dim=-1)
    if flatten:
        ret = ret.view(-1, ret.shape[-1])
    return ret


class Siren(nn.Module):
    def __init__(self, in_f, hidden, n_hidden, out_f):
        super().__init__()
        layers = []
        dims = [in_f] + list(hidden)
        net = []
        for i in range(n_hidden + 1):
            lin = nn.Linear(dims[i], dims[i + 1])
            net.append(nn.ModuleDict({"linear": lin}))
        self.net = nn.ModuleList(net)
        self.final = nn.Linear(dims[-1], out_f)

    def forward(self, x):
        for blk in self.net:
            x = torch.sin(30.0 * blk["linear"](x))
        return self.final(x)


class LunaTokis(nn.Module):
    def __init__(self, nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
        self.feature_extraction = nn.Sequential(
            *[ResBlock(nf) for _ in range(front_RBs)]
        )
        self.fea_L2_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L2_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.fea_L3_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L3_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.pcd_align = PCDAlign(nf, groups)
        self.fusion = nn.Conv2d(2 * nf, nf, 1, 1)
        self.ConvBLSTM = BiDeformableConvLSTM(nf, groups)
        self.recon_trunk = nn.Sequential(*[ResBlock(nf) for _ in range(back_RBs)])
        self.upconv1 = nn.Conv2d(nf, nf * 4, 3, 1, 1)
        self.upconv2 = nn.Conv2d(nf, 64 * 4, 3, 1, 1)
        self.HRconv = nn.Conv2d(64, 64, 3, 1, 1)
        self.conv_last = nn.Conv2d(64, 3, 3, 1, 1)
        # in_features scale with nf (201/263/525 at nf=64, N=2 input frames)
        self.feat_imnet = Siren(3 * nf + 9, [64, 64, 256], 2, 64)
        self.flow_imnet = Siren(3 * nf + 71, [64, 64, 256], 2, 4)
        self.encode_imnet = Siren(6 * nf + 141, [64, 64, 256, 256], 3, 3)

    def gen_feat(self, x):
        self.inp = x
        B, N, C, H, W = x.shape
        l1 = lrelu(self.conv_first(x.view(-1, C, H, W)))
        l1 = self.feature_extraction(l1)
        l2 = lrelu(self.fea_L2_conv2(lrelu(self.fea_L2_conv1(l1))))
        l3 = lrelu(self.fea_L3_conv2(lrelu(self.fea_L3_conv1(l2))))
        l1 = l1.view(B, N, -1, H, W)
        l2 = l2.view(B, N, -1, H // 2, W // 2)
        l3 = l3.view(B, N, -1, H // 4, W // 4)
        seq = []
        for idx in range(N - 1):
            fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
            fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
            fused = self.fusion(self.pcd_align(fea1, fea2))
            if idx == 0:
                seq.append(fea1[0])
            seq.append(fused)
            seq.append(fea2[0])
        feats = self.ConvBLSTM(torch.stack(seq, dim=1))
        B2, T, C2, H2, W2 = feats.shape
        out = self.recon_trunk(feats.view(-1, C2, H2, W2))
        self.feat = out.view(B2, T, C2, H2, W2)

    def decoding(self, times, scale=None, test=False):
        feat = torch.cat([self.feat[:, i] for i in range(self.feat.shape[1])], 1)
        bs, Cf, H, W = feat.shape
        if scale is None:
            HH, WW = H * 4, W * 4
        elif test:
            HH, WW = H * scale, W * scale
        else:
            HH, WW = scale
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6, 1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode, align_corners=False
            )[:, :, 0, :].permute(0, 2, 1)

        inp_cat = self.inp.view(bs, -1, H, W)
        hr_inp = (
            F.interpolate(inp_cat, scale_factor=4, mode="bilinear",
                          align_corners=False)
            if test else inp_cat
        )
        preds = []
        for t in times:
            qs = coord_hr.shape[1]
            q_feat = gs(feat, coord_hr, "nearest")
            q_inp = gs(inp_cat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = coord_hr - q_coord
            rel = rel * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            hrfeat = self.feat_imnet(torch.cat([q_feat, q_inp, rel, pe], -1))
            hrfeat = hrfeat.permute(0, 2, 1).view(bs, 64, HH, WW)
            q_feat_b = gs(hrfeat, coord_hr, "nearest")
            q_inp_b = gs(hr_inp, coord_hr, "bilinear")
            q_feat0 = gs(feat, coord_hr, "bilinear")
            flow = self.flow_imnet(torch.cat([q_feat_b, q_feat0, q_inp_b, pe], -1))
            flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)

            def wgrid(fl):
                hor = torch.linspace(-1, 1, WW).view(1, 1, 1, WW).expand(bs, 1, HH, WW)
                ver = torch.linspace(-1, 1, HH).view(1, 1, HH, 1).expand(bs, 1, HH, WW)
                base = torch.cat([hor, ver], 1)
                fn = torch.cat(
                    [fl[:, 0:1] / ((WW - 1) / 2), fl[:, 1:2] / ((HH - 1) / 2)], 1
                )
                return (base + fn).permute(0, 2, 3, 1)

            g1 = wgrid(flow[:, :2]).view(bs, -1, 2).clamp(-1 + 1e-6, 1 - 1e-6)
            g2 = wgrid(flow[:, 2:]).view(bs, -1, 2).clamp(-1 + 1e-6, 1 - 1e-6)
            # reference flips to (y,x), clamps, then flips back for sampling;
            # net effect: clamp on the (x,y) grid. gs() flips, so pre-flip.
            g1 = g1.flip(-1)
            g2 = g2.flip(-1)
            q_feat1 = gs(hrfeat, g1, "bilinear")
            q_img1 = gs(hr_inp, g1, "bilinear")
            q_feat3 = gs(feat, g1, "bilinear")
            q_feat2 = gs(hrfeat, g2, "bilinear")
            q_img2 = gs(hr_inp, g2, "bilinear")
            q_feat4 = gs(feat, g2, "bilinear")
            rgb = self.encode_imnet(
                torch.cat(
                    [q_feat1, q_feat2, q_feat3, q_feat4, q_img1, q_img2, pe], -1
                )
            )
            preds.append(rgb.permute(0, 2, 1).view(bs, 3, HH, WW))
        return preds

    def decoding_localensemble(self, times):
        """Reference ``decoding_localensemble`` (``Sakuya_arch_test.py:962-
        1085``): 4 (+-rx, +-ry)-shifted decode passes blended by rel-coord
        areas with the LIIF diagonal swap; HR input stays at LR resolution
        (the upsample is commented out in the reference). Per-time loop —
        equivalent to the reference's time-as-batch for B=1."""
        feat = torch.cat([self.feat[:, i] for i in range(self.feat.shape[1])], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        inp_cat = self.inp.view(bs, -1, H, W)
        rx = 2 / H / 2
        ry = 2 / W / 2
        outs = []
        for t in times:
            preds, areas = [], []
            for vx in (-1, 1):
                for vy in (-1, 1):
                    coord_ = coord_hr.clone()
                    coord_[:, :, 0] += vx * rx + 1e-6
                    coord_[:, :, 1] += vy * ry + 1e-6
                    coord_.clamp_(-1 + 1e-6, 1 - 1e-6)
                    q_feat = gs(feat, coord_, "nearest")
                    q_inp = gs(inp_cat, coord_, "nearest")
                    q_coord = gs(feat_coord, coord_, "nearest")
                    rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
                    areas.append(
                        torch.abs(rel[:, :, 0] * rel[:, :, 1]) + 1e-9)
                    pe = torch.ones_like(coord_hr[:, :, :1]) * t
                    hrfeat = self.feat_imnet(
                        torch.cat([q_feat, q_inp, rel, pe], -1))
                    hrfeat = hrfeat.permute(0, 2, 1).view(bs, 64, HH, WW)
                    q_feat_b = gs(hrfeat, coord_, "nearest")
                    q_inp_b = gs(inp_cat, coord_, "bilinear")
                    q_feat0 = gs(feat, coord_, "bilinear")
                    flow = self.flow_imnet(
                        torch.cat([q_feat_b, q_feat0, q_inp_b, pe], -1))
                    flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)

                    def wgrid(fl):
                        hor = torch.linspace(-1, 1, WW).view(1, 1, 1, WW) \
                            .expand(bs, 1, HH, WW)
                        ver = torch.linspace(-1, 1, HH).view(1, 1, HH, 1) \
                            .expand(bs, 1, HH, WW)
                        base = torch.cat([hor, ver], 1)
                        fn = torch.cat(
                            [fl[:, 0:1] / ((WW - 1) / 2),
                             fl[:, 1:2] / ((HH - 1) / 2)], 1)
                        return (base + fn).permute(0, 2, 3, 1)

                    g1 = wgrid(flow[:, :2]).view(bs, -1, 2).clamp(
                        -1 + 1e-6, 1 - 1e-6).flip(-1)
                    g2 = wgrid(flow[:, 2:]).view(bs, -1, 2).clamp(
                        -1 + 1e-6, 1 - 1e-6).flip(-1)
                    q_feat1 = gs(hrfeat, g1, "bilinear")
                    q_img1 = gs(inp_cat, g1, "bilinear")
                    q_feat3 = gs(feat, g1, "bilinear")
                    q_feat2 = gs(hrfeat, g2, "bilinear")
                    q_img2 = gs(inp_cat, g2, "bilinear")
                    q_feat4 = gs(feat, g2, "bilinear")
                    rgb = self.encode_imnet(torch.cat(
                        [q_feat1, q_feat2, q_feat3, q_feat4,
                         q_img1, q_img2, pe], -1))
                    preds.append(rgb.permute(0, 2, 1).view(bs, 3, HH, WW))
            tot = torch.stack(areas).sum(0)
            areas = [areas[3], areas[2], areas[1], areas[0]]
            ret = 0
            for p, a in zip(preds, areas):
                ret = ret + p * (a / tot).view(bs, 1, HH, WW)
            outs.append(ret)
        return outs

    def forward(self, x, times, scale=None, test=False):
        self.gen_feat(x)
        return self.decoding(times, scale, test)


# -------------------------------------------------- train-variant (fold-27)


class EncoderM(nn.Module):
    """The shared LunaTokis encoder as a nested module (matches the flax
    variants' ``encoder`` submodule naming)."""

    def __init__(self, nf=64, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
        self.feature_extraction = nn.Sequential(
            *[ResBlock(nf) for _ in range(front_RBs)])
        self.fea_L2_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L2_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.fea_L3_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L3_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.pcd_align = PCDAlign(nf, groups)
        self.fusion = nn.Conv2d(2 * nf, nf, 1, 1)
        self.ConvBLSTM = BiDeformableConvLSTM(nf, groups)
        self.recon_trunk = nn.Sequential(
            *[ResBlock(nf) for _ in range(back_RBs)])

    def forward(self, x):
        B, N, C, H, W = x.shape
        l1 = lrelu(self.conv_first(x.view(-1, C, H, W)))
        l1 = self.feature_extraction(l1)
        l2 = lrelu(self.fea_L2_conv2(lrelu(self.fea_L2_conv1(l1))))
        l3 = lrelu(self.fea_L3_conv2(lrelu(self.fea_L3_conv1(l2))))
        l1 = l1.view(B, N, -1, H, W)
        l2 = l2.view(B, N, -1, H // 2, W // 2)
        l3 = l3.view(B, N, -1, H // 4, W // 4)
        seq = []
        for idx in range(N - 1):
            fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
            fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
            fused = self.fusion(self.pcd_align(fea1, fea2))
            if idx == 0:
                seq.append(fea1[0])
            seq.append(fused)
            seq.append(fea2[0])
        feats = self.ConvBLSTM(torch.stack(seq, dim=1))
        B2, T, C2, H2, W2 = feats.shape
        out = self.recon_trunk(feats.view(-1, C2, H2, W2))
        return out.view(B2, T, C2, H2, W2)


class LunaTokisTrain(nn.Module):
    """Mirror of the train variant's decoder (``Sakuya_arch.py:359-459``):
    stage A without time code (200->128), stage B all-nearest LR gathers
    with rel_coord + pe (329->4), stage D without time code (652->27)
    assembled by a 3x3 overlap-add ``F.fold``."""

    def __init__(self, nf=64, nframes=7, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.encoder = EncoderM(nf, groups, front_RBs, back_RBs)
        self.feat_imnet = Siren(3 * nf + 8, [64, 64, 64, 256], 3, 128)
        self.flow_imnet = Siren(128 + 3 * nf + 9, [64, 64, 64, 256], 3, 4)
        self.encode_imnet = Siren(2 * 128 + 6 * nf + 12,
                                  [64, 64, 64, 256, 256], 4, 27)

    def forward(self, x, times):
        feat_t = self.encoder(x)
        feat = torch.cat([feat_t[:, 0], feat_t[:, 1], feat_t[:, 2]], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        # reference: self.inp.view(bs, -1, H, W) — frame-major channel order
        inp_cat = x.reshape(bs, -1, H, W)
        preds = []
        for t in times:
            q_feat = gs(feat, coord_hr, "nearest")
            q_inp = gs(inp_cat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            hrfeat = self.feat_imnet(torch.cat([q_feat, q_inp, rel], -1))
            hrfeat = hrfeat.permute(0, 2, 1).view(bs, 128, HH, WW)
            q_feat_b = gs(hrfeat, coord_hr, "nearest")
            flow = self.flow_imnet(
                torch.cat([q_feat_b, q_feat, q_inp, rel, pe], -1))
            flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)

            def wgrid(fl):
                hor = torch.linspace(-1, 1, WW).view(1, 1, 1, WW).expand(
                    bs, 1, HH, WW)
                ver = torch.linspace(-1, 1, HH).view(1, 1, HH, 1).expand(
                    bs, 1, HH, WW)
                base = torch.cat([hor, ver], 1)
                fn = torch.cat(
                    [fl[:, 0:1] / ((WW - 1) / 2), fl[:, 1:2] / ((HH - 1) / 2)],
                    1)
                return (base + fn).permute(0, 2, 3, 1)

            g1 = wgrid(flow[:, :2]).view(bs, -1, 2).clamp(-1 + 1e-6, 1 - 1e-6)
            g2 = wgrid(flow[:, 2:]).view(bs, -1, 2).clamp(-1 + 1e-6, 1 - 1e-6)
            g1, g2 = g1.flip(-1), g2.flip(-1)
            q_feat1 = gs(hrfeat, g1, "bilinear")
            q_feat3 = gs(feat, g1, "bilinear")
            q_inp1 = gs(inp_cat, g1, "bilinear")
            q_feat2 = gs(hrfeat, g2, "bilinear")
            q_feat4 = gs(feat, g2, "bilinear")
            q_inp2 = gs(inp_cat, g2, "bilinear")
            patches = self.encode_imnet(torch.cat(
                [q_feat1, q_feat3, q_inp1, q_feat2, q_feat4, q_inp2], -1))
            pred = F.fold(patches.permute(0, 2, 1), output_size=(HH, WW),
                          kernel_size=3, padding=1)
            preds.append(pred)
        return preds


# ------------------------------------------------- S / noflow ablations


class LunaTokisAbl3(nn.Module):
    """Mirror of ``Sakuya_arch_test3.py`` (``:303-308`` dims, ``:365-458``
    decoding): 192-ch HR feature field, 5-layer SIRENs, stage B all-nearest
    regathers with rel_coord + time code, stage D six-input train order,
    27-ch output assembled by ``F.fold`` (3x3 overlap-add).

    Dims scale with nf like the reference's (which hardcodes nf=64):
    feat 3nf+8 -> 192, flow 192+3nf+9 -> 4, encode 2*192+6nf+12 -> 27."""

    HR = 192

    def __init__(self, nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.encoder = EncoderM(nf, groups, front_RBs, back_RBs)
        self.feat_imnet = Siren(3 * nf + 8, [64, 64, 64, 64, 256], 4, self.HR)
        self.flow_imnet = Siren(self.HR + 3 * nf + 9,
                                [64, 64, 64, 64, 256], 4, 4)
        self.encode_imnet = Siren(2 * self.HR + 6 * nf + 12,
                                  [64, 64, 64, 256, 256], 4, 27)

    def forward(self, x, times):
        feat_t = self.encoder(x)
        feat = torch.cat([feat_t[:, 0], feat_t[:, 1], feat_t[:, 2]], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        inp_cat = x.reshape(bs, -1, H, W)
        preds = []
        for t in times:
            q_feat = gs(feat, coord_hr, "nearest")
            q_inp = gs(inp_cat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            hrfeat = self.feat_imnet(torch.cat([q_feat, q_inp, rel], -1))
            hrfeat = hrfeat.permute(0, 2, 1).view(bs, self.HR, HH, WW)
            q_feat_b = gs(hrfeat, coord_hr, "nearest")
            flow = self.flow_imnet(
                torch.cat([q_feat_b, q_feat, q_inp, rel, pe], -1))
            flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)
            g1 = _warpgrid_flat(flow[:, :2], bs, HH, WW)
            g2 = _warpgrid_flat(flow[:, 2:], bs, HH, WW)
            q_feat1 = gs(hrfeat, g1, "bilinear")
            q_feat3 = gs(feat, g1, "bilinear")
            q_inp1 = gs(inp_cat, g1, "bilinear")
            q_feat2 = gs(hrfeat, g2, "bilinear")
            q_feat4 = gs(feat, g2, "bilinear")
            q_inp2 = gs(inp_cat, g2, "bilinear")
            patches = self.encode_imnet(torch.cat(
                [q_feat1, q_feat3, q_inp1, q_feat2, q_feat4, q_inp2], -1))
            pred = F.fold(patches.permute(0, 2, 1), output_size=(HH, WW),
                          kernel_size=3, padding=1)
            preds.append(pred)
        return preds


def _warpgrid_flat(fl, bs, HH, WW):
    """reference ``warplayer.warpgrid`` grid (normalized by the flow
    tensor's own dims) flattened + clamped + flipped like the decodings do
    (the decoding's flip and ``gs``'s flip cancel)."""
    hor = torch.linspace(-1, 1, WW).view(1, 1, 1, WW).expand(bs, 1, HH, WW)
    ver = torch.linspace(-1, 1, HH).view(1, 1, HH, 1).expand(bs, 1, HH, WW)
    base = torch.cat([hor, ver], 1)
    fn = torch.cat(
        [fl[:, 0:1] / ((WW - 1) / 2), fl[:, 1:2] / ((HH - 1) / 2)], 1)
    g = (base + fn).permute(0, 2, 3, 1).reshape(bs, -1, 2)
    return g.clamp(-1 + 1e-6, 1 - 1e-6).flip(-1)


class LunaTokisAblCont(nn.Module):
    """Mirror of ``Sakuya_arch_test_continuous.py`` (``:303-308`` dims,
    ``:361-450`` decoding): flagship-width SIRENs, no time code in stages
    A/D, stage B *bilinear* resamples of (HRfeat, feat, inp) + time code
    (65+192+6 at nf=64), direct 3-ch RGB output (no fold)."""

    def __init__(self, nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.encoder = EncoderM(nf, groups, front_RBs, back_RBs)
        self.feat_imnet = Siren(3 * nf + 8, [64, 64, 256], 2, 64)
        self.flow_imnet = Siren(64 + 3 * nf + 7, [64, 64, 256], 2, 4)
        self.encode_imnet = Siren(128 + 6 * nf + 12, [64, 64, 256, 256], 3, 3)

    def forward(self, x, times):
        feat_t = self.encoder(x)
        feat = torch.cat([feat_t[:, 0], feat_t[:, 1], feat_t[:, 2]], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        inp_cat = x.reshape(bs, -1, H, W)
        preds = []
        for t in times:
            q_feat = gs(feat, coord_hr, "nearest")
            q_inp = gs(inp_cat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            hrfeat = self.feat_imnet(torch.cat([q_feat, q_inp, rel], -1))
            hrfeat = hrfeat.permute(0, 2, 1).view(bs, 64, HH, WW)
            # stage B: BILINEAR resamples (the continuous file's distinction)
            q_feat_b = gs(hrfeat, coord_hr, "bilinear")
            q_feat0 = gs(feat, coord_hr, "bilinear")
            q_inp_b = gs(inp_cat, coord_hr, "bilinear")
            flow = self.flow_imnet(
                torch.cat([q_feat_b, q_feat0, q_inp_b, pe], -1))
            flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)
            g1 = _warpgrid_flat(flow[:, :2], bs, HH, WW)
            g2 = _warpgrid_flat(flow[:, 2:], bs, HH, WW)
            q_feat1 = gs(hrfeat, g1, "bilinear")
            q_feat3 = gs(feat, g1, "bilinear")
            q_inp1 = gs(inp_cat, g1, "bilinear")
            q_feat2 = gs(hrfeat, g2, "bilinear")
            q_feat4 = gs(feat, g2, "bilinear")
            q_inp2 = gs(inp_cat, g2, "bilinear")
            rgb = self.encode_imnet(torch.cat(
                [q_feat1, q_feat3, q_inp1, q_feat2, q_feat4, q_inp2], -1))
            preds.append(rgb.permute(0, 2, 1).view(bs, 3, HH, WW))
        return preds


class LunaTokisAbl4(nn.Module):
    """Mirror of ``Sakuya_arch_test4.py`` (== ``_nomul.py``; ``:301-309``
    dims, ``:361-418`` decoding): minimal decoder — stage A [feat, rel, pe]
    -> 64-ch HR field (195->64 at nf=64), flow from the nearest-regathered
    HR field + time code alone (65->4), RGB from the two warped HR fields
    (128->3)."""

    def __init__(self, nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.encoder = EncoderM(nf, groups, front_RBs, back_RBs)
        self.feat_imnet = Siren(3 * nf + 3, [64, 64, 256], 2, 64)
        self.flow_imnet = Siren(64 + 1, [64, 64, 256], 2, 4)
        self.encode_imnet = Siren(128, [64, 64, 256, 256], 3, 3)

    def forward(self, x, times):
        feat_t = self.encoder(x)
        feat = torch.cat([feat_t[:, 0], feat_t[:, 1], feat_t[:, 2]], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        preds = []
        for t in times:
            q_feat = gs(feat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            hrfeat = self.feat_imnet(torch.cat([q_feat, rel, pe], -1))
            hrfeat = hrfeat.permute(0, 2, 1).view(bs, 64, HH, WW)
            q_feat_b = gs(hrfeat, coord_hr, "nearest")
            flow = self.flow_imnet(torch.cat([q_feat_b, pe], -1))
            flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)
            g1 = _warpgrid_flat(flow[:, :2], bs, HH, WW)
            g2 = _warpgrid_flat(flow[:, 2:], bs, HH, WW)
            q_feat1 = gs(hrfeat, g1, "bilinear")
            q_feat2 = gs(hrfeat, g2, "bilinear")
            rgb = self.encode_imnet(torch.cat([q_feat1, q_feat2], -1))
            preds.append(rgb.permute(0, 2, 1).view(bs, 3, HH, WW))
        return preds


class LunaTokisAblSingle(nn.Module):
    """Mirror of ``Sakuya_arch_test_single.py`` (``:301-313`` dims,
    ``:365-466`` decoding): 192-ch HR field from [feat, inp, rel] (200->192,
    NO time code in stage A), all-nearest stage B with rel + time code
    (393->4), six-input train-order stage D to a 32-ch field (780->32)
    refined by the 2-conv RGB head (32->16->3, no activation between)."""

    HR = 192

    def __init__(self, nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.encoder = EncoderM(nf, groups, front_RBs, back_RBs)
        self.feat_imnet = Siren(3 * nf + 8, [64, 64, 64, 256], 3, self.HR)
        self.flow_imnet = Siren(self.HR + 3 * nf + 9,
                                [64, 64, 64, 256], 3, 4)
        self.encode_imnet = Siren(2 * self.HR + 6 * nf + 12,
                                  [64, 64, 64, 256, 256], 4, 32)
        self.final_conv0 = nn.Conv2d(32, 16, 3, 1, 1)
        self.final_conv1 = nn.Conv2d(16, 3, 3, 1, 1)

    def forward(self, x, times):
        feat_t = self.encoder(x)
        feat = torch.cat([feat_t[:, 0], feat_t[:, 1], feat_t[:, 2]], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        inp_cat = x.reshape(bs, -1, H, W)
        preds = []
        for t in times:
            q_feat = gs(feat, coord_hr, "nearest")
            q_inp = gs(inp_cat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            hrfeat = self.feat_imnet(torch.cat([q_feat, q_inp, rel], -1))
            hrfeat = hrfeat.permute(0, 2, 1).view(bs, self.HR, HH, WW)
            q_feat_b = gs(hrfeat, coord_hr, "nearest")
            flow = self.flow_imnet(
                torch.cat([q_feat_b, q_feat, q_inp, rel, pe], -1))
            flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)
            g1 = _warpgrid_flat(flow[:, :2], bs, HH, WW)
            g2 = _warpgrid_flat(flow[:, 2:], bs, HH, WW)
            q_feat1 = gs(hrfeat, g1, "bilinear")
            q_feat3 = gs(feat, g1, "bilinear")
            q_inp1 = gs(inp_cat, g1, "bilinear")
            q_feat2 = gs(hrfeat, g2, "bilinear")
            q_feat4 = gs(feat, g2, "bilinear")
            q_inp2 = gs(inp_cat, g2, "bilinear")
            field = self.encode_imnet(torch.cat(
                [q_feat1, q_feat3, q_inp1, q_feat2, q_feat4, q_inp2], -1))
            field = field.permute(0, 2, 1).view(bs, 32, HH, WW)
            preds.append(self.final_conv1(self.final_conv0(field)))
        return preds


class LunaTokisS(nn.Module):
    """Mirror of ``Sakuya_arch_test_S.py``: no feat_imnet — flow straight
    from the encoder feature (201->4, ``:305-306``), RGB from the two warped
    feature/HR-image samples with no time code (396->3, ``:307-308``)."""

    def __init__(self, nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.encoder = EncoderM(nf, groups, front_RBs, back_RBs)
        self.flow_imnet = Siren(3 * nf + 9, [64, 64, 256], 2, 4)
        self.encode_imnet = Siren(6 * nf + 12, [64, 64, 256, 256], 3, 3)

    def forward(self, x, times):
        feat_t = self.encoder(x)
        feat = torch.cat([feat_t[:, 0], feat_t[:, 1], feat_t[:, 2]], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        inp_cat = x.reshape(bs, -1, H, W)
        hr_inp = F.interpolate(inp_cat, scale_factor=4, mode="bilinear",
                               align_corners=False)
        preds = []
        for t in times:
            q_feat = gs(feat, coord_hr, "nearest")
            q_inp = gs(inp_cat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            flow = self.flow_imnet(torch.cat([q_feat, q_inp, rel, pe], -1))
            flow = flow.permute(0, 2, 1).view(bs, 4, HH, WW)

            def wgrid(fl):
                hor = torch.linspace(-1, 1, WW).view(1, 1, 1, WW).expand(
                    bs, 1, HH, WW)
                ver = torch.linspace(-1, 1, HH).view(1, 1, HH, 1).expand(
                    bs, 1, HH, WW)
                base = torch.cat([hor, ver], 1)
                fn = torch.cat(
                    [fl[:, 0:1] / ((WW - 1) / 2), fl[:, 1:2] / ((HH - 1) / 2)],
                    1)
                return (base + fn).permute(0, 2, 3, 1)

            g1 = wgrid(flow[:, :2]).view(bs, -1, 2).clamp(-1 + 1e-6, 1 - 1e-6)
            g2 = wgrid(flow[:, 2:]).view(bs, -1, 2).clamp(-1 + 1e-6, 1 - 1e-6)
            g1, g2 = g1.flip(-1), g2.flip(-1)
            q_img1 = gs(hr_inp, g1, "bilinear")
            q_feat3 = gs(feat, g1, "bilinear")
            q_img2 = gs(hr_inp, g2, "bilinear")
            q_feat4 = gs(feat, g2, "bilinear")
            rgb = self.encode_imnet(
                torch.cat([q_feat3, q_feat4, q_img1, q_img2], -1))
            preds.append(rgb.permute(0, 2, 1).view(bs, 3, HH, WW))
        return preds


class LunaTokisNoFlow(nn.Module):
    """Mirror of ``Sakuya_arch_test_noflow.py``: pure LIIF — one SIREN
    (``feat_imnet``, 201->3, hidden [64, 64, 256, 256, 256], ``:303-304``)
    over nearest gathers + rel coord + time code."""

    def __init__(self, nf=64, nframes=6, groups=8, front_RBs=5, back_RBs=40):
        super().__init__()
        self.nf = nf
        self.encoder = EncoderM(nf, groups, front_RBs, back_RBs)
        self.feat_imnet = Siren(3 * nf + 9, [64, 64, 256, 256, 256], 4, 3)

    def forward(self, x, times):
        feat_t = self.encoder(x)
        feat = torch.cat([feat_t[:, 0], feat_t[:, 1], feat_t[:, 2]], 1)
        bs, Cf, H, W = feat.shape
        HH, WW = H * 4, W * 4
        coord_hr = make_coord((HH, WW)).repeat(bs, 1, 1).clamp(-1 + 1e-6,
                                                               1 - 1e-6)
        feat_coord = (
            make_coord((H, W), flatten=False).permute(2, 0, 1)
            .unsqueeze(0).expand(bs, 2, H, W)
        )

        def gs(img, coord, mode):
            return F.grid_sample(
                img, coord.flip(-1).unsqueeze(1), mode=mode,
                align_corners=False,
            )[:, :, 0, :].permute(0, 2, 1)

        inp_cat = x.reshape(bs, -1, H, W)
        preds = []
        for t in times:
            q_feat = gs(feat, coord_hr, "nearest")
            q_inp = gs(inp_cat, coord_hr, "nearest")
            q_coord = gs(feat_coord, coord_hr, "nearest")
            rel = (coord_hr - q_coord) * torch.tensor([H, W]).float()
            pe = torch.ones_like(coord_hr[:, :, :1]) * t
            rgb = self.feat_imnet(torch.cat([q_feat, q_inp, rel, pe], -1))
            preds.append(rgb.permute(0, 2, 1).view(bs, 3, HH, WW))
        return preds


# ---------------------------------------------------------------- TMNet
# Mirror of the reference TMNet semantics (``codes/models/modules/STVSR.py``):
# PCD alignment with TMB time modulation on the last offset conv of each
# level (:89-95, 107-151), a per-query-time PCD loop building the LSTM
# sequence (:394-417), 3-frame non-linear comparison refinement (:424-444),
# trunk + pre-refinement residual, fixed x4 pixel-shuffle head (:446-459).


class TMB(nn.Module):
    def __init__(self, nf=64):
        super().__init__()
        self.t_process = nn.Sequential(
            nn.Conv2d(1, nf, 1, 1, 0, bias=False), nn.LeakyReLU(0.1),
            nn.Conv2d(nf, nf, 1, 1, 0, bias=False), nn.LeakyReLU(0.1),
            nn.Conv2d(nf, nf, 1, 1, 0, bias=False), nn.LeakyReLU(0.1),
        )
        self.f_process = nn.Sequential(
            nn.Conv2d(nf, nf, 3, 1, 1), nn.LeakyReLU(0.1),
            nn.Conv2d(nf, nf, 3, 1, 1), nn.LeakyReLU(0.1),
        )

    def forward(self, x, t):
        return self.f_process(x) * self.t_process(t)


class PCDAlignTM(PCDAlign):
    def __init__(self, nf=64, groups=8):
        super().__init__(nf, groups)
        for side in ("A", "B"):
            for lvl in (1, 2, 3):
                setattr(self, f"TMB_{side}_l{lvl}", TMB(nf))

    def forward(self, fea1, fea2, t=None, t_back=None):
        ys = []
        for s, a, b, tt in (("1", fea1, fea2, t), ("2", fea2, fea1, t_back)):
            side = "A" if s == "1" else "B"
            g = lambda n: getattr(self, f"{n}_{s}")
            tmb = lambda lvl: getattr(self, f"TMB_{side}_l{lvl}")
            off = torch.cat([a[2], b[2]], dim=1)
            pre = lrelu(g("L3_offset_conv1")(off))
            off = lrelu(g("L3_offset_conv2")(pre))
            if tt is not None:
                off = off + tmb(3)(pre, tt)
            l3_fea = lrelu(g("L3_dcnpack")(a[2], off))
            l3_off = off
            off = torch.cat([a[1], b[1]], dim=1)
            off = lrelu(g("L2_offset_conv1")(off))
            pre = lrelu(g("L2_offset_conv2")(
                torch.cat([off, _up2(l3_off) * 2], 1)))
            off = lrelu(g("L2_offset_conv3")(pre))
            if tt is not None:
                off = off + tmb(2)(pre, tt)
            l2_fea = g("L2_dcnpack")(a[1], off)
            l2_fea = lrelu(g("L2_fea_conv")(torch.cat([l2_fea, _up2(l3_fea)], 1)))
            l2_off = off
            off = torch.cat([a[0], b[0]], dim=1)
            off = lrelu(g("L1_offset_conv1")(off))
            pre = lrelu(g("L1_offset_conv2")(
                torch.cat([off, _up2(l2_off) * 2], 1)))
            off = lrelu(g("L1_offset_conv3")(pre))
            if tt is not None:
                off = off + tmb(1)(pre, tt)
            l1_fea = g("L1_dcnpack")(a[0], off)
            l1_fea = g("L1_fea_conv")(torch.cat([l1_fea, _up2(l2_fea)], 1))
            ys.append(l1_fea)
        return torch.cat(ys, dim=1)


class TMNet(nn.Module):
    def __init__(self, nf=64, nframes=3, groups=8, front_RBs=5, back_RBs=10):
        super().__init__()
        self.nf = nf
        self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
        self.feature_extraction = nn.Sequential(
            *[ResBlock(nf) for _ in range(front_RBs)])
        self.fea_L2_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L2_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.fea_L3_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L3_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.pcd_align = PCDAlignTM(nf, groups)
        self.fusion = nn.Conv2d(2 * nf, nf, 1, 1)
        self.ConvBLSTM = BiDeformableConvLSTM(nf, groups)
        self.recon_trunk = nn.Sequential(
            *[ResBlock(nf) for _ in range(back_RBs)])
        self.upconv1 = nn.Conv2d(nf, nf * 4, 3, 1, 1)
        self.upconv2 = nn.Conv2d(nf, 64 * 4, 3, 1, 1)
        self.HRconv = nn.Conv2d(64, 64, 3, 1, 1)
        self.conv_last = nn.Conv2d(64, 3, 3, 1, 1)
        self.layersAtBOffset = nn.Sequential(
            nn.Conv2d(2 * nf, nf, 3, 1, 1), nn.LeakyReLU(0.1),
            nn.Conv2d(nf, nf, 3, 1, 1))
        self.layersAtB = DCNSep(nf, groups)
        self.layersCtBOffset = nn.Sequential(
            nn.Conv2d(2 * nf, nf, 3, 1, 1), nn.LeakyReLU(0.1),
            nn.Conv2d(nf, nf, 3, 1, 1))
        self.layersCtB = DCNSep(nf, groups)
        self.layersFusion = nn.Sequential(
            nn.Conv2d(3 * nf, 3 * nf, 1, 1, 0), nn.LeakyReLU(0.1),
            nn.Conv2d(3 * nf, 3 * nf, 1, 1, 0), nn.LeakyReLU(0.1),
            nn.Conv2d(3 * nf, 3 * nf, 1, 1, 0), nn.LeakyReLU(0.1),
            nn.Conv2d(3 * nf, nf, 1, 1, 0))

    def forward(self, x, t=None):
        use_time = t is not None
        if use_time:
            t_B, t_N = t.shape
            t_back = 1 - t
            tn = ((t / 0.5) - 1).view(t_B, t_N, 1, 1, 1)
            tbn = ((t_back / 0.5) - 1).view(t_B, t_N, 1, 1, 1)
        B, N, C, H, W = x.shape
        l1 = lrelu(self.conv_first(x.view(-1, C, H, W)))
        l1 = self.feature_extraction(l1)
        l2 = lrelu(self.fea_L2_conv2(lrelu(self.fea_L2_conv1(l1))))
        l3 = lrelu(self.fea_L3_conv2(lrelu(self.fea_L3_conv1(l2))))
        l1 = l1.view(B, N, -1, H, W)
        l2 = l2.view(B, N, -1, H // 2, W // 2)
        l3 = l3.view(B, N, -1, H // 4, W // 4)
        seq = []
        for idx in range(N - 1):
            fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
            fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
            if idx == 0:
                seq.append(fea1[0])
            if use_time:
                for i in range(t_N):
                    aligned = self.pcd_align(fea1, fea2, tn[:, i], tbn[:, i])
                    seq.append(self.fusion(aligned))
            else:
                seq.append(self.fusion(self.pcd_align(fea1, fea2)))
            seq.append(fea2[0])
        dnc_feats = torch.stack(seq, dim=1)
        back_feats = dnc_feats
        T = dnc_feats.shape[1]
        refined = []
        for i in range(T):
            i0 = 0 if i == 0 else i - 1
            i2 = T - 1 if i == T - 1 else i + 1
            fea0, fea1_, fea2 = dnc_feats[:, i0], dnc_feats[:, i], dnc_feats[:, i2]
            off_a = self.layersAtBOffset(torch.cat([fea0, fea1_], 1))
            fea0_al = lrelu(self.layersAtB(fea0, off_a))
            off_c = self.layersCtBOffset(torch.cat([fea2, fea1_], 1))
            fea2_al = lrelu(self.layersCtB(fea2, off_c))
            refined.append(self.layersFusion(
                torch.cat([fea0_al, fea1_, fea2_al], 1)))
        lstm_feats = dnc_feats + torch.stack(refined, dim=1)
        feats = self.ConvBLSTM(lstm_feats)
        B2, T2, C2, H2, W2 = feats.shape
        out = self.recon_trunk(feats.view(-1, C2, H2, W2))
        out = out + back_feats.view(-1, C2, H2, W2)
        out = lrelu(F.pixel_shuffle(self.upconv1(out), 2))
        out = lrelu(F.pixel_shuffle(self.upconv2(out), 2))
        out = self.conv_last(lrelu(self.HRconv(out)))
        return out.view(B2, T2, 3, 4 * H2, 4 * W2)


def load_flax_params(model: nn.Module, flax_params):
    """Load a flax param tree (via the converter) into this torch mirror."""
    from stif_tpu.convert import flax_params_to_torch_state

    state = flax_params_to_torch_state(flax_params)
    # mirror uses .final instead of net.{last} for the output linear; the
    # last index differs per model variant — discover it from the keys
    import re as _re

    n_last = {}
    for k in state:
        m = _re.match(r"^(\w*imnet)\.net\.(\d+)\.", k)
        if m:
            n_last[m.group(1)] = max(n_last.get(m.group(1), 0),
                                     int(m.group(2)))
    mapped = {}
    for k, v in state.items():
        for net, last in n_last.items():
            pref = f"{net}.net.{last}."
            if k.startswith(pref):
                k = f"{net}.final." + k[len(pref):]
        mapped[k] = torch.from_numpy(np.ascontiguousarray(v))
    missing, unexpected = model.load_state_dict(mapped, strict=True)
    return model
