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

    def forward(self, x, times, scale=None, test=False):
        self.gen_feat(x)
        return self.decoding(times, scale, test)


def load_flax_params(model: nn.Module, flax_params):
    """Load a flax param tree (via the converter) into this torch mirror."""
    from stif_tpu.convert import flax_params_to_torch_state

    state = flax_params_to_torch_state(flax_params)
    mapped = {}
    for k, v in state.items():
        # mirror uses .final instead of net.{last} for the output linear
        for net in ("feat_imnet", "flow_imnet", "encode_imnet"):
            n_last = {"feat_imnet": 3, "flow_imnet": 3, "encode_imnet": 4}[net]
            pref = f"{net}.net.{n_last}."
            if k.startswith(pref):
                k = f"{net}.final." + k[len(pref):]
        mapped[k] = torch.from_numpy(np.ascontiguousarray(v))
    missing, unexpected = model.load_state_dict(mapped, strict=True)
    return model
