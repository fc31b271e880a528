"""Unit tests for the numerics substrate vs PyTorch golden values.

Mirrors the reference's conventions (SURVEY.md §7 step 1): row-major (y, x)
coords, flip-before-sample, clamp(+-(1-1e-6)) — the places where silent parity
loss happens.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from stif_tpu.ops import (
    backward_warp,
    fold3x3,
    grid_sample,
    imresize,
    make_coord,
    pixel_shuffle,
    resize_bilinear,
    warp_grid,
)


def torch_make_coord(shape, ranges=None, flatten=True):
    coord_seqs = []
    for i, n in enumerate(shape):
        if ranges is None:
            v0, v1 = -1, 1
        else:
            v0, v1 = ranges[i]
        r = (v1 - v0) / (2 * n)
        seq = v0 + r + (2 * r) * torch.arange(n).float()
        coord_seqs.append(seq)
    ret = torch.stack(torch.meshgrid(*coord_seqs, indexing="ij"), dim=-1)
    if flatten:
        ret = ret.view(-1, ret.shape[-1])
    return ret


class TestMakeCoord:
    def test_matches_torch(self):
        for shape in [(4, 6), (7, 3), (1, 1), (32, 32)]:
            got = np.asarray(make_coord(shape))
            want = torch_make_coord(shape).numpy()
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_ranges_and_noflatten(self):
        got = np.asarray(make_coord((3, 5), ranges=[(0, 1), (-2, 2)], flatten=False))
        want = torch_make_coord((3, 5), ranges=[(0, 1), (-2, 2)], flatten=False).numpy()
        assert got.shape == (3, 5, 2)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    @pytest.mark.parametrize("padding", ["zeros", "border"])
    @pytest.mark.parametrize("align", [False, True])
    @pytest.mark.parametrize("impl", ["corners", "patch"])
    def test_matches_torch(self, rng, mode, padding, align, impl):
        B, C, H, W = 2, 5, 9, 13
        Hg, Wg = 7, 11
        x = rng.standard_normal((B, C, H, W)).astype(np.float32)
        # include out-of-range coords to exercise padding behavior
        grid = (rng.uniform(-1.4, 1.4, (B, Hg, Wg, 2))).astype(np.float32)

        want = TF.grid_sample(
            torch.from_numpy(x), torch.from_numpy(grid), mode=mode,
            padding_mode=padding, align_corners=align,
        ).numpy()

        got = grid_sample(
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(grid),
            mode=mode, padding_mode=padding, align_corners=align, impl=impl,
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_flat_grid(self, rng):
        B, C, H, W = 1, 3, 8, 8
        x = rng.standard_normal((B, C, H, W)).astype(np.float32)
        q = rng.uniform(-1, 1, (B, 17, 2)).astype(np.float32)
        want = TF.grid_sample(
            torch.from_numpy(x), torch.from_numpy(q).unsqueeze(1),
            mode="bilinear", align_corners=False,
        )[:, :, 0, :].numpy()
        got = np.asarray(
            grid_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(q))
        ).transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_decoder_convention_nearest_lookup(self, rng):
        """The decoder samples features at make_coord queries with
        coord.flip(-1) and clamp — nearest lookup must return exact cells."""
        B, C, H, W = 1, 4, 6, 10
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        coords = make_coord((2 * H, 2 * W))[None]  # (1, Q, 2) in (y, x)
        coords = jnp.clip(coords, -1 + 1e-6, 1 - 1e-6)
        got = grid_sample(jnp.asarray(x), coords[..., ::-1], mode="nearest")
        got = np.asarray(got).reshape(2 * H, 2 * W, C)
        want = np.repeat(np.repeat(x[0], 2, axis=0), 2, axis=1)
        np.testing.assert_allclose(got, want, atol=1e-6)


def torch_imresize_np(img, scale, antialiasing=True):
    """MATLAB bicubic resize oracle via torch (independent re-derivation of the
    same math the reference data pipeline uses)."""
    import math

    def cubic(x):
        absx = torch.abs(x)
        absx2 = absx ** 2
        absx3 = absx ** 3
        return (1.5 * absx3 - 2.5 * absx2 + 1) * ((absx <= 1).type_as(absx)) + (
            -0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2
        ) * (((absx > 1) * (absx <= 2)).type_as(absx))

    def weights_indices(in_length, out_length, scale, kw, antialiasing):
        if (scale < 1) and antialiasing:
            kw = kw / scale
        x = torch.linspace(1, out_length, out_length)
        u = x / scale + 0.5 * (1 - 1 / scale)
        left = torch.floor(u - kw / 2)
        P = math.ceil(kw) + 2
        indices = left.view(out_length, 1).expand(out_length, P) + torch.linspace(
            0, P - 1, P
        ).view(1, P).expand(out_length, P)
        dist = u.view(out_length, 1).expand(out_length, P) - indices
        if (scale < 1) and antialiasing:
            weights = scale * cubic(dist * scale)
        else:
            weights = cubic(dist)
        weights = weights / weights.sum(1).view(out_length, 1)
        wzero = (weights == 0).sum(0)
        if not math.isclose(wzero[0], 0, rel_tol=1e-6):
            indices = indices.narrow(1, 1, P - 2)
            weights = weights.narrow(1, 1, P - 2)
        if not math.isclose(wzero[-1], 0, rel_tol=1e-6):
            indices = indices.narrow(1, 0, P - 2)
            weights = weights.narrow(1, 0, P - 2)
        sym_len_s = -indices.min() + 1
        sym_len_e = indices.max() - in_length
        indices = indices + sym_len_s - 1
        return weights.contiguous(), indices.contiguous().long(), int(sym_len_s), int(
            sym_len_e
        )

    img = torch.from_numpy(img)
    in_H, in_W, in_C = img.shape
    out_H, out_W = math.ceil(in_H * scale), math.ceil(in_W * scale)
    wH, iH, sHs, sHe = weights_indices(in_H, out_H, scale, 4, antialiasing)
    wW, iW, sWs, sWe = weights_indices(in_W, out_W, scale, 4, antialiasing)

    aug = torch.cat(
        [img[:sHs].flip(0), img, img[in_H - sHe :].flip(0)], dim=0
    )
    out1 = torch.zeros(out_H, in_W, in_C)
    kw = wH.shape[1]
    for i in range(out_H):
        idx = int(iH[i][0])
        for c in range(in_C):
            out1[i, :, c] = aug[idx : idx + kw, :, c].T.mv(wH[i])
    aug2 = torch.cat(
        [out1[:, :sWs].flip(1), out1, out1[:, in_W - sWe :].flip(1)], dim=1
    )
    out2 = torch.zeros(out_H, out_W, in_C)
    kw = wW.shape[1]
    for i in range(out_W):
        idx = int(iW[i][0])
        for c in range(in_C):
            out2[:, i, c] = aug2[:, idx : idx + kw, c].mv(wW[i])
    return out2.numpy()


class TestImresize:
    @pytest.mark.parametrize("scale", [0.5, 0.25, 2.0, 1 / 3, 0.37])
    def test_matches_matlab_convention(self, rng, scale):
        img = rng.random((24, 20, 3)).astype(np.float32)
        want = torch_imresize_np(img, scale)
        got = np.asarray(imresize(img, scale))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_batched(self, rng):
        img = rng.random((2, 16, 12, 3)).astype(np.float32)
        got = np.asarray(imresize(img, 0.5))
        for b in range(2):
            np.testing.assert_allclose(
                got[b], torch_imresize_np(img[b], 0.5), atol=3e-5
            )


class TestResizeBilinear:
    @pytest.mark.parametrize("sf", [2, 4])
    @pytest.mark.parametrize("align", [False, True])
    def test_matches_torch_interpolate(self, rng, sf, align):
        x = rng.standard_normal((2, 5, 7, 6)).astype(np.float32)  # NCHW
        want = TF.interpolate(
            torch.from_numpy(x), scale_factor=sf, mode="bilinear",
            align_corners=align,
        ).numpy()
        got = np.asarray(
            resize_bilinear(
                jnp.asarray(x.transpose(0, 2, 3, 1)), scale_factor=sf,
                align_corners=align,
            )
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_downscale_size(self, rng):
        x = rng.standard_normal((1, 3, 12, 16)).astype(np.float32)
        want = TF.interpolate(
            torch.from_numpy(x), size=(5, 9), mode="bilinear", align_corners=False
        ).numpy()
        got = np.asarray(
            resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), size=(5, 9))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestWarp:
    def test_warp_grid_matches_reference_math(self, rng):
        """warpgrid: base lattice + flow normalized by the flow's own dims."""
        B, H, W = 2, 6, 8
        flow = rng.standard_normal((B, H, W, 2)).astype(np.float32)
        g = np.asarray(warp_grid(jnp.asarray(flow)))

        fx = torch.from_numpy(flow[..., 0])
        fy = torch.from_numpy(flow[..., 1])
        hor = torch.linspace(-1, 1, W).view(1, 1, W).expand(B, H, W)
        ver = torch.linspace(-1, 1, H).view(1, H, 1).expand(B, H, W)
        want_x = hor + fx / ((W - 1.0) / 2.0)
        want_y = ver + fy / ((H - 1.0) / 2.0)
        np.testing.assert_allclose(g[..., 0], want_x.numpy(), atol=1e-6)
        np.testing.assert_allclose(g[..., 1], want_y.numpy(), atol=1e-6)

    def test_backward_warp_matches_torch(self, rng):
        B, C, H, W = 1, 3, 8, 10
        x = rng.standard_normal((B, C, H, W)).astype(np.float32)
        flow = (rng.standard_normal((B, 2, H, W)) * 2).astype(np.float32)

        tx = torch.from_numpy(x)
        tf_ = torch.from_numpy(flow)
        hor = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
        ver = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
        grid = torch.cat([hor, ver], 1)
        fn = torch.cat(
            [tf_[:, 0:1] / ((W - 1.0) / 2.0), tf_[:, 1:2] / ((H - 1.0) / 2.0)], 1
        )
        g = (grid + fn).permute(0, 2, 3, 1)
        want = TF.grid_sample(
            tx, g, mode="bilinear", padding_mode="border", align_corners=True
        ).numpy()

        got = np.asarray(
            backward_warp(
                jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(flow.transpose(0, 2, 3, 1)),
            )
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestPixelShuffleFold:
    def test_pixel_shuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 16, 5, 7)).astype(np.float32)
        want = TF.pixel_shuffle(torch.from_numpy(x), 2).numpy()
        got = np.asarray(
            pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_fold3x3_matches_torch(self, rng):
        B, C, H, W = 2, 3, 6, 5
        patches = rng.standard_normal((B, C * 9, H * W)).astype(np.float32)
        want = TF.fold(
            torch.from_numpy(patches), output_size=(H, W), kernel_size=3, padding=1
        ).numpy()
        # our layout: (B, H, W, C*9)
        x = patches.transpose(0, 2, 1).reshape(B, H, W, C * 9)
        got = np.asarray(fold3x3(jnp.asarray(x))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestDegenerateGather:
    """H==1 / W==1 sources: the 2x2 patch gather pads instead of emitting an
    invalid slice (gather_utils.patch_weights clamp guard)."""

    @pytest.mark.parametrize("shape", [(1, 1, 7, 2), (1, 5, 1, 3), (1, 1, 1, 2)])
    def test_bilinear_gather_tiny_sources(self, rng, shape):
        from stif_tpu.ops.gather_utils import bilinear_gather

        x = rng.random(shape).astype(np.float32)
        B, H, W, C = shape
        iy = jnp.asarray(rng.uniform(-1, H, (B, 6)).astype(np.float32))
        ix = jnp.asarray(rng.uniform(-1, W, (B, 6)).astype(np.float32))
        got = np.asarray(bilinear_gather(jnp.asarray(x), iy, ix))

        # oracle: zero-padded bilinear, direct numpy
        def sample(b, y, x_):
            y0, x0 = int(np.floor(y)), int(np.floor(x_))
            ly, lx = y - y0, x_ - x0
            out = np.zeros(C, np.float32)
            for dy, wy in ((0, 1 - ly), (1, ly)):
                for dx, wx in ((0, 1 - lx), (1, lx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        out += wy * wx * x[b, yy, xx]
            return out

        want = np.stack([
            np.stack([sample(b, float(iy[b, q]), float(ix[b, q]))
                      for q in range(6)]) for b in range(B)
        ])
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestFusedPCDDirections:
    def test_fused_matches_unfused(self, rng):
        """Direction-fused grouped convs are numerically identical to the
        two sequential directions and share the exact parameter tree."""
        import jax
        import jax.numpy as jnp

        from stif_tpu.nn.pcd import PCDAlign

        f1 = [jnp.asarray(rng.random((2, 16, 20, 16)), jnp.float32),
              jnp.asarray(rng.random((2, 8, 10, 16)), jnp.float32),
              jnp.asarray(rng.random((2, 4, 5, 16)), jnp.float32)]
        f2 = [jnp.asarray(rng.random(x.shape), jnp.float32) for x in f1]
        fused = PCDAlign(nf=16, groups=4, fuse_dirs=True)
        plain = PCDAlign(nf=16, groups=4, fuse_dirs=False)
        pf = fused.init(jax.random.PRNGKey(0), f1, f2)
        pu = plain.init(jax.random.PRNGKey(0), f1, f2)
        tf = jax.tree_util.tree_leaves_with_path(pf)
        tu = jax.tree_util.tree_leaves_with_path(pu)
        assert [k for k, _ in tf] == [k for k, _ in tu]
        for (k, a), (_, b) in zip(tf, tu):
            np.testing.assert_array_equal(a, b, err_msg=str(k))
        np.testing.assert_allclose(
            fused.apply(pu, f1, f2), plain.apply(pu, f1, f2), atol=1e-6)
