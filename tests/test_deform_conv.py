"""Modulated deformable conv (DCNv2) tests.

Ports the reference's kernel-test ideas (``codes/models/modules/DCNv2/test.py``:
zero-offset identity, gradcheck) and adds golden-output comparison against an
independent naive PyTorch implementation of the CUDA sampling semantics
(``dcn_v2_im2col_cuda.cu:25-195``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stif_tpu.ops.deform_conv import deform_conv2d, split_offset_mask


def torch_dcn_naive(x, offset, mask, weight, bias, stride, padding, dilation, G):
    """Naive torch oracle. x: (B,Cin,H,W); offset: (B,G,K,2,Ho,Wo) (dy,dx);
    mask: (B,G,K,Ho,Wo); weight: (Cout,Cin,kh,kw)."""
    B, Cin, H, W = x.shape
    Cout, _, kh, kw = weight.shape
    K = kh * kw
    CpG = Cin // G
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    def bilinear(img, h, w):
        # img: (H, W); h, w differentiable 0-d tensors. Zero outside, with
        # per-corner bounds like the CUDA kernel.
        if not (h.item() > -1 and w.item() > -1 and h.item() < H and w.item() < W):
            return img.new_zeros(())
        h0, w0 = int(np.floor(h.item())), int(np.floor(w.item()))
        h1, w1 = h0 + 1, w0 + 1
        lh, lw = h - h0, w - w0
        hh, hw = 1 - lh, 1 - lw
        v = img.new_zeros(())
        if h0 >= 0 and w0 >= 0:
            v = v + hh * hw * img[h0, w0]
        if h0 >= 0 and w1 <= W - 1:
            v = v + hh * lw * img[h0, w1]
        if h1 <= H - 1 and w0 >= 0:
            v = v + lh * hw * img[h1, w0]
        if h1 <= H - 1 and w1 <= W - 1:
            v = v + lh * lw * img[h1, w1]
        return v

    cols = []
    for b in range(B):
        for c in range(Cin):
            g = c // CpG
            for yo in range(Ho):
                for xo in range(Wo):
                    for i in range(kh):
                        for j in range(kw):
                            m = i * kw + j
                            dy = offset[b, g, m, 0, yo, xo]
                            dx = offset[b, g, m, 1, yo, xo]
                            h = yo * stride - padding + i * dilation + dy
                            w = xo * stride - padding + j * dilation + dx
                            cols.append(
                                bilinear(x[b, c], h, w) * mask[b, g, m, yo, xo]
                            )
    col = torch.stack(cols).view(B, Cin, Ho, Wo, K).permute(0, 1, 4, 2, 3)
    out = torch.einsum("bckyx,ock->boyx", col, weight.reshape(Cout, Cin, K))
    out = out + bias.view(1, Cout, 1, 1)
    return out


@pytest.mark.parametrize("impl", ["corners", "patch"])
@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 1, 1)])
def test_matches_naive_oracle(rng, stride, padding, dilation, impl):
    B, Cin, H, W, Cout, G, k = 2, 4, 6, 7, 5, 2, 3
    K = k * k
    Ho = (H + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
    offset = (rng.standard_normal((B, G, K, 2, Ho, Wo)) * 2).astype(np.float32)
    mask = rng.random((B, G, K, Ho, Wo)).astype(np.float32)
    weight = rng.standard_normal((Cout, Cin, k, k)).astype(np.float32) * 0.2
    bias = rng.standard_normal(Cout).astype(np.float32)

    want = torch_dcn_naive(
        torch.from_numpy(x), torch.from_numpy(offset), torch.from_numpy(mask),
        torch.from_numpy(weight), torch.from_numpy(bias), stride, padding,
        dilation, G,
    ).numpy()

    got = deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offset.transpose(0, 4, 5, 1, 2, 3)),  # B,Ho,Wo,G,K,2
        jnp.asarray(mask.transpose(0, 3, 4, 1, 2)),       # B,Ho,Wo,G,K
        jnp.asarray(weight.transpose(2, 3, 1, 0)),        # kh,kw,Cin,Cout
        jnp.asarray(bias),
        stride=stride, padding=padding, dilation=dilation, impl=impl,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_zero_offset_identity(rng):
    """Reference DCNv2/test.py check_zero_offset: zero offsets, zero mask
    logits (sigmoid -> 0.5), identity center-tap kernel => 2*out == input."""
    B, C, H, W, G = 1, 4, 5, 6, 2
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    conv_out = np.zeros((B, H, W, 3 * G * 9), np.float32)
    offset, mask = split_offset_mask(jnp.asarray(conv_out), G, 3)
    np.testing.assert_allclose(np.asarray(mask), 0.5)

    weight = np.zeros((3, 3, C, C), np.float32)
    for c in range(C):
        weight[1, 1, c, c] = 1.0
    out = deform_conv2d(jnp.asarray(x), offset, mask, jnp.asarray(weight),
                        jnp.zeros(C, np.float32))
    np.testing.assert_allclose(2 * np.asarray(out), x, atol=1e-5)


def test_gradients_match_torch_autograd(rng):
    """Training parity: jax.grad of our op vs torch autograd of the naive
    oracle (the reference's hand-written backward implements the same math)."""
    B, Cin, H, W, Cout, G, k = 1, 2, 4, 4, 2, 1, 3
    K = k * k
    x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
    offset = (rng.standard_normal((B, G, K, 2, H, W)) * 0.7).astype(np.float32)
    mask = rng.random((B, G, K, H, W)).astype(np.float32)
    weight = rng.standard_normal((Cout, Cin, k, k)).astype(np.float32) * 0.3
    bias = rng.standard_normal(Cout).astype(np.float32)

    tx = torch.from_numpy(x).requires_grad_(True)
    toff = torch.from_numpy(offset).requires_grad_(True)
    tmask = torch.from_numpy(mask).requires_grad_(True)
    tw = torch.from_numpy(weight).requires_grad_(True)
    tb = torch.from_numpy(bias).requires_grad_(True)
    loss_t = torch_dcn_naive(tx, toff, tmask, tw, tb, 1, 1, 1, G).pow(2).sum()
    loss_t.backward()

    def loss_fn(xx, oo, mm, ww, bb):
        out = deform_conv2d(xx, oo, mm, ww, bb)
        return (out ** 2).sum()

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offset.transpose(0, 4, 5, 1, 2, 3)),
        jnp.asarray(mask.transpose(0, 3, 4, 1, 2)),
        jnp.asarray(weight.transpose(2, 3, 1, 0)),
        jnp.asarray(bias),
    )
    np.testing.assert_allclose(
        np.asarray(grads[0]).transpose(0, 3, 1, 2), tx.grad.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(grads[1]).transpose(0, 3, 4, 5, 1, 2),
        toff.grad.numpy(), atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(grads[2]).transpose(0, 3, 4, 1, 2), tmask.grad.numpy(),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(grads[3]).transpose(3, 2, 0, 1), tw.grad.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(grads[4]), tb.grad.numpy(), atol=1e-3)


def test_split_offset_mask_layout():
    """Channel layout must match the CUDA reader: offset = cat(o1, o2) viewed
    per group as interleaved (dy, dx) tap pairs."""
    B, H, W, G, K = 1, 2, 2, 2, 9
    conv_out = np.arange(B * H * W * 3 * G * K, dtype=np.float32).reshape(
        B, H, W, 3 * G * K
    )
    offset, mask = split_offset_mask(jnp.asarray(conv_out), G, 3)
    cat = np.concatenate(
        [conv_out[..., : G * K], conv_out[..., G * K : 2 * G * K]], axis=-1
    )
    for g in range(G):
        for m in range(K):
            np.testing.assert_array_equal(
                np.asarray(offset[..., g, m, 0]), cat[..., g * 2 * K + 2 * m]
            )
            np.testing.assert_array_equal(
                np.asarray(offset[..., g, m, 1]), cat[..., g * 2 * K + 2 * m + 1]
            )


class TestDenseShiftDCN:
    """Gather-free dense-shift DCN (impl='dense') vs the patch-gather path:
    exact whenever sample displacements fit shift_bound."""

    def test_matches_patch_gather(self, rng):
        from stif_tpu.ops.deform_conv import deform_conv2d, dcn_shift_stats

        B, H, W, Cin, Cout, G = 2, 12, 16, 16, 16, 4
        x = jnp.asarray(rng.random((B, H, W, Cin)), jnp.float32)
        off = jnp.asarray(rng.uniform(-3, 3, (B, H, W, G, 9, 2)), jnp.float32)
        mask = jnp.asarray(rng.random((B, H, W, G, 9)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1,
                          jnp.float32)
        bias = jnp.asarray(rng.standard_normal(Cout), jnp.float32)
        want = deform_conv2d(x, off, mask, wgt, bias, impl="patch")
        got = deform_conv2d(x, off, mask, wgt, bias, impl="dense",
                            shift_bound=5)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert float(dcn_shift_stats(off)) <= 5.0

    def test_boundary_clamping_exact(self, rng):
        """Offsets pushing samples off the image: zero-weight corners make
        the dense path's clamped selections exact."""
        from stif_tpu.ops.deform_conv import deform_conv2d

        B, H, W, Cin, Cout, G = 1, 8, 10, 8, 8, 2
        x = jnp.asarray(rng.random((B, H, W, Cin)), jnp.float32)
        off = jnp.asarray(rng.uniform(-4, 4, (B, H, W, G, 9, 2)), jnp.float32)
        mask = jnp.asarray(rng.random((B, H, W, G, 9)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1,
                          jnp.float32)
        want = deform_conv2d(x, off, mask, wgt, None, impl="patch")
        got = deform_conv2d(x, off, mask, wgt, None, impl="dense",
                            shift_bound=6)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_set_dcn_impl_auto_dispatch(self, rng):
        from stif_tpu.ops import deform_conv as dc

        B, H, W, Cin, G = 1, 6, 6, 8, 2
        x = jnp.asarray(rng.random((B, H, W, Cin)), jnp.float32)
        off = jnp.asarray(rng.uniform(-1, 1, (B, H, W, G, 9, 2)), jnp.float32)
        mask = jnp.asarray(rng.random((B, H, W, G, 9)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, Cin, Cin)) * 0.1,
                          jnp.float32)
        want = dc.deform_conv2d(x, off, mask, wgt, None, impl="auto")
        try:
            dc.set_dcn_impl("dense")
            got = dc.deform_conv2d(x, off, mask, wgt, None, impl="auto")
            # strided DCNs fall back to the gather path under dense default
            x2 = jnp.asarray(rng.random((B, 8, 8, Cin)), jnp.float32)
            off2 = jnp.asarray(
                rng.uniform(-1, 1, (B, 4, 4, G, 9, 2)), jnp.float32)
            mask2 = jnp.asarray(rng.random((B, 4, 4, G, 9)), jnp.float32)
            strided = dc.deform_conv2d(x2, off2, mask2, wgt, None,
                                       stride=2, impl="auto")
            assert strided.shape == (B, 4, 4, Cin)
        finally:
            dc.set_dcn_impl("patch")
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestWindowDCN:
    """Tap-clustered window gather (impl='window') vs the patch path.

    Contract: equality with impl='patch' to fp32 rounding for ANY offsets
    (the separable one-hot contraction sums bilinear weights in a different
    order than the patch path's folded weights) — via the fast windowed path
    when taps fit their (Wy, Wx) window, via the runtime lax.cond fallback
    when they escape."""

    def _mk(self, rng, scale, H=10, W=12, B=2, Cin=8, Cout=6, G=2):
        x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
        off = (rng.standard_normal((B, H, W, G, 9, 2)) * scale
               ).astype(np.float32)
        mask = rng.random((B, H, W, G, 9)).astype(np.float32)
        wgt = (rng.standard_normal((3, 3, Cin, Cout)) * 0.2
               ).astype(np.float32)
        bias = rng.standard_normal(Cout).astype(np.float32)
        return tuple(map(jnp.asarray, (x, off, mask, wgt, bias)))

    @pytest.mark.parametrize("scale", [0.0, 0.7, 2.0, 50.0])
    def test_matches_patch_any_offsets(self, rng, scale):
        x, off, mask, wgt, bias = self._mk(rng, scale)
        want = deform_conv2d(x, off, mask, wgt, bias, impl="patch")
        got = deform_conv2d(x, off, mask, wgt, bias, impl="window",
                            window=(6, 6))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_out_of_image_taps_do_not_force_fallback(self, rng):
        """Taps pointing far outside the image contribute exactly zero
        (zero-padded bilinear) and must neither drag the window start nor
        trip the exactness predicate."""
        from stif_tpu.ops.deform_conv import _window_plan

        x, off, mask, wgt, bias = self._mk(rng, 0.5)
        # push taps 0..3 of group 0 far outside the image
        off = off.at[:, :, :, 0, :4, 0].add(300.0)
        want = deform_conv2d(x, off, mask, wgt, bias, impl="patch")
        got = deform_conv2d(x, off, mask, wgt, bias, impl="window",
                            window=(6, 6))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # predicate check: the fast path is genuinely taken
        B, H, W, Cin = x.shape
        ys = jnp.arange(H, dtype=jnp.float32)[:, None, None]
        xs = jnp.arange(W, dtype=jnp.float32)[None, :, None]
        ti = (jnp.arange(3, dtype=jnp.float32)[:, None]
              .repeat(3, 1).reshape(9) - 1.0)
        tj = (jnp.arange(3, dtype=jnp.float32)[None, :]
              .repeat(3, 0).reshape(9) - 1.0)
        py = (ys + ti)[None, :, :, None, :] + off[..., 0]
        px = (xs + tj)[None, :, :, None, :] + off[..., 1]
        *_, ok = _window_plan(py.reshape(B, -1, 2, 9),
                              px.reshape(B, -1, 2, 9), H, W, 6, 6)
        assert bool(ok)

    def test_predicate_flags_wide_spread(self, rng):
        from stif_tpu.ops.deform_conv import _window_plan

        # two in-image taps 8 px apart cannot fit a 6-px window
        py = jnp.asarray([[[[2.0, 10.0]]]])
        px = jnp.asarray([[[[3.0, 3.0]]]])
        *_, ok = _window_plan(py, px, 16, 16, 6, 6)
        assert not bool(ok)

    def test_auto_dispatch_and_small_source_degrade(self, rng):
        from stif_tpu.ops import deform_conv as dc

        x, off, mask, wgt, bias = self._mk(rng, 0.7)
        want = dc.deform_conv2d(x, off, mask, wgt, bias, impl="patch")
        try:
            dc.set_dcn_impl("window", window=(6, 6))
            got = dc.deform_conv2d(x, off, mask, wgt, bias, impl="auto")
            # sources smaller than the window degrade statically to patch
            xs = x[:, :4, :4]
            offs, masks = off[:, :4, :4], mask[:, :4, :4]
            small = dc.deform_conv2d(xs, offs, masks, wgt, bias,
                                     impl="auto")
            wants = dc.deform_conv2d(xs, offs, masks, wgt, bias,
                                     impl="patch")
        finally:
            dc.set_dcn_impl("patch")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(small), np.asarray(wants),
                                   atol=1e-5)
