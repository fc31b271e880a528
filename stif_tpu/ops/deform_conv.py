"""Modulated deformable convolution (DCNv2) — XLA reference implementation.

Parity target: the reference's CUDA extension forward
(``codes/models/modules/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:25-195`` +
``dcn_v2_cuda.cu:19-160``): per-tap learned (dy, dx) offsets shared across each
deformable group's channels, bilinear sampling with zero padding (a sample
whose 4-corner support is fully outside contributes 0; partially-outside
corners contribute 0 per corner), sigmoid-modulated mask, then a dense
contraction with the conv weight over (Cin x kh x kw).

TPU-first design: the sample positions and bilinear corner weights are VPU
elementwise math; the four corner reads are batched gathers over the flattened
spatial axis; the final contraction is one big (Q, Cin*K) x (Cin*K, Cout)
matmul that maps straight onto the MXU. Because everything is expressed in
differentiable jnp ops (gathers lower to scatter-add on the backward pass),
``jax.grad`` reproduces the reference's hand-written backward semantics
(``dcn_v2_im2col_cuda.cu:56-123``) with no custom VJP.

No fused Pallas kernel exists for this op: Mosaic's in-kernel gather support
cannot express the per-query dynamic patch reads (measured round 1 — see
ROUND_NOTES.md "dead ends"), and the XLA graph here already keeps the
contraction on the MXU with the gathers as the bound resource.

Three implementations share the exact semantics:
  * ``impl='patch'`` — batched 2x2xC patch gathers (exact for ANY offsets);
  * ``impl='dense'`` — gather-free static-shift one-hot contraction
    (``_dcn_dense_shift``), exact iff sample displacements fit
    ``shift_bound`` (validate with ``dcn_shift_stats``); trades the
    gather bottleneck for dense VPU math.
  * ``impl='window'`` — tap-clustered window gather: ONE (Wy, Wx, CpG)
    slice per (query, group) covers all K taps' bilinear corners (the TPU
    gather is per-index bound at ~30M idx/s, so K x fewer indices is the
    lever), taps are then extracted with separable one-hot contractions on
    the VPU. Exact for any input: a data-dependent ``lax.cond`` falls back
    to the patch path whenever some tap's corner escapes its window
    (trained offsets are smooth — taps of one query cluster tightly even
    when their common magnitude is large; see ``tools/offset_stats.py``
    tap_spread stats).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

IntPair = Union[int, Tuple[int, int]]

# Process-wide default for impl="auto" call sites: lets the bench/eval
# drivers flip every DCN in a model to the dense-shift path without plumbing
# a parameter through each module. Set BEFORE tracing/jitting (the choice is
# baked into the compiled program).
_DEFAULT_IMPL = "patch"
_DEFAULT_SHIFT_BOUND = None  # None: use each call site's shift_bound
_DEFAULT_WINDOW = (8, 8)     # impl='window' tap-cluster window (rows, cols)


def set_dcn_impl(impl: str, shift_bound: int = None, window=None):
    """Set the implementation used by impl='auto' DCN calls:
    'patch' (gather, exact for any offsets), 'dense' (static shifts, exact
    iff offsets fit the shift bound), or 'window' (tap-clustered gather,
    exact for any offsets via runtime fallback). ``shift_bound`` overrides
    every auto call site's bound (validate with ``dcn_shift_stats`` first);
    ``window`` sets the (Wy, Wx) tap-cluster window."""
    global _DEFAULT_IMPL, _DEFAULT_SHIFT_BOUND, _DEFAULT_WINDOW
    assert impl in ("patch", "dense", "window")
    _DEFAULT_IMPL = impl
    _DEFAULT_SHIFT_BOUND = shift_bound
    if window is not None:
        _DEFAULT_WINDOW = (int(window[0]), int(window[1]))


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def split_offset_mask(conv_out, deformable_groups: int, kernel_size: IntPair = 3):
    """Split a raw offset/mask conv output into (offset, mask).

    ``conv_out``: (B, H, W, 3*G*K) laid out like the reference's
    ``conv_offset_mask`` output chunked into (o1, o2, mask_logits)
    (``DCNv2/dcn_v2.py:130-138``): ``offset = concat(o1, o2)`` then read per
    group as interleaved (dy, dx) pairs per tap.

    Returns offset (B, H, W, G, K, 2) with [..., 0]=dy, [..., 1]=dx, and
    sigmoid mask (B, H, W, G, K).
    """
    kh, kw = _pair(kernel_size)
    K = kh * kw
    G = deformable_groups
    B, H, W, _ = conv_out.shape
    o1 = conv_out[..., : G * K]
    o2 = conv_out[..., G * K : 2 * G * K]
    mask_logits = conv_out[..., 2 * G * K :]
    offset = jnp.concatenate([o1, o2], axis=-1).reshape(B, H, W, G, K, 2)
    mask = jax.nn.sigmoid(mask_logits.reshape(B, H, W, G, K))
    return offset, mask


def _raw_grouped_gather(xg, sy, sx):
    """xg: (B, H, W, G, CpG); sy, sx: (B, Q, G, K) int starts.
    Returns the patches FLAT: (B, Q*G*K, 4*CpG), rows ordered (q, g, k)
    row-major, each row holding [p00 p01 p10 p11] contiguously.

    Default layout pre-materializes each (2, 2, CpG) patch of each group as
    ONE contiguous 4*CpG row and gathers with 1-D starts — 1.9x faster
    than the multi-dim slice on v5e together with sub-gather splitting
    (GATHER_BENCH_r03.json; the gather cost is ~per-contiguous-run and a
    (2,2) slice is four runs).

    The FLAT return shape is load-bearing for performance: reshaping to
    (B, Q, G, K, 2, 2, CpG) forces a materialized relayout whose (2, CpG)
    minor dims tile-pad ~16x on TPU — measured +7.7 ms on the encoder's
    1.1M-index L1 shape, the dominant cost of the whole DCN
    (tools/gather_decompose.py: rgg_7d 13.5 ms vs rgg_flat 5.8 ms).
    Consumers must fold corner weights via lane-aligned slices of the flat
    row (see ``_dcn_patch_gather``), never via a 7-D einsum."""
    from stif_tpu.ops.gather_utils import _GATHER_LAYOUT, _gather_rows

    B, H, W, G, CpG = xg.shape
    Q, K = sy.shape[1], sy.shape[3]
    if _GATHER_LAYOUT == "flat":
        # rows r = (y*W + x)*G + g hold [p00 p01 p10 p11] of group g
        xp = jnp.pad(xg, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
        rows = jnp.concatenate([
            xp[:, :H, :W], xp[:, :H, 1:W + 1],
            xp[:, 1:H + 1, :W], xp[:, 1:H + 1, 1:W + 1],
        ], axis=-1).reshape(B, H * W * G, 4 * CpG)
        gi = jnp.arange(G, dtype=jnp.int32)[None, None, :, None]
        ridx = ((sy * W + sx) * G + gi).reshape(B, -1)
        return _gather_rows(rows, ridx)
    gi = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[None, None, :, None], sy.shape
    )
    starts = jnp.stack(
        [sy.reshape(B, -1), sx.reshape(B, -1), gi.reshape(B, -1)], axis=-1
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4, 5),
        collapsed_slice_dims=(),
        start_index_map=(1, 2, 3),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(xg, starts, dn,
                             slice_sizes=(1, 2, 2, 1, CpG), mode="clip")
    return patches.reshape(B, Q * G * K, 4 * CpG)


@jax.custom_vjp
def _grouped_patch_gather(xg, sy, sx):
    return _raw_grouped_gather(xg, sy, sx)


def _gpg_fwd(xg, sy, sx):
    # save xg only for its shape/dtype (no copy; it is alive upstream anyway)
    return _raw_grouped_gather(xg, sy, sx), (xg, sy, sx)


def _gpg_bwd(res, ct):
    """x-cotangent of the grouped patch gather.

    XLA's scatter-add transpose runs ~0.7M idx/s on TPU (the dominant cost of
    DCN training); for LR-sized sources a per-group dense one-hot contraction
    on the MXU is ~2 orders of magnitude faster (see ops/gather_utils.py).
    """
    from stif_tpu.ops.gather_utils import ONEHOT_BWD_MAX_HW

    xg, sy, sx = res
    B, H, W, G, CpG = xg.shape
    dtype = xg.dtype
    Q, K = sy.shape[1], sy.shape[3]
    HW = H * W
    # ct arrives FLAT (B, Q*G*K, 4*CpG); view cells on a 6-D axis (the
    # reshape is fused into the transpose chain below, never a boundary)
    ct = ct.astype(jnp.float32).reshape(B, Q, G, K, 4, CpG)
    if HW <= ONEHOT_BWD_MAX_HW:
        pix = jnp.arange(HW, dtype=jnp.int32)
        chunk = 16384
        # stack the 4 patch cells along the row axis, keep groups batched
        rows, upds = [], []
        for i in range(2):
            for j in range(2):
                # (B, Q, G, K) -> (B, G, QK)
                rows.append(((sy + i) * W + (sx + j)).transpose(0, 2, 1, 3)
                            .reshape(B, G, -1))
                upds.append(ct[..., 2 * i + j, :].transpose(0, 2, 1, 3, 4)
                            .reshape(B, G, -1, CpG))
        idx = jnp.concatenate(rows, axis=2)                # (B, G, 4QK)
        upd = jnp.concatenate(upds, axis=2)                # (B, G, 4QK, CpG)
        R = idx.shape[2]
        n_chunks = max(1, -(-R // chunk))
        if n_chunks * chunk != R:
            pad = n_chunks * chunk - R
            idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)))
            upd = jnp.pad(upd, ((0, 0), (0, 0), (0, pad), (0, 0)))
        idx = idx.reshape(B, G, n_chunks, chunk).transpose(2, 0, 1, 3)
        upd = upd.reshape(B, G, n_chunks, chunk, CpG).transpose(2, 0, 1, 3, 4)

        def body(dxg, inputs):
            idx_c, upd_c = inputs  # (B, G, chunk), (B, G, chunk, CpG)
            onehot = (idx_c[..., None] == pix).astype(jnp.float32)
            return dxg + jnp.einsum(
                "bgrp,bgrc->bgpc", onehot, upd_c,
                preferred_element_type=jnp.float32), None

        dxg, _ = jax.lax.scan(
            body, jnp.zeros((B, G, HW, CpG), jnp.float32), (idx, upd))
        dx = dxg.transpose(0, 2, 1, 3).reshape(B, H, W, G, CpG)
        return dx.astype(dtype), None, None
    # fallback: scatter-add transpose
    gi = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[None, None, :, None], sy.shape
    )
    starts = jnp.stack(
        [sy.reshape(B, -1), sx.reshape(B, -1), gi.reshape(B, -1)], axis=-1
    )
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2, 3, 4, 5),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(1, 2, 3),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    dx = jax.lax.scatter_add(
        jnp.zeros((B, H, W, G, CpG), jnp.float32), starts,
        ct.reshape(B, -1, 2, 2, CpG)[:, :, :, :, None, :], dn, mode="clip",
    )
    return dx.astype(dtype), None, None


_grouped_patch_gather.defvjp(_gpg_fwd, _gpg_bwd)


def _dcn_patch_gather(x, py, px, mask, weight, bias, G, gather_dtype=None):
    """Patch-gather DCN core: one fused (2, 2, CpG) gather per (query, group,
    tap) instead of four corner gathers — the per-index-bound TPU gather does
    ~2.4x better on big contiguous slices (see ops/gather_utils.py).

    x: (B, H, W, Cin); py, px: (B, Q, G, K) float positions;
    mask: (B, Q, G, K); weight: (kh, kw, Cin, Cout).
    """
    from stif_tpu.ops.gather_utils import patch_weights

    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    CpG = Cin // G
    Q = py.shape[1]
    f32 = jnp.float32

    sy, sx, w = patch_weights(py, px, H, W, "zeros")  # (B,Q,G,K[,2,2])
    # optional reduced-precision gather source: bf16 halves the gather bytes
    # (1.5x faster on v5e); default fp32 preserves bit-parity
    src_dtype = gather_dtype or f32
    xg = x.astype(src_dtype).reshape(B, H, W, G, CpG)
    # one gather per (q, g, k): start = (y, x, g), slice (1, 2, 2, 1, CpG);
    # custom VJP — the x-cotangent uses a one-hot MXU contraction instead of
    # XLA's serial scatter-add
    pf = _grouped_patch_gather(xg, sy, sx)  # FLAT (B, Q*G*K, 4*CpG)
    pf = pf.astype(f32)
    # Fold the 4 bilinear corner weights via lane-aligned slices of the flat
    # row — NOT a 7-D (…, 2, 2, CpG) einsum, whose operand materializes with
    # ~16x tile padding and costs more than the gather itself (measured:
    # tools/gather_decompose.py, dcn_full 11.9 ms -> see flat fold).
    wm = (w * mask.astype(f32)[..., None, None]).reshape(B, Q * G * K, 4)
    col = sum(pf[:, :, c * CpG:(c + 1) * CpG] * wm[:, :, c:c + 1]
              for c in range(4))                     # (B, Q*G*K, CpG)
    col = col.reshape(B, Q, G, K, CpG)
    wr = weight.astype(f32).reshape(K, G, CpG, Cout)
    out = jnp.einsum("bqgkc,kgco->bqo", col, wr, preferred_element_type=f32)
    if bias is not None:
        out = out + bias.astype(f32)
    return out


def _axis_corner_weights(p, n: int):
    """Zero-padded bilinear corner decomposition along one axis.

    p: float positions (any shape). Returns (i0, w0, w1): floor corner
    index and the weights of corners i0 / i0+1, zeroed when the corner is
    outside [0, n) — the reference's zero-padding semantics
    (``dcn_v2_im2col_cuda.cu:25-54``), separably per axis.
    """
    p0 = jnp.floor(p)
    l = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = i0 + 1
    w0 = jnp.where((i0 >= 0) & (i0 < n), 1.0 - l, 0.0)
    w1 = jnp.where((i1 >= 0) & (i1 < n), l, 0.0)
    return i0, w0, w1


def _grouped_window_gather(xg, by, bx, Wy: int, Wx: int):
    """xg: (B, H, W, G, CpG); by, bx: (B, Q, G) int32 window starts.
    Returns (B, Q, G, Wy, Wx, CpG) — one slice gather per (query, group)."""
    B, H, W, G, CpG = xg.shape
    Q = by.shape[1]
    gi = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[None, None, :], by.shape)
    starts = jnp.stack(
        [by.reshape(B, -1), bx.reshape(B, -1), gi.reshape(B, -1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4, 5),
        collapsed_slice_dims=(),
        start_index_map=(1, 2, 3),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    win = jax.lax.gather(xg, starts, dn,
                         slice_sizes=(1, Wy, Wx, 1, CpG), mode="clip")
    return win.reshape(B, Q, G, Wy, Wx, CpG)


def _window_plan(py, px, H: int, W: int, Wy: int, Wx: int):
    """Window starts, in-window corner cells, axis weights, and the
    exactness predicate for the tap-clustered gather.

    py, px: (..., K) float positions (last axis = taps). Returns
    (by, bx) window starts without the tap axis, (r0, c0) in-window floor
    corners per tap, the four separable corner weights, and scalar ``ok``
    — True iff every nonzero-weight corner of every tap fits its window.
    """
    y0, wy0, wy1 = _axis_corner_weights(py, H)
    x0, wx0, wx1 = _axis_corner_weights(px, W)

    # Window start: min floor corner over the taps that contribute
    # anything. Dead taps (both corners zero-weighted along either axis)
    # must not drag the window — offsets frequently point far outside the
    # image, where the zero-padded sample is exactly 0.
    BIG = jnp.int32(1 << 20)
    dead = ((wy0 == 0.0) & (wy1 == 0.0)) | ((wx0 == 0.0) & (wx1 == 0.0))
    eff_y = jnp.where(dead, BIG, jnp.where(wy0 > 0.0, y0, y0 + 1))
    eff_x = jnp.where(dead, BIG, jnp.where(wx0 > 0.0, x0, x0 + 1))
    by = jnp.clip(jnp.min(eff_y, axis=-1), 0, max(H - Wy, 0))
    bx = jnp.clip(jnp.min(eff_x, axis=-1), 0, max(W - Wx, 0))
    r0 = y0 - by[..., None]   # in-window row of each tap's floor corner
    c0 = x0 - bx[..., None]

    # Fallback predicate: some live tap's nonzero-weight corner escapes.
    def _escapes(r, w, n):
        return (w > 0.0) & ((r < 0) | (r >= n))

    bad = jnp.logical_not(dead) & (
        _escapes(r0, wy0, Wy) | _escapes(r0 + 1, wy1, Wy)
        | _escapes(c0, wx0, Wx) | _escapes(c0 + 1, wx1, Wx))
    ok = jnp.logical_not(jnp.any(bad))
    return by, bx, r0, c0, (wy0, wy1, wx0, wx1), ok


def _dcn_window_gather(x, py, px, mask, weight, bias, G,
                       Wy: int, Wx: int, gather_dtype=None):
    """Tap-clustered DCN core: one (Wy, Wx, CpG) window gather per
    (query, group) replaces K 2x2 patch gathers — K x fewer gather indices
    on the per-index-bound TPU gather. Per-tap bilinear values are then
    extracted from the window by two separable one-hot contractions
    (VPU/MXU math, no further gathers).

    Exactness: equal to the patch path to fp32 rounding (the separable
    one-hot contraction sums bilinear weights in a different order than
    the patch path's folded weights) whenever every nonzero-weight
    bilinear corner of every tap lands inside its (query, group) window;
    a runtime ``lax.cond`` dispatches the whole call to the patch path
    otherwise, so the op is exact for ANY offsets (the fallback predicate
    is a single scalar reduce over the batch).

    x: (B, H, W, Cin); py, px: (B, Q, G, K) float positions;
    mask: (B, Q, G, K); weight: (kh, kw, Cin, Cout).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    CpG = Cin // G
    Q = py.shape[1]
    f32 = jnp.float32

    by, bx, r0, c0, (wy0, wy1, wx0, wx1), ok = _window_plan(
        py.astype(f32), px.astype(f32), H, W, Wy, Wx)

    wr = weight.astype(f32).reshape(K, G, CpG, Cout)

    def _fast(_):
        src_dtype = gather_dtype or f32
        xg = x.astype(src_dtype).reshape(B, H, W, G, CpG)
        win = _grouped_window_gather(xg, by, bx, Wy, Wx)
        u = jnp.arange(Wy, dtype=jnp.int32)
        v = jnp.arange(Wx, dtype=jnp.int32)
        sel_y = (wy0[..., None] * (r0[..., None] == u)
                 + wy1[..., None] * ((r0 + 1)[..., None] == u))  # (BQGK,Wy)
        sel_x = (wx0[..., None] * (c0[..., None] == v)
                 + wx1[..., None] * ((c0 + 1)[..., None] == v))
        # separable extraction: contract columns then rows (never
        # materializes the (B,Q,G,K,Wy,Wx) outer product)
        t = jnp.einsum("bqgkv,bqguvc->bqgkuc", sel_x.astype(f32),
                       win.astype(f32))
        col = jnp.einsum("bqgku,bqgkuc->bqgkc", sel_y.astype(f32), t)
        col = col * mask.astype(f32)[..., None]
        return jnp.einsum("bqgkc,kgco->bqo", col, wr,
                          preferred_element_type=f32)

    def _slow(_):
        return _dcn_patch_gather(x, py, px, mask, weight, None, G,
                                 gather_dtype=gather_dtype)

    out = jax.lax.cond(ok, _fast, _slow, None)
    if bias is not None:
        out = out + bias.astype(f32)
    return out


def _dcn_dense_shift(x, py, px, mask, weight, bias, G, Ho, Wo,
                     shift_bound: int, compute_dtype=None):
    """Gather-free DCN core for bounded offsets.

    The model's DCN queries are the pixel grid itself (stride 1, same-size),
    so a bilinear corner read at ``p + p_k + delta`` is the input image
    *statically shifted* by ``s = corner - p``. When ``|s| <= shift_bound``
    every per-query gather becomes a one-hot selection over a small shift
    axis — dense VPU/MXU math, no ``lax.gather`` (TPU gathers run at
    ~20-50M idx/s and bound the encoder; see ROUND_NOTES).

    Exactness: identical to the gather path (same separable corner weights,
    same zero-padding semantics) whenever all sample displacements satisfy
    ``|floor(p_sample) - p| + 1 <= shift_bound``; out-of-bound displacements
    are silently clamped to the nearest in-range shift (use
    ``dcn_shift_stats`` to validate a trained checkpoint before enabling).

    x: (B, H, W, Cin); py/px: (B, Q, G, K); mask: (B, Q, G, K).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    CpG = Cin // G
    f32 = jnp.float32
    S = int(shift_bound)
    U = 2 * S + 1

    yq = jnp.broadcast_to(
        jnp.arange(Ho, dtype=f32)[:, None], (Ho, Wo)).reshape(1, -1, 1, 1)
    xq = jnp.broadcast_to(
        jnp.arange(Wo, dtype=f32)[None, :], (Ho, Wo)).reshape(1, -1, 1, 1)

    def axis_sel(p, q, n):
        """Separable corner weights + one-hot shift selections for one axis.
        Returns (U,)-last tensors AY(b,q,g,k,u)."""
        p0 = jnp.floor(p)
        l = p - p0
        i0 = p0.astype(jnp.int32)
        i1 = i0 + 1
        w0 = jnp.where((i0 >= 0) & (i0 < n), 1.0 - l, 0.0)
        w1 = jnp.where((i1 >= 0) & (i1 < n), l, 0.0)
        qi = q.astype(jnp.int32)
        r0 = jnp.clip(jnp.clip(i0, 0, n - 1) - qi + S, 0, U - 1)
        r1 = jnp.clip(jnp.clip(i1, 0, n - 1) - qi + S, 0, U - 1)
        u = jnp.arange(U, dtype=jnp.int32)
        sel = (w0[..., None] * (r0[..., None] == u)
               + w1[..., None] * (r1[..., None] == u))
        return sel.astype(f32)

    AY = axis_sel(py.astype(f32), yq, H)   # (B, Q, G, K, U)
    AX = axis_sel(px.astype(f32), xq, W)
    AY = AY.reshape(B, Ho, Wo, G, K, U)
    AX = AX.reshape(B, Ho, Wo, G, K, U)

    # optional reduced-precision shift contraction: bf16 inputs put the
    # (K, U) x (U, CpG) per-pixel contraction on the MXU with fp32 accum
    cdt = compute_dtype or f32
    xg = x.astype(cdt).reshape(B, H, W, G, CpG)
    xpad = jnp.pad(xg, ((0, 0), (S, S), (S, S), (0, 0), (0, 0)))
    AXc = AX.astype(cdt)

    def body(acc, inputs):
        u, ay_u = inputs  # ay_u: (B, Ho, Wo, G, K)
        xrow = jax.lax.dynamic_slice(
            xpad, (0, u, 0, 0, 0), (B, H, W + 2 * S, G, CpG))
        xs = jnp.stack([xrow[:, :, v:v + W] for v in range(U)], axis=0)
        tmp = jnp.einsum("vbhwgc,bhwgkv->bhwgkc", xs, AXc,
                         preferred_element_type=f32)
        return acc + ay_u[..., None] * tmp, None

    acc0 = jnp.zeros((B, Ho, Wo, G, K, CpG), f32)
    col, _ = jax.lax.scan(
        body, acc0, (jnp.arange(U, dtype=jnp.int32),
                     jnp.moveaxis(AY, -1, 0)))
    col = col * mask.astype(f32).reshape(B, Ho, Wo, G, K, 1)
    wr = weight.astype(f32).reshape(K, G, CpG, Cout)
    out = jnp.einsum("bhwgkc,kgco->bhwo", col, wr,
                     preferred_element_type=f32)
    if bias is not None:
        out = out + bias.astype(f32)
    return out


def dcn_shift_stats(offset, kernel_size: IntPair = 3,
                    dilation: IntPair = 1):
    """Max |shift| a dense DCN needs for these offsets: validates a trained
    checkpoint's offsets against a ``shift_bound`` before enabling
    ``impl='dense'``. Returns the scalar max over (dy+tap, dx+tap) + 1."""
    kh, kw = _pair(kernel_size)
    dh, dw = _pair(dilation)
    K = kh * kw
    ti = (jnp.arange(kh, dtype=jnp.float32) * dh - (kh // 2) * dh)
    tj = (jnp.arange(kw, dtype=jnp.float32) * dw - (kw // 2) * dw)
    ti = ti[:, None].repeat(kw, 1).reshape(K)
    tj = tj[None, :].repeat(kh, 0).reshape(K)
    dy = jnp.abs(offset[..., 0] + ti)
    dx = jnp.abs(offset[..., 1] + tj)
    return jnp.maximum(dy.max(), dx.max()) + 1.0


def deform_conv2d(
    x,
    offset,
    mask,
    weight,
    bias=None,
    stride: IntPair = 1,
    padding: IntPair = 1,
    dilation: IntPair = 1,
    impl: str = "auto",
    gather_dtype=None,
    shift_bound: int = 6,
    window=None,
):
    """Modulated deformable conv, channels-last.

    Args:
      x:       (B, H, W, Cin)
      offset:  (B, Ho, Wo, G, K, 2) per-group per-tap (dy, dx) in pixels
      mask:    (B, Ho, Wo, G, K) modulation (already sigmoided)
      weight:  (kh, kw, Cin, Cout) HWIO
      bias:    (Cout,) or None
    Returns (B, Ho, Wo, Cout).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    G = offset.shape[3]
    CpG = Cin // G
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    Ho, Wo = offset.shape[1], offset.shape[2]
    Q = Ho * Wo

    f32 = jnp.float32
    # Base sampling positions per output pixel and tap.
    ys = (jnp.arange(Ho, dtype=f32) * sh - ph)[:, None, None]  # (Ho,1,1)
    xs = (jnp.arange(Wo, dtype=f32) * sw - pw)[None, :, None]  # (1,Wo,1)
    ti = (jnp.arange(kh, dtype=f32) * dh)[:, None].repeat(kw, 1).reshape(K)
    tj = (jnp.arange(kw, dtype=f32) * dw)[None, :].repeat(kh, 0).reshape(K)

    off = offset.astype(f32).reshape(B, Q, G, K, 2)
    base_y = jnp.broadcast_to(ys + ti[None, None], (Ho, Wo, K)).reshape(1, Q, 1, K)
    base_x = jnp.broadcast_to(xs + tj[None, None], (Ho, Wo, K)).reshape(1, Q, 1, K)
    py = base_y + off[..., 0]  # (B, Q, G, K)
    px = base_x + off[..., 1]

    if impl == "auto":
        impl = _DEFAULT_IMPL
        if _DEFAULT_SHIFT_BOUND is not None:
            shift_bound = _DEFAULT_SHIFT_BOUND
        if impl == "dense" and ((sh, sw) != (1, 1) or (Ho, Wo) != (H, W)):
            impl = "patch"  # dense path needs stride-1 same-size queries

    if impl == "window":
        Wy, Wx = _pair(window) if window is not None else _DEFAULT_WINDOW
        if H < Wy or W < Wx or K == 1:
            impl = "patch"  # window exceeds the source / nothing to cluster
        else:
            m = mask.astype(f32).reshape(B, Q, G, K)
            out = _dcn_window_gather(x, py, px, m, weight, bias, G, Wy, Wx,
                                     gather_dtype=gather_dtype)
            return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)

    if impl == "patch":
        m = mask.astype(f32).reshape(B, Q, G, K)
        out = _dcn_patch_gather(x, py, px, m, weight, bias, G,
                                gather_dtype=gather_dtype)
        return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)

    if impl == "dense":
        assert (sh, sw) == (1, 1) and (Ho, Wo) == (H, W), \
            "dense DCN requires stride-1 same-size queries"
        m = mask.astype(f32).reshape(B, Q, G, K)
        out = _dcn_dense_shift(x, py, px, m, weight, bias, G, Ho, Wo,
                               shift_bound, compute_dtype=gather_dtype)
        return out.astype(x.dtype)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = y0i + 1
    x1i = x0i + 1

    vy0 = (y0i >= 0) & (y0i < H)
    vy1 = (y1i >= 0) & (y1i < H)
    vx0 = (x0i >= 0) & (x0i < W)
    vx1 = (x1i >= 0) & (x1i < W)

    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)
    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)

    # (B, HW, G, CpG) source, gathered with (B, Q*K, G, 1) indices.
    x_flat = x.astype(f32).reshape(B, H * W, G, CpG)

    def corner(yc, xc, wgt):
        idx = (yc * W + xc).transpose(0, 1, 3, 2).reshape(B, Q * K, G, 1)
        v = jnp.take_along_axis(x_flat, idx, axis=1)  # (B, Q*K, G, CpG)
        w = wgt.transpose(0, 1, 3, 2).reshape(B, Q * K, G, 1)
        return v * w

    w00 = jnp.where(vy0 & vx0, (1 - ly) * (1 - lx), 0.0)
    w01 = jnp.where(vy0 & vx1, (1 - ly) * lx, 0.0)
    w10 = jnp.where(vy1 & vx0, ly * (1 - lx), 0.0)
    w11 = jnp.where(vy1 & vx1, ly * lx, 0.0)

    col = (
        corner(y0c, x0c, w00)
        + corner(y0c, x1c, w01)
        + corner(y1c, x0c, w10)
        + corner(y1c, x1c, w11)
    )  # (B, Q*K, G, CpG)

    m = mask.astype(f32).reshape(B, Q, G, K).transpose(0, 1, 3, 2)
    col = col.reshape(B, Q, K, G, CpG) * m.reshape(B, Q, K, G, 1)

    # Contract with weight on the MXU: (B*Q, K*Cin) @ (K*Cin, Cout).
    w = weight.astype(f32).reshape(K, Cin, Cout).reshape(K, G, CpG, Cout)
    out = jnp.einsum(
        "bqkgc,kgco->bqo", col, w, preferred_element_type=f32
    )
    if bias is not None:
        out = out + bias.astype(f32)
    return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)
