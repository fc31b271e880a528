"""ConvLSTM cell and the bidirectional *deformable* ConvLSTM.

Parity targets: ``ConvLSTMCell`` (``codes/models/modules/convlstm.py:6-58``),
``DeformableConvLSTM`` / ``BiDeformableConvLSTM``
(``codes/models/modules/Sakuya_arch_test.py:168-266``): before every cell
update, the hidden and cell states are PCD-aligned to the current input
(``h_temp = pcd_h(x_t, h)``, ``c_temp = pcd_c(x_t, c)``).

TPU-first design: the reference's Python loop over time steps becomes
``nn.scan`` (``jax.lax.scan``) — the step body (two full PCD pyramids + the
cell conv) is compiled once and iterated, keeping compile time flat in sequence
length. The backward direction runs the *same* scanned module on the reversed
sequence (shared weights, as in the reference ``:256-260``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.nn.blocks import Conv
from stif_tpu.nn.pcd import EasyPCD


class ConvLSTMCell(nn.Module):
    hidden_dim: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        combined = jnp.concatenate([x, h], axis=-1)
        gates = Conv(4 * self.hidden_dim, self.kernel_size, 1,
                     self.kernel_size // 2, name="conv")(combined)
        cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(cc_i)
        f = jax.nn.sigmoid(cc_f)
        o = jax.nn.sigmoid(cc_o)
        g = jnp.tanh(cc_g)
        c_next = f * c + i * g
        h_next = o * jnp.tanh(c_next)
        return h_next, c_next


class _DeformableLSTMStep(nn.Module):
    """One time step: PCD-align (h, c) to x_t, then the ConvLSTM cell."""

    nf: int = 64
    groups: int = 8
    gather_dtype: object = None

    @nn.compact
    def __call__(self, carry, x_t):
        h, c = carry
        h_temp = EasyPCD(self.nf, self.groups, self.gather_dtype,
                         name="pcd_h")(x_t, h)
        c_temp = EasyPCD(self.nf, self.groups, self.gather_dtype,
                         name="pcd_c")(x_t, c)
        h_next, c_next = ConvLSTMCell(self.nf, name="cell")(x_t, (h_temp, c_temp))
        return (h_next, c_next), h_next


class DeformableConvLSTM(nn.Module):
    """Unidirectional deformable ConvLSTM over (B, T, H, W, C)."""

    nf: int = 64
    groups: int = 8
    gather_dtype: object = None
    # debug/instrumentation: run the steps as a Python loop instead of
    # nn.scan (identical params and math; lets eager tooling observe
    # per-step internals that scan+remat hide, e.g. tools/offset_stats.py)
    unroll: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        init = (
            jnp.zeros((B, H, W, self.nf), x.dtype),
            jnp.zeros((B, H, W, self.nf), x.dtype),
        )
        if self.unroll:
            step = _DeformableLSTMStep(self.nf, self.groups,
                                       self.gather_dtype, name="step")
            carry, hs = init, []
            for t in range(T):
                carry, h = step(carry, x[:, t])
                hs.append(h)
            return jnp.stack(hs, axis=1)
        # remat the step: the two PCD pyramids per step are recomputed in the
        # backward pass instead of storing their activations x T steps —
        # trades ~2x step FLOPs for O(T) memory in training; no effect on
        # inference (jax.checkpoint is an autodiff-only transform).
        scan = nn.scan(
            nn.remat(_DeformableLSTMStep),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, hs = scan(self.nf, self.groups, self.gather_dtype,
                     name="step")(init, x)
        return hs  # (B, T, H, W, nf)


class BiDeformableConvLSTM(nn.Module):
    """Forward + reversed pass through the *same* network, channel-concat,
    1x1 merge (reference ``BiDeformableConvLSTM.forward``).

    TPU-first: because the two directions share every parameter
    (``Sakuya_arch_test.py:256-260`` reuses ``forward_net``), they are by
    default evaluated as ONE scan at batch 2B — [x ; reverse(x)] stacked on
    the batch axis — instead of two sequential B-sized scans. Per-sample
    math is identical (every op in the step is batch-parallel); the
    sequential dependency chain is half as long and each conv/gather runs
    at twice the size, which is the efficient direction for a
    dispatch/gather-bound encoder. ``fuse_dirs=False`` restores the
    two-pass form (2x smaller peak state for memory-tight training).
    """

    nf: int = 64
    groups: int = 8
    gather_dtype: object = None
    unroll: bool = False
    fuse_dirs: bool = True

    @nn.compact
    def __call__(self, x):
        net = DeformableConvLSTM(self.nf, self.groups, self.gather_dtype,
                                 self.unroll, name="forward_net")
        if self.fuse_dirs and not self.unroll:
            B = x.shape[0]
            both = net(jnp.concatenate([x, x[:, ::-1]], axis=0))
            out_fwd = both[:B]
            out_rev = both[B:, ::-1]
        else:
            out_fwd = net(x)
            out_rev = net(x[:, ::-1])[:, ::-1]
        B, T, H, W, C = out_fwd.shape
        merged = jnp.concatenate([out_fwd, out_rev], axis=-1)
        merged = merged.reshape(B * T, H, W, 2 * C)
        merged = Conv(self.nf, 1, 1, 0, name="conv_1x1")(merged)
        return merged.reshape(B, T, H, W, self.nf)
