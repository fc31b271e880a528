"""Fused SIREN-MLP Pallas kernel for the coordinate decoder.

Why: the decoder evaluates three SIREN MLPs over millions of (x, y, t)
queries per frame. The XLA lowering materializes the concatenated input
(e.g. 525 channels for the encode net — multi-GB at production sizes) and
every hidden activation in HBM, so the op chain is HBM-bandwidth-bound.
This kernel tiles the query axis: each grid step loads a tile of the
(pre-concatenated) input, runs the whole matmul+sin chain in VMEM on the MXU,
and writes only the final (tile, out_features) block — hidden activations
never touch HBM.

Semantics parity: ``stif_tpu.nn.siren.Siren`` (reference
``codes/models/modules/SIREN.py``): y_i = sin(30 * (x W_i + b_i)) for all but
the final plain linear layer. fp32 accumulation on the MXU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _siren_kernel(*refs, n_inputs: int, n_layers: int, omega0: float):
    """refs: [x0..x{n_inputs-1}, w0, b0, w1, b1, ..., out_ref].

    The input field tiles are concatenated along lanes *in VMEM* — the wide
    decoder input (e.g. 525 channels from 7 gathered fields) never
    materializes in HBM.
    """
    out_ref = refs[-1]
    h = jnp.concatenate([refs[i][:] for i in range(n_inputs)], axis=-1)
    for i in range(n_layers):
        w = refs[n_inputs + 2 * i][:]
        b = refs[n_inputs + 2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = jnp.sin(omega0 * h)
    out_ref[:] = h.astype(out_ref.dtype)


def siren_apply_fused(x, weights: Sequence, biases: Sequence,
                      omega0: float = 30.0, tile_q: int = 1024,
                      interpret: bool = False):
    """Fused SIREN forward.

    x: (..., Q, Cin) array — or a list/tuple of arrays sharing leading dims,
    concatenated along the feature axis inside the kernel (per VMEM tile).
    weights[i]: (Cin_i, Cout_i); biases[i]: (Cout_i,). The last layer is
    plain linear (no sine), matching ``Siren(outermost_linear=True)``.
    """
    xs = list(x) if isinstance(x, (tuple, list)) else [x]
    n_layers = len(weights)
    lead_shape = xs[0].shape[:-1]
    cins = [v.shape[-1] for v in xs]
    cout = weights[-1].shape[1]
    q = 1
    for d in lead_shape:
        q *= d
    xs2 = [v.reshape(q, v.shape[-1]) for v in xs]

    # Pad Q to a tile multiple and the final output dim to a lane multiple.
    qp = _round_up(max(q, 1), tile_q)
    if qp != q:
        xs2 = [jnp.pad(v, ((0, qp - q), (0, 0))) for v in xs2]
    cout_p = _round_up(cout, 128)
    wl = list(weights)
    bl = list(biases)
    if cout_p != cout:
        wl[-1] = jnp.pad(wl[-1], ((0, 0), (0, cout_p - cout)))
        bl[-1] = jnp.pad(bl[-1], ((0, cout_p - cout),))

    in_specs = [
        pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for c in cins
    ]
    params = []
    for w, b in zip(wl, bl):
        params += [w.astype(jnp.float32), b.reshape(1, -1).astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(_siren_kernel, n_inputs=len(xs),
                               n_layers=n_layers, omega0=omega0)
    out = pl.pallas_call(
        kernel,
        grid=(qp // tile_q,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_q, cout_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, cout_p), xs[0].dtype),
        interpret=interpret,
    )(*xs2, *params)
    return out[:q, :cout].reshape(lead_shape + (cout,))


def siren_params_from_flax(siren_variables):
    """Extract ordered (weights, biases) lists from a flax Siren param
    sub-tree ({'layer0': {'kernel', 'bias'}, ...})."""
    layers = sorted(siren_variables, key=lambda k: int(k[len("layer"):]))
    ws = [siren_variables[l]["kernel"] for l in layers]
    bs = [siren_variables[l]["bias"] for l in layers]
    return ws, bs
