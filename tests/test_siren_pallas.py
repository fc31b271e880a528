"""Fused SIREN Pallas kernel vs the flax module (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stif_tpu.nn.siren import Siren
from stif_tpu.ops.siren_pallas import siren_apply_fused, siren_params_from_flax


@pytest.mark.parametrize("q,cin", [(100, 201), (1024, 525), (7, 63)])
def test_matches_flax_siren(rng, q, cin):
    model = Siren([64, 64, 256], 2, 4, outermost_linear=True)
    x = jnp.asarray(rng.standard_normal((q, cin)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))

    ws, bs = siren_params_from_flax(params["params"])
    got = np.asarray(
        siren_apply_fused(x, ws, bs, tile_q=256, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_batched_leading_dims(rng):
    model = Siren([64, 64, 256, 256], 3, 3, outermost_linear=True)
    x = jnp.asarray(rng.standard_normal((2, 3, 50, 40)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)
    want = np.asarray(model.apply(params, x))
    ws, bs = siren_params_from_flax(params["params"])
    got = np.asarray(siren_apply_fused(x, ws, bs, tile_q=128, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_multi_input_fields(rng):
    """Field-list input: per-tile VMEM concat must equal explicit concat."""
    model = Siren([64, 64, 256], 2, 4, outermost_linear=True)
    parts = [
        jnp.asarray(rng.standard_normal((64, c)).astype(np.float32))
        for c in (64, 192, 6, 1)
    ]
    x = jnp.concatenate(parts, axis=-1)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    ws, bs = siren_params_from_flax(params["params"])
    got = np.asarray(
        siren_apply_fused(parts, ws, bs, tile_q=32, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    # the flax module also accepts the tuple directly (non-pallas path)
    got2 = np.asarray(model.apply(params, tuple(parts)))
    np.testing.assert_allclose(got2, want, atol=1e-6)


def test_split_first_equals_concat(rng):
    """split_first: per-part first-layer matmuls must equal the concat
    form to fp32-accumulation reordering (the opt-in serving lever)."""
    parts = [
        jnp.asarray(rng.standard_normal((64, c)).astype(np.float32))
        for c in (64, 192, 6, 1)
    ]
    base = Siren([64, 64, 256], 2, 4, outermost_linear=True)
    params = base.init(jax.random.PRNGKey(0), jnp.concatenate(parts, -1))
    want = np.asarray(base.apply(params, tuple(parts)))
    split = Siren([64, 64, 256], 2, 4, outermost_linear=True,
                  split_first=True)
    got = np.asarray(split.apply(params, tuple(parts)))  # same params
    np.testing.assert_allclose(got, want, atol=1e-6)
    # non-tuple input ignores the flag (concat path)
    x = jnp.concatenate(parts, axis=-1)
    np.testing.assert_allclose(np.asarray(split.apply(params, x)),
                               np.asarray(base.apply(params, x)), atol=0)


def test_split_first_bf16_compute(rng):
    """split_first composes with compute_dtype: bf16 parts, fp32 accum."""
    parts = [
        jnp.asarray(rng.standard_normal((32, c)).astype(np.float32))
        for c in (16, 8)
    ]
    base = Siren([32, 32], 1, 3, outermost_linear=True,
                 compute_dtype=jnp.bfloat16)
    params = base.init(jax.random.PRNGKey(2), jnp.concatenate(parts, -1))
    want = np.asarray(base.apply(params, tuple(parts)))
    split = Siren([32, 32], 1, 3, outermost_linear=True,
                  compute_dtype=jnp.bfloat16, split_first=True)
    got = np.asarray(split.apply(params, tuple(parts)))
    assert got.dtype == want.dtype
    np.testing.assert_allclose(got, want, atol=2e-2)
