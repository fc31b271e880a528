"""Reduced-precision inference modes: outputs must stay close to fp32.

These are the bench/serving levers (``gather_dtype``, ``mlp_dtype``) — bit
parity is NOT expected (that is what the fp32 default is for), but the
bf16 paths must agree to bf16-level tolerance and share the exact same
parameter schema (precision is a compute-time cast, never a param dtype).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full models: minutes on the 1-core CI host

import jax
import jax.numpy as jnp

from stif_tpu.models import LunaTokis


@pytest.fixture(scope="module")
def tiny_setup():
    model = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
    times = jnp.asarray([0.25, 0.75])
    params = model.init(jax.random.PRNGKey(0), x, times,
                        method=model.full_init)
    return model, params, x, times


def test_mlp_dtype_bf16_close(tiny_setup):
    model, params, x, times = tiny_setup
    want = model.apply(params, x, times)
    model16 = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                        mlp_dtype=jnp.bfloat16)
    got = model16.apply(params, x, times)  # same params: cast-only change
    assert got.dtype == want.dtype
    # rgb in [0,1]-ish units: bf16 matmuls with fp32 accum stay within ~1e-2
    assert float(jnp.max(jnp.abs(got - want))) < 2e-2


def test_gather_dtype_bf16_close(tiny_setup):
    model, params, x, times = tiny_setup
    want = model.apply(params, x, times)
    model16 = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                        gather_dtype=jnp.bfloat16)
    got = model16.apply(params, x, times)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-2


def test_encode_splitk_equal(tiny_setup):
    """encode_splitk is the same math modulo fp32-sum reordering: the
    525-wide encode_imnet concat never materializes (split-K first layer);
    measured 4.5e-8 at bench shapes (DECODE_DECOMPOSE_r04.jsonl)."""
    model, params, x, times = tiny_setup
    want = model.apply(params, x, times)
    model_sk = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                         encode_splitk=True)
    got = model_sk.apply(params, x, times)  # same params: apply-time split
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5


def test_stagec_dedup_bitexact(tiny_setup):
    """stagec_dedup gathers the time-independent stage-C source once with
    nt folded into the query axis — same per-query arithmetic, so the
    outputs must be bit-identical (B=1 path)."""
    model, params, x, times = tiny_setup
    want = model.apply(params, x, times)
    model_dd = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                         stagec_dedup=True)
    got = model_dd.apply(params, x, times)
    assert float(jnp.max(jnp.abs(got - want))) == 0.0


def test_stagec_dedup_batched(tiny_setup):
    """B=2: the fold/unfold transposes must route each (time, batch) pair
    to the same queries as the tiled form."""
    model, params, x, times = tiny_setup
    x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
    want = model.apply(params, x2, times)
    model_dd = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                         stagec_dedup=True)
    got = model_dd.apply(params, x2, times)
    assert float(jnp.max(jnp.abs(got - want))) == 0.0


def test_stagec_nearest_close(tiny_setup):
    """stagec_nearest swaps the wide feat component's 2x2 bilinear patch for
    a 1-index nearest gather — an approximation, not an identity: outputs
    must stay in the same range as the bilinear form on smooth inputs and
    share the parameter schema (same params apply)."""
    model, params, x, times = tiny_setup
    want = model.apply(params, x, times)
    model_nn = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                         stagec_nearest=True)
    got = model_nn.apply(params, x, times)
    assert got.shape == want.shape and got.dtype == want.dtype
    assert bool(jnp.all(jnp.isfinite(got)))
    # nearest vs bilinear on a random tiny scene: bounded, not bit-equal
    d = float(jnp.max(jnp.abs(got - want)))
    assert 0.0 < d < 0.5, d


def test_stagec_dtype_fp8_close(tiny_setup):
    """stagec_dtype=fp8 stores the decoder's stage-B/C gather sources in
    float8_e4m3fn (half the gathered bytes vs bf16) with fp32 interpolation:
    quality lever, gated by tolerance rather than parity."""
    model, params, x, times = tiny_setup
    want = model.apply(params, x, times)
    model8 = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                       stagec_dtype=jnp.float8_e4m3fn)
    got = model8.apply(params, x, times)
    assert got.dtype == want.dtype
    assert bool(jnp.all(jnp.isfinite(got)))
    # e4m3 has ~2 mantissa-bit-equivalent relative error (~6%); decoder
    # outputs are [0,1]-ish so an absolute bound of 2e-1 catches wiring
    # bugs (wrong source, missing rescale) without gating quality here —
    # the trained-checkpoint eval A/B is the real gate.
    assert float(jnp.max(jnp.abs(got - want))) < 2e-1


def test_lstm_fuse_dirs_equal(tiny_setup):
    # fused (one 2B scan over the shared-weight BiLSTM) vs the two-pass
    # reference form: per-sample math is identical — exact to fp32 noise
    model, params, x, times = tiny_setup
    want = model.apply(params, x, times)  # default: lstm_fuse_dirs=True
    two_pass = LunaTokis(nf=16, front_RBs=1, back_RBs=1, groups=2,
                         lstm_fuse_dirs=False)
    got = two_pass.apply(params, x, times)  # same params, same schema
    assert float(jnp.max(jnp.abs(got - want))) < 1e-6
