"""Multi-chip sharding on the virtual 8-device CPU mesh — coverage the
CUDA-only reference never had (SURVEY.md §4d)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full models: minutes on the 1-core CI host

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stif_tpu.models import LunaTokis
from stif_tpu.parallel import (
    batch_sharding,
    default_mesh,
    make_mesh,
    param_shardings,
    replicated,
)

TINY = dict(nf=8, groups=2, front_RBs=1, back_RBs=1)


@pytest.fixture(scope="module")
def setup():
    model = LunaTokis(**TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 2, 8, 8, 3)).astype(np.float32))
    times = jnp.asarray([0.0, 0.5])
    params = model.init(jax.random.PRNGKey(0), x[:1], times,
                        method=model.full_init)
    return model, params, x, times


def test_mesh_construction():
    mesh = make_mesh({"data": 4, "model": 2})
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh2 = default_mesh(model_parallel=2)
    assert mesh2.shape["model"] == 2


def test_data_parallel_inference_matches_single(setup):
    """Batch sharded over 8 devices == single-device result."""
    model, params, x, times = setup
    want = np.asarray(model.apply(params, x, times))

    mesh = make_mesh({"data": 8})
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    ps = jax.device_put(params, replicated(mesh))
    fwd = jax.jit(
        lambda p, x, t: model.apply(p, x, t),
        out_shardings=NamedSharding(mesh, P(None, "data")),
    )
    got = np.asarray(fwd(ps, xs, times))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tensor_parallel_params_match(setup):
    """Decoder kernels sharded over the model axis give identical outputs."""
    model, params, x, times = setup
    want = np.asarray(model.apply(params, x[:2], times))

    mesh = make_mesh({"data": 4, "model": 2})
    shard_tree = param_shardings(mesh, params, tensor_parallel=True)
    sharded = [
        s for s in jax.tree.leaves(shard_tree)
        if s.spec != P()
    ]
    assert sharded, "expected some tensor-parallel-sharded kernels"
    ps = jax.device_put(params, shard_tree)
    xs = jax.device_put(x[:2], NamedSharding(mesh, P()))
    got = np.asarray(jax.jit(lambda p, x, t: model.apply(p, x, t))(
        ps, xs, times))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_query_sharded_decode(setup):
    """Sharding the folded (time*batch) axis of the decoder — the TPU
    replacement for the reference's sequential query chunking."""
    model, params, x, times8 = setup
    times = jnp.linspace(0.0, 1.0, 8)
    feat = model.apply(params, x[:1], method=model.gen_feat)
    want = np.asarray(model.apply(params, feat, x[:1], times,
                                  method=model.decode))

    mesh = make_mesh({"data": 8})
    ps = jax.device_put(params, replicated(mesh))

    def decode(p, f, xx, t):
        return model.apply(p, f, xx, t, method=model.decode)

    # nt*B = 8 folds over the 8 devices via the output sharding
    fwd = jax.jit(decode, out_shardings=NamedSharding(mesh, P("data")))
    got = np.asarray(fwd(ps, feat, x[:1], times))
    np.testing.assert_allclose(got, want, atol=1e-5)
