"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_dryrun_multichip_full_train_step():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_sharded_batch_gradients_match_single_device():
    """DP over the mesh must give the same loss/grads as one device."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mindtheedge_tpu.parallel.mesh import make_mesh, replicated

    def loss_fn(w, x):
        return jnp.mean((x @ w) ** 2)

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.rand(16, 4).astype(np.float32))
    x = jnp.asarray(rng.rand(8, 16).astype(np.float32))

    l0, g0 = jax.value_and_grad(loss_fn)(w, x)

    mesh = make_mesh()
    ws = jax.device_put(w, replicated(mesh))
    xs = jax.device_put(x, NamedSharding(mesh, P('data', None)))
    l1, g1 = jax.jit(jax.value_and_grad(loss_fn))(ws, xs)

    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5)
