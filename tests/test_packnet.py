import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.models.packnet import PackNetSAN


@pytest.fixture(scope='module')
def small_inputs():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    depth = rng.rand(1, 64, 96, 1).astype(np.float32)
    depth[depth < 0.95] = 0.0   # sparse lidar-like input
    return rgb, jnp.asarray(depth)


@pytest.mark.slow
def test_forward_eval_rgb_only(small_inputs):
    rgb, _ = small_inputs
    model = PackNetSAN()
    variables = model.init(jax.random.PRNGKey(0), rgb, train=False)
    out = model.apply(variables, rgb, train=False)
    assert set(out) == {'inv_depths'}
    assert len(out['inv_depths']) == 4
    shapes = [tuple(d.shape) for d in out['inv_depths']]
    assert shapes == [(1, 64, 96, 1), (1, 32, 48, 1), (1, 16, 24, 1), (1, 8, 12, 1)]
    d0 = np.asarray(out['inv_depths'][0])
    assert (d0 > 0).all() and (d0 <= 2.0).all()   # sigmoid / 0.5


@pytest.mark.slow
def test_forward_train_rgbd(small_inputs):
    rgb, depth = small_inputs
    model = PackNetSAN()
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=True)
    out, new_vars = model.apply(
        variables, rgb, depth, train=True,
        rngs={'dropout': jax.random.PRNGKey(1)}, mutable=['batch_stats'])
    assert {'inv_depths', 'inv_depths_rgbd', 'depth_loss'} <= set(out)
    assert np.isfinite(float(out['depth_loss']))
    assert 'batch_stats' in new_vars


@pytest.mark.slow
def test_forward_eval_with_lidar(small_inputs):
    rgb, depth = small_inputs
    model = PackNetSAN()
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    out = model.apply(variables, rgb, depth, train=False)
    assert len(out['inv_depths']) == 4
    assert np.isfinite(np.asarray(out['inv_depths'][0])).all()
