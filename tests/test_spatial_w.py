"""W-axis and 2-D (HxW) spatial sharding (VERDICT r3 #5).

H-only sharding caps DDAD-height images (1216 -> H/32 = 38) at n_space=2;
sharding W as well unlocks 4+ chips for high-res serving.  These tests pin
exactness of the W halo exchange and the sequential H-then-W corner
completion against the unsharded model with the SAME parameters, on the
virtual CPU mesh — including the SAN sparse ladder (masked pool + masked BN)
whose pool windows cross shard boundaries in both dims.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import PartitionSpec as P

from mindtheedge_tpu.parallel import spatial

pytestmark = pytest.mark.slow


def test_legal_space_grids():
    grids = spatial.legal_space_grids(384, 1280, limit=8)
    assert (2, 2) in grids and (4, 2) in grids and (1, 8) in grids
    assert all(384 % nh == 0 and 1280 % nw == 0 for nh, nw in grids)
    # DDAD ~1216x1936 rounds to x32 -> 1216x1920 (reference
    # transforms.py:75-82); H alone caps at 2, W unlocks 4+ chips
    ddad = spatial.legal_space_grids(1216, 1920, limit=8)
    assert spatial.max_space_devices(1216) == 2
    assert (2, 2) in ddad and any(nh * nw >= 8 for nh, nw in ddad), ddad


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_halo_exchange_w_matches_pad():
    """W halo exchange of a W-sharded tensor == zero-padded global slices."""
    mesh = spatial.make_space_mesh(4, axis_name='space_w')
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 32, 4).astype(np.float32))

    for p in (1, 2):
        def local_view(xs):
            return spatial.halo_exchange_h(xs, p, (None, 'space_w'))

        halod = jax.jit(jax.shard_map(
            local_view, mesh=mesh, in_specs=P(None, None, 'space_w'),
            out_specs=P(None, None, 'space_w'), check_vma=False))(x)
        xp = np.pad(np.asarray(x), ((0, 0), (0, 0), (p, p), (0, 0)))
        got = np.asarray(halod).reshape(2, 8, 4, 8 + 2 * p, 4)
        for i in range(4):
            np.testing.assert_array_equal(
                got[:, :, i], xp[:, :, i * 8:i * 8 + 8 + 2 * p])


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_w_only_forward_matches_unsharded():
    """Full PackNet forward, W-sharded over 4 devices == unsharded."""
    from mindtheedge_tpu.models.packnet import PackNetSlim01

    mesh = spatial.make_space_mesh(4, axis_name='space_w')
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.rand(1, 32, 128, 3).astype(np.float32))

    slim = (16,) * 6
    ref = PackNetSlim01(version='1A', channels=slim)
    shd = PackNetSlim01(version='1A', channels=slim,
                        spatial_axis=(None, 'space_w'))
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda k, r: ref.init(k, r, False))(key, rgb)
    out_ref = jax.jit(lambda v_, r: ref.apply(v_, r, False))(v, rgb)

    fn = spatial.make_spatial_infer(shd, mesh, axis_name=None,
                                    w_axis_name='space_w')
    out_shd = fn(v, spatial.shard_spatial(rgb, mesh, axis_name=None,
                                          w_axis_name='space_w'))
    for s, (a, b) in enumerate(zip(out_ref['inv_depths'], out_shd)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=f'scale {s}')


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_hw_forward_with_san_matches_unsharded():
    """PackNet-SAN (sparse lidar ladder engaged) on a 2x2 HxW mesh ==
    unsharded: exercises W halos through masked pool, masked BN psum over
    both axes, and the sequential corner completion."""
    from mindtheedge_tpu.models.packnet import PackNetSAN

    mesh = spatial.make_space_mesh_hw(2, 2)
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    lidar = rng.rand(1, 64, 128, 1).astype(np.float32) * 80.0
    lidar[rng.rand(1, 64, 128, 1) < 0.9] = 0.0
    lidar = jnp.asarray(lidar)

    slim = (16,) * 6
    ref = PackNetSAN(version='1A', channels=slim)
    shd = PackNetSAN(version='1A', channels=slim,
                     spatial_axis=('space', 'space_w'))
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda k, r, d: ref.init(k, r, d, train=False))(
        key, rgb, lidar)
    out_ref = jax.jit(
        lambda v_, r, d: ref.apply(v_, r, d, train=False))(v, rgb, lidar)

    fn = spatial.make_spatial_infer(shd, mesh, axis_name='space',
                                    with_depth=True, w_axis_name='space_w')
    out_shd = fn(v,
                 spatial.shard_spatial(rgb, mesh, w_axis_name='space_w'),
                 spatial.shard_spatial(lidar, mesh, w_axis_name='space_w'))
    for s, (a, b) in enumerate(zip(out_ref['inv_depths'], out_shd)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=f'scale {s}')
