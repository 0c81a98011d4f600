"""Spatial (H-axis) sharding with halo exchange, on the virtual CPU mesh.

The HBM escape hatch for high-res inference (SURVEY §5: DDAD at ~1216x1936):
rgb enters H-sharded over a ``Mesh(('space',))``, every conv halo-exchanges
k//2 rows via ppermute, GroupNorm statistics psum to the exact global
moments.  These tests pin exactness against the unsharded model with the
SAME parameters — any halo/boundary/stat error shows up as a numeric diff.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.parallel import spatial

pytestmark = pytest.mark.slow


def test_max_space_devices():
    assert spatial.max_space_devices(384) == 4    # 96,48,24,12,6 all even
    assert spatial.max_space_devices(1216) == 2   # 608,...,38 even; /4 hits 19
    assert spatial.max_space_devices(128) == 4
    assert spatial.max_space_devices(64) == 2


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_halo_exchange_matches_pad():
    """halo_exchange of a sharded tensor == zero-padded global slices."""
    from jax.sharding import PartitionSpec as P
    mesh = spatial.make_space_mesh(4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 8, 4).astype(np.float32))

    for p in (1, 2, 3):
        def local_view(xs):
            return spatial.halo_exchange_h(xs, p, 'space')

        halod = jax.jit(jax.shard_map(
            local_view, mesh=mesh, in_specs=P(None, 'space'),
            out_specs=P(None, 'space'), check_vma=False))(x)
        # device i's extended shard == rows [8i-p, 8i+8+p) of the zero-pad
        xp = np.pad(np.asarray(x), ((0, 0), (p, p), (0, 0), (0, 0)))
        got = np.asarray(halod).reshape(2, 4, 8 + 2 * p, 8, 4)
        for i in range(4):
            np.testing.assert_array_equal(
                got[:, i], xp[:, i * 8:i * 8 + 8 + 2 * p])


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_spatial_forward_matches_unsharded():
    """Full PackNet forward, H-sharded over 4 devices == unsharded, same
    params (the param tree is attribute-independent by construction)."""
    from mindtheedge_tpu.models.packnet import PackNetSAN

    mesh = spatial.make_space_mesh(4)
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))

    ref = PackNetSAN(version='1A')
    shd = PackNetSAN(version='1A', spatial_axis='space')
    key = jax.random.PRNGKey(0)
    # init through the unsharded model: spatial_axis only adds collectives
    # (halo exchange, stat psum), never parameters, so the tree is shared —
    # which is exactly what lets existing checkpoints run sharded unchanged
    v = jax.jit(lambda k, r: ref.init(k, r, None, train=False))(key, rgb)

    out_ref = jax.jit(
        lambda v, r: ref.apply(v, r, None, train=False))(v, rgb)

    fn = spatial.make_spatial_infer(shd, mesh)
    out_shd = fn(v, spatial.shard_spatial(rgb, mesh))

    for s, (a, b) in enumerate(zip(out_ref['inv_depths'], out_shd)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f'scale {s}')


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_spatial_composes_with_data_parallel():
    """2-D mesh (data x space): batch and height shard independently."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mindtheedge_tpu.models.packnet import PackNetSlim01

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ('data', 'space'))
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.rand(2, 128, 96, 3).astype(np.float32))

    ref = PackNetSlim01(version='1A')
    shd = PackNetSlim01(version='1A', spatial_axis='space')
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda k, r: ref.init(k, r, False))(key, rgb)
    out_ref = jax.jit(lambda v, r: ref.apply(v, r, False))(v, rgb)

    def fwd(variables, r):
        return shd.apply(variables, r, False)['inv_depths']

    act = P('data', 'space')
    fn = jax.jit(jax.shard_map(fwd, mesh=mesh, in_specs=(P(), act),
                               out_specs=[act] * 4, check_vma=False))
    rgb_s = jax.device_put(rgb, NamedSharding(mesh, act))
    out_shd = fn(v, rgb_s)
    for s, (a, b) in enumerate(zip(out_ref['inv_depths'], out_shd)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f'scale {s}')


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_spatial_san_branch_matches_unsharded():
    """PackNet-SAN with the lidar branch, H-sharded == unsharded (eval mode:
    masked pools halo-exchange x and mask separately; BN uses running
    stats)."""
    from mindtheedge_tpu.models.packnet import PackNetSAN

    mesh = spatial.make_space_mesh(4)
    rng = np.random.RandomState(3)
    rgb = jnp.asarray(rng.rand(1, 128, 96, 3).astype(np.float32))
    lidar = (rng.rand(1, 128, 96, 1) * 80 *
             (rng.rand(1, 128, 96, 1) > 0.95)).astype(np.float32)
    lidar = jnp.asarray(lidar)

    ref = PackNetSAN(version='1A')
    shd = PackNetSAN(version='1A', spatial_axis='space')
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda k, r, d: ref.init(k, r, d, train=False))(key, rgb, lidar)

    out_ref = jax.jit(
        lambda v, r, d: ref.apply(v, r, d, train=False))(v, rgb, lidar)

    fn = spatial.make_spatial_infer(shd, mesh, with_depth=True)
    out_shd = fn(v, spatial.shard_spatial(rgb, mesh),
                 spatial.shard_spatial(lidar, mesh))
    for s, (a, b) in enumerate(zip(out_ref['inv_depths'], out_shd)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f'scale {s}')


def _train_step_parity(mesh, n_data=1):
    """ONE sharded SemiSupEdge train step == the single-device step: same
    loss, same metrics, same updated params (float tolerance).

    With a data axis (``n_data > 1``) the expected semantics are the
    reference's Horovod DP (``horovod_trainer.py:53-55``): each replica
    pools its sparse losses over ITS batch shard, gradients average across
    replicas — so the oracle is built from per-shard single-device steps,
    not one full-batch step (pooled losses are not linear in the batch
    split).

    Exercises the full gather-the-pyramid path: halo-exchanged encoder +
    SAN branch (psum'd masked-BN stats), all_gathered inv-depth pyramid,
    unmodified loss stack, pmean'd gradients, replicated update.

    SGD, not Adam, for the param compare: with SGD the one-step delta is
    lr * grad, so comparing params IS comparing gradients at rtol.  Adam's
    first step is ~lr * sign(g): leaves with near-zero gradients (fp32
    reduction-order noise flips their sign between the two schedules) land
    at +-lr — a sign test on noise, not an equivalence test.
    """
    import optax
    from mindtheedge_tpu.config import get_cfg_defaults, prepare_config
    from mindtheedge_tpu.models.tasks import build_task
    from mindtheedge_tpu.training.train_step import (
        make_train_step, create_train_state)
    from mindtheedge_tpu.training.state import split_variables

    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupEdgeModel'
    cfg.model.depth_net.name = 'PackNetSAN01'
    cfg.model.depth_net.version = '1A'
    cfg.model.depth_net.channels = (16, 16, 16, 16, 16, 16)
    cfg.model.loss.supervised_method = 'sparse-silog'
    cfg.model.loss.supervised_num_scales = 1
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.model.loss.edges_depth_edge_loss_all_scales = True
    cfg.edges.train_depth_edges = True
    cfg.model.loss.upsample_depth_maps = False
    cfg.model.loss.flip_lr_prob = 0.0   # keep the compare deterministic
    cfg = prepare_config(cfg)
    task = build_task(cfg)

    B, H, W = 2, 128, 64
    rng = np.random.RandomState(0)
    batch = {
        'rgb': rng.rand(B, H, W, 3).astype(np.float32),
        'depth': (rng.rand(B, H, W, 1) * 80 *
                  (rng.rand(B, H, W, 1) > 0.9)).astype(np.float32),
        'edge': (rng.rand(B, H, W, 1) > 0.95).astype(np.float32),
        'normal': ((rng.rand(B, H, W, 1) * 2 - 1) * np.pi).astype(np.float32),
        'input_depth': (rng.rand(B, H, W, 1) * 80 *
                        (rng.rand(B, H, W, 1) > 0.95)).astype(np.float32),
    }
    for s in range(1, 4):
        hs, ws = H >> s, W >> s
        batch[f'edge_{s}'] = (rng.rand(B, hs, ws, 1) > 0.95).astype(np.float32)
        batch[f'normal_{s}'] = ((rng.rand(B, hs, ws, 1) * 2 - 1)
                                * np.pi).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    key = jax.random.PRNGKey(0)
    variables = jax.jit(task.init)(key, batch)
    params, _ = split_variables(variables)
    lr = 0.01
    optimizer = optax.sgd(lr)
    state0 = create_train_state(task, optimizer, key, batch,
                                variables=variables)

    plain = jax.jit(make_train_step(task, optimizer))
    # oracle: grads per leaf + loss, from full-batch (n_data=1) or averaged
    # per-shard (Horovod-DP semantics) single-device steps
    ref_grads, ref_losses = [], []
    shard = B // n_data
    for i in range(n_data):
        sub = ({k: v[i * shard:(i + 1) * shard] for k, v in batch.items()}
               if n_data > 1 else batch)
        s_i, m_i = plain(state0, sub, key)
        flat_i, _ = jax.tree_util.tree_flatten_with_path(s_i.params)
        ref_grads.append(flat_i)
        ref_losses.append(float(m_i['loss']))
    ref_loss = float(np.mean(ref_losses))

    sstep = spatial.make_spatial_train_step(task, optimizer, mesh)
    state0b = create_train_state(task, optimizer, key, batch,
                                 variables=variables)
    s_shd, m_shd = sstep(state0b, batch, key)

    np.testing.assert_allclose(float(m_shd['loss']), ref_loss, rtol=1e-5)
    # delta = lr * grad leaf-by-leaf; atol bounds the near-zero-grad leaves
    flat_b, _ = jax.tree_util.tree_flatten_with_path(s_shd.params)
    flat_0, _ = jax.tree_util.tree_flatten_with_path(state0.params)
    sq_sum = 0.0
    for j, ((pa, b), (_, p0)) in enumerate(zip(flat_b, flat_0)):
        ga = np.mean([(np.asarray(p0) - np.asarray(fg[j][1])) / lr
                      for fg in ref_grads], axis=0)
        gb = (np.asarray(p0) - np.asarray(b)) / lr
        sq_sum += float((ga.astype(np.float64) ** 2).sum())
        np.testing.assert_allclose(
            gb, ga, rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(pa))
    np.testing.assert_allclose(float(m_shd['grad_norm']),
                               np.sqrt(sq_sum), rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_spatial_train_step_matches_unsharded():
    _train_step_parity(spatial.make_space_mesh(4))


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_dp_space_train_step_matches_unsharded():
    """DP x spatial composition on a 2x2 mesh: batch sharded over ``data``,
    H over ``space``; grads pmean over both axes; metrics pmean over data.
    Oracle = averaged per-shard single-device steps (Horovod-DP semantics)."""
    _train_step_parity(spatial.make_dp_space_mesh(2, 2), n_data=2)
