"""Horovod-honest data parallelism (VERDICT r2 #2).

The reference's DP contract is per-replica batch: Horovod runs N processes
each with ``batch_size`` samples and allreduce-averages gradients
(``horovod_trainer.py:53-55``; ``DistributedSampler`` per rank,
``model_wrapper.py:761-793``; ``datasets.train.batch_size`` is per-GPU,
``configs/default_config.py:176``).  These tests run the SHIPPED paper
config's batch semantics — 24 samples/step over 8 devices, batch 3 each —
and assert (a) gradient equivalence to the averaged per-shard oracle and
(b) that ``Experiment.fit`` engages the mesh and scales the loader batch.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def _slim_edge_cfg():
    from mindtheedge_tpu.config import get_cfg_defaults, prepare_config
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
    cfg.model.loss.flip_lr_prob = 0.0   # deterministic compare
    return prepare_config(cfg)


def _edge_batch(rng, b, h, w):
    batch = {
        'rgb': rng.rand(b, h, w, 3).astype(np.float32),
        'depth': (rng.rand(b, h, w, 1) * 80 *
                  (rng.rand(b, h, w, 1) > 0.9)).astype(np.float32),
        'edge': (rng.rand(b, h, w, 1) > 0.95).astype(np.float32),
        'normal': ((rng.rand(b, h, w, 1) * 2 - 1) * np.pi).astype(np.float32),
        'input_depth': (rng.rand(b, h, w, 1) * 80 *
                        (rng.rand(b, h, w, 1) > 0.95)).astype(np.float32),
    }
    for s in range(1, 4):
        hs, ws = h >> s, w >> s
        batch[f'edge_{s}'] = (rng.rand(b, hs, ws, 1) > 0.95).astype(np.float32)
        batch[f'normal_{s}'] = ((rng.rand(b, hs, ws, 1) * 2 - 1)
                                * np.pi).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_dp_step_matches_horovod_oracle():
    """One 8-device DP step at the paper's batch semantics (3/device, 24
    global) equals the mean of 8 per-shard single-device steps.

    SGD so the one-step param delta IS lr * grad (see the rationale in
    tests/test_spatial_sharding.py): comparing params compares gradients."""
    import optax
    from mindtheedge_tpu.models.tasks import build_task
    from mindtheedge_tpu.training.train_step import (
        make_train_step, create_train_state)
    from mindtheedge_tpu.parallel.mesh import make_mesh, make_dp_train_step

    cfg = _slim_edge_cfg()
    task = build_task(cfg)

    n_dev, per_dev = 8, 3
    B, H, W = n_dev * per_dev, 64, 64
    rng = np.random.RandomState(0)
    batch = _edge_batch(rng, B, H, W)

    key = jax.random.PRNGKey(0)
    variables = jax.jit(task.init)(key, batch)
    lr = 0.01
    optimizer = optax.sgd(lr)
    state0 = create_train_state(task, optimizer, key, batch,
                                variables=variables)

    # Horovod oracle: per-replica steps on each 3-sample shard, grads averaged
    plain = jax.jit(make_train_step(task, optimizer))
    ref_grads, ref_losses = [], []
    for i in range(n_dev):
        sub = {k: v[i * per_dev:(i + 1) * per_dev] for k, v in batch.items()}
        s_i, m_i = plain(state0, sub, key)
        ref_grads.append(jax.tree_util.tree_flatten_with_path(s_i.params)[0])
        ref_losses.append(float(m_i['loss']))

    mesh = make_mesh(jax.devices()[:n_dev])
    dp_step = make_dp_train_step(task, optimizer, mesh)
    state0b = create_train_state(task, optimizer, key, batch,
                                 variables=variables)
    # per-step sample count: the global batch really is 24
    assert batch['rgb'].shape[0] == 24
    s_dp, m_dp = dp_step(state0b, batch, key)

    np.testing.assert_allclose(float(m_dp['loss']), np.mean(ref_losses),
                               rtol=1e-5)
    flat_dp, _ = jax.tree_util.tree_flatten_with_path(s_dp.params)
    flat_0, _ = jax.tree_util.tree_flatten_with_path(state0.params)
    for j, ((path, p_dp), (_, p0)) in enumerate(zip(flat_dp, flat_0)):
        g_ref = np.mean([(np.asarray(p0) - np.asarray(fg[j][1])) / lr
                         for fg in ref_grads], axis=0)
        g_dp = (np.asarray(p0) - np.asarray(p_dp)) / lr
        np.testing.assert_allclose(g_dp, g_ref, rtol=1e-3, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_experiment_fit_engages_paper_batch_semantics(tmp_path):
    """Experiment.fit on the shipped paper batch (3) with 8 devices trains
    24 samples/step — per-device batch scaling, not global-batch sharding."""
    from tests.make_synthetic_dataset import make_dataset
    from mindtheedge_tpu.training.experiment import Experiment

    root = str(tmp_path / 'synth')
    make_dataset(root, n=24, h=64, w=96)

    cfg = _slim_edge_cfg()
    cfg.arch.max_epochs = 1
    cfg.edges.train_depth_edges = True
    cfg.datasets.augmentation.image_shape = (64, 96)
    cfg.datasets.train.batch_size = 3           # the paper config's batch
    cfg.datasets.train.num_workers = 2
    cfg.datasets.train.back_context = 0
    cfg.datasets.train.forward_context = 0
    cfg.datasets.train.dataset = ['GTA']
    cfg.datasets.train.path = ['']
    cfg.datasets.train.split = [os.path.join(root, 'split.txt')]
    cfg.datasets.train.depth_type = ['groundtruth']
    cfg.datasets.train.input_depth_type = ['velodyne']
    cfg.checkpoint.filepath = str(tmp_path / 'ckpts')
    cfg.checkpoint.save_top_k = -1

    exp = Experiment(cfg)
    assert exp.n_dp == 8
    assert exp.per_device_batch == 3
    assert exp.train_loader.batch_size == 24    # global = 3 x 8
    state = exp.fit()
    assert exp.mesh is not None and len(exp.mesh.devices.ravel()) == 8
    # 24 samples / global batch 24 -> exactly one step for the epoch
    assert int(state.step) == 1
