import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.config import get_cfg_defaults, prepare_config
from mindtheedge_tpu.models.tasks import build_task
from mindtheedge_tpu.training.optimizer import build_optimizer
from mindtheedge_tpu.training.train_step import make_train_step, create_train_state

H, W, B = 32, 64, 2


def make_batch(rng, with_lidar=True, multiscale_edges=True):
    batch = {
        'rgb': jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        'depth': jnp.asarray((rng.rand(B, H, W, 1) * 80 *
                              (rng.rand(B, H, W, 1) > 0.9)).astype(np.float32)),
        'edge': jnp.asarray((rng.rand(B, H, W, 1) > 0.95).astype(np.float32)),
        'normal': jnp.asarray(((rng.rand(B, H, W, 1) * 2 - 1) * np.pi).astype(np.float32)),
    }
    if with_lidar:
        lidar = rng.rand(B, H, W, 1).astype(np.float32) * 80
        lidar[rng.rand(B, H, W, 1) < 0.95] = 0
        batch['input_depth'] = jnp.asarray(lidar)
    if multiscale_edges:
        for s in range(1, 4):
            hs, ws = H // 2 ** s, W // 2 ** s
            batch[f'edge_{s}'] = jnp.asarray(
                (rng.rand(B, hs, ws, 1) > 0.95).astype(np.float32))
            batch[f'normal_{s}'] = jnp.asarray(
                ((rng.rand(B, hs, ws, 1) * 2 - 1) * np.pi).astype(np.float32))
    return batch


def semisup_edge_config():
    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupEdgeModel'
    cfg.model.depth_net.name = 'PackNetSAN01'
    cfg.model.depth_net.version = '1A'
    cfg.model.loss.supervised_method = 'sparse-silog'
    cfg.model.loss.supervised_num_scales = 1
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.model.loss.edges_depth_edge_loss_all_scales = True
    cfg.model.loss.upsample_depth_maps = False
    cfg.edges.train_depth_edges = True
    cfg.edges.depth_edges_loss_weight = 10.0
    return prepare_config(cfg)


@pytest.mark.slow
def test_semisup_edge_train_step_runs_and_updates():
    cfg = semisup_edge_config()
    task = build_task(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)

    optimizer = build_optimizer(cfg, {}, steps_per_epoch=10)
    key = jax.random.PRNGKey(0)
    state = create_train_state(task, _opt_for(cfg, task, key, batch), key, batch)
    optimizer = _opt_for(cfg, task, key, batch)

    step_fn = jax.jit(make_train_step(task, optimizer))
    m0 = None
    for i in range(2):
        state, metrics = step_fn(state, batch, key)
        assert np.isfinite(float(metrics['loss'])), metrics
        if m0 is None:
            m0 = float(metrics['loss'])
    assert int(state.step) == 2
    assert 'edge_loss' in metrics and 'supervised_loss' in metrics
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf0)).all()


def _opt_for(cfg, task, key, batch):
    variables = jax.jit(task.init)(key, batch)
    from mindtheedge_tpu.training.state import split_variables
    params, _ = split_variables(variables)
    return build_optimizer(cfg, params, steps_per_epoch=10)


@pytest.mark.slow
def test_edge_estimation_task_train_step():
    cfg = get_cfg_defaults()
    cfg.model.name = 'EdgeEstimationLIDARModel'
    cfg.model.depth_net.name = 'PackNetSAN01'
    cfg.model.depth_net.version = '1A'
    cfg.model.loss.edges_depth_edge_loss_all_scales = True
    cfg.model.loss.upsample_depth_maps = False
    cfg = prepare_config(cfg)
    task = build_task(cfg)

    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(1)
    optimizer = _opt_for(cfg, task, key, batch)
    state = create_train_state(task, optimizer, key, batch)
    step_fn = jax.jit(make_train_step(task, optimizer))
    state, metrics = step_fn(state, batch, key)
    assert np.isfinite(float(metrics['loss']))
    assert 'edge_lidar_loss' in metrics

    # eval: all scales halved into [0,1] probabilities
    from mindtheedge_tpu.training.state import variables_from_state
    out = jax.jit(lambda v, b: task.infer(v, b))(variables_from_state(state), batch)
    p0 = np.asarray(out['inv_depths'][0])
    assert p0.max() <= 1.0 + 1e-5


def test_steplr_schedule():
    from mindtheedge_tpu.training.optimizer import steplr
    sch = steplr(1e-4, step_size=30, gamma=0.5, steps_per_epoch=100)
    assert sch(0) == pytest.approx(1e-4)
    assert sch(29 * 100) == pytest.approx(1e-4)
    assert sch(30 * 100) == pytest.approx(5e-5)
    assert sch(60 * 100) == pytest.approx(2.5e-5)
