"""Spatially-sharded SELF-SUPERVISED training (VERDICT r3 #6).

The round-3 spatial train step rejected ``supervised_loss_weight < 1``
configs; now the pose net runs replicated on the all_gathered full-H rgb
(pose is tiny), the photometric warp consumes the gathered pyramid +
replicated context originals, and depth-net compute stays H-sharded.  This
test trains ONE SemiSup step (self-sup photometric + supervised mix, the
reference ``SemiSupModel.py:73-113`` composition over
``SelfSupModel.py:64-98``) on a 2-device space mesh and asserts loss-andgrad
equality with the unsharded oracle step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.parallel import spatial

pytestmark = pytest.mark.slow


def _selfsup_cfg(weight=0.5):
    from mindtheedge_tpu.config import get_cfg_defaults, prepare_config
    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupModel'
    cfg.model.depth_net.name = 'PackNetSlim01'
    cfg.model.depth_net.version = '1A'
    cfg.model.depth_net.channels = (16, 16, 16, 16, 16, 16)
    cfg.model.pose_net.name = 'PoseNet'
    cfg.model.loss.supervised_method = 'sparse-silog'
    cfg.model.loss.supervised_num_scales = 1
    cfg.model.loss.supervised_loss_weight = weight
    cfg.model.loss.num_scales = 4
    cfg.model.loss.upsample_depth_maps = False
    cfg.model.loss.flip_lr_prob = 0.0     # deterministic compare
    return prepare_config(cfg)


def _selfsup_batch(rng, b, h, w):
    def img():
        return rng.rand(b, h, w, 3).astype(np.float32)

    rgb = img()
    ctx = [img(), img()]
    K = np.array([[[w / 2., 0., w / 2.],
                   [0., h / 2., h / 2.],
                   [0., 0., 1.]]] * b, np.float32)
    return {
        'rgb': jnp.asarray(rgb),
        'rgb_original': jnp.asarray(rgb),
        'rgb_context': [jnp.asarray(c) for c in ctx],
        'rgb_context_original': [jnp.asarray(c) for c in ctx],
        'intrinsics': jnp.asarray(K),
        'depth': jnp.asarray((rng.rand(b, h, w, 1) * 80 *
                              (rng.rand(b, h, w, 1) > 0.9)).astype(np.float32)),
    }


@pytest.mark.skipif(len(jax.devices()) < 2, reason='needs 2 virtual devices')
def test_spatial_selfsup_step_matches_unsharded():
    import optax
    from mindtheedge_tpu.models.tasks import build_task
    from mindtheedge_tpu.training.train_step import (
        make_train_step, create_train_state)

    cfg = _selfsup_cfg(weight=0.5)
    task = build_task(cfg)
    assert task.pose_net is not None   # self-sup path really engaged

    rng = np.random.RandomState(0)
    batch = _selfsup_batch(rng, 1, 64, 64)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(task.init)(key, batch)
    lr = 0.01
    optimizer = optax.sgd(lr)

    state0 = create_train_state(task, optimizer, key, batch,
                                variables=variables)
    plain = jax.jit(make_train_step(task, optimizer))
    s_ref, m_ref = plain(state0, batch, key)
    assert np.isfinite(float(m_ref['loss']))
    assert float(m_ref.get('photometric_loss', m_ref['loss'])) != 0.0

    mesh = spatial.make_space_mesh(2)
    task_sp = build_task(cfg)
    sstep = spatial.make_spatial_train_step(task_sp, optimizer, mesh)
    state0b = create_train_state(task_sp, optimizer, key, batch,
                                 variables=variables)
    s_sp, m_sp = sstep(state0b, batch, key)

    np.testing.assert_allclose(float(m_sp['loss']), float(m_ref['loss']),
                               rtol=1e-5)
    flat_sp = jax.tree_util.tree_flatten_with_path(s_sp.params)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(s_ref.params)[0]
    for (path, p_sp), (_, p_ref) in zip(flat_sp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(p_sp), np.asarray(p_ref), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
    # pose params must actually have moved (the self-sup path trained)
    pose_moved = any(
        np.abs(np.asarray(a[1]) - np.asarray(b[1])).max() > 0
        for a, b in zip(
            jax.tree_util.tree_flatten_with_path(s_ref.params['pose'])[0],
            jax.tree_util.tree_flatten_with_path(state0.params['pose'])[0]))
    assert pose_moved
