"""Sync-BN divergence: pin its training semantics and restore+eval blast radius.

Under DP the SAN ladder's MaskedBatchNorm running stats are pmean'd across
replicas each step (sync-BN, ``parallel/mesh.py`` base_step) — a documented
divergence from the reference's Horovod, which keeps BN running stats
per-replica (broadcast only at init, ``horovod_trainer.py:53-55``).  These
tests pin:

1. the training semantics: one 8-device DP step leaves batch_stats equal to
   the MEAN of the 8 per-shard oracle steps' stats (and replica-identical);
2. the restore contract: a checkpoint carrying per-replica-style stats (e.g.
   ported from a torch run's rank-0 state) round-trips bit-exact and eval
   consumes the restored stats VERBATIM — identical output single-device and
   under the 8-device DP mesh (no resync/mutation at restore), so a
   torch-trained checkpoint reproduces exactly the torch rank-0 eval;
3. the blast radius is real: eval output actually moves when the stats move
   (the divergence is confined to eval-mode SAN BN, nothing else).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_dp_trainer import _slim_edge_cfg, _edge_batch

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason='needs 8 virtual devices')]


def _setup(rng_seed=0, b=24, h=64, w=64):
    from mindtheedge_tpu.models.tasks import build_task
    cfg = _slim_edge_cfg()
    task = build_task(cfg)
    rng = np.random.RandomState(rng_seed)
    batch = _edge_batch(rng, b, h, w)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(task.init)(key, batch)
    return task, batch, key, variables


def test_dp_batch_stats_are_synced_mean_of_replicas():
    import optax
    from mindtheedge_tpu.training.train_step import (
        make_train_step, create_train_state)
    from mindtheedge_tpu.parallel.mesh import make_mesh, make_dp_train_step

    task, batch, key, variables = _setup()
    n_dev, per_dev = 8, 3
    optimizer = optax.sgd(0.01)
    state0 = create_train_state(task, optimizer, key, batch,
                                variables=variables)
    assert jax.tree_util.tree_leaves(state0.batch_stats), \
        'task must carry SAN batch stats for this test to bite'

    plain = jax.jit(make_train_step(task, optimizer))
    shard_stats = []
    for i in range(n_dev):
        sub = {k: v[i * per_dev:(i + 1) * per_dev] for k, v in batch.items()}
        s_i, _ = plain(state0, sub, key)
        shard_stats.append(
            jax.tree_util.tree_map(np.asarray, s_i.batch_stats))

    mesh = make_mesh(jax.devices()[:n_dev])
    dp_step = make_dp_train_step(task, optimizer, mesh)
    s_dp, _ = dp_step(state0, batch, key)

    mean_stats = jax.tree_util.tree_map(
        lambda *xs: np.mean(np.stack(xs), axis=0), *shard_stats)
    flat_dp = jax.tree_util.tree_flatten_with_path(s_dp.batch_stats)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(mean_stats)[0]
    for (path, got), (_, want) in zip(flat_dp, flat_ref):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def _perturb(stats, seed=7):
    """Per-replica-style stats: arbitrary (but valid) running mean/var."""
    rng = np.random.RandomState(seed)

    def f(x):
        # positive multiplicative jitter + small shift keeps var leaves valid
        x = np.asarray(x)
        jitter = 1.0 + 0.1 * np.abs(rng.randn(*x.shape))
        return (x * jitter + 0.02).astype(x.dtype)
    return jax.tree_util.tree_map(f, stats)


def test_per_replica_stats_checkpoint_restore_eval_parity(tmp_path):
    import optax
    from mindtheedge_tpu.training.train_step import create_train_state
    from mindtheedge_tpu.training.checkpoint import (
        save_checkpoint, load_checkpoint, restore_params)
    from mindtheedge_tpu.parallel.mesh import (
        make_mesh, replicated, shard_batch)

    task, batch, key, variables = _setup()
    optimizer = optax.sgd(0.01)
    state = create_train_state(task, optimizer, key, batch,
                               variables=variables)
    # simulate a torch rank-0 per-replica-stats checkpoint
    torch_style = _perturb(jax.tree_util.tree_map(np.asarray,
                                                  state.batch_stats))
    state = state.replace(batch_stats=jax.tree_util.tree_map(
        jnp.asarray, torch_style))

    path = save_checkpoint(str(tmp_path / 'per_replica.ckpt'),
                           {'dummy': 1}, state)
    ckpt = load_checkpoint(path)
    fresh = create_train_state(task, optimizer, key, batch,
                               variables=variables)
    restored_bs, n_loaded, n_total = restore_params(
        ckpt['batch_stats'], fresh.batch_stats)
    assert n_loaded == n_total   # every stat restored

    # bit-exact round trip — restore does not touch the stats
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(restored_bs)[0],
            jax.tree_util.tree_flatten_with_path(torch_style)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(p1))

    state_r = fresh.replace(batch_stats=jax.tree_util.tree_map(
        jnp.asarray, restored_bs))

    from mindtheedge_tpu.training.state import variables_from_state
    infer = jax.jit(task.infer)
    out_single = infer(variables_from_state(state_r), batch)
    pred_single = np.asarray(out_single['inv_depths'][0])

    # eval really consumes the running stats: synced-vs-per-replica differs
    out_synced = infer(variables_from_state(fresh), batch)
    assert np.abs(pred_single
                  - np.asarray(out_synced['inv_depths'][0])).max() > 1e-7

    # DP-mesh eval of the same restored state is identical to single-device
    mesh = make_mesh(jax.devices()[:8])
    state_rep = jax.device_put(state_r, replicated(mesh))
    out_dp = infer(variables_from_state(state_rep),
                   shard_batch(batch, mesh))
    np.testing.assert_allclose(np.asarray(out_dp['inv_depths'][0]),
                               pred_single, rtol=1e-5, atol=1e-6)
