"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.experimental
import jax.numpy as jnp
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
@pytest.mark.slow
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

def test_reduce_value_single_process_identity():
    """reduce_value is the identity when process_count()==1 (the no-op
    contract of reference horovod.py:32-50 without an MPI launch)."""
    from mindtheedge_tpu.utils.reduce import reduce_value
    assert reduce_value(3.5, average=True) == 3.5
    assert reduce_value(7, average=False) == 7


def test_reduce_value_multiprocess_semantics(monkeypatch):
    """Cross-process mean/sum semantics, with process_allgather stubbed the
    way a 4-host launch would see it (each host contributes its local value).
    """
    import mindtheedge_tpu.utils.reduce as R

    class FakeMHU:
        @staticmethod
        def process_allgather(x):
            v = np.asarray(x)
            return np.stack([v + i for i in range(4)])

    monkeypatch.setattr(jax, 'process_count', lambda: 4)
    monkeypatch.setattr(jax.experimental, 'multihost_utils', FakeMHU,
                        raising=False)
    import sys
    monkeypatch.setitem(sys.modules, 'jax.experimental.multihost_utils',
                        FakeMHU)
    assert R.reduce_value(10.0, average=True) == 11.5     # mean(10..13)
    assert R.reduce_value(10.0, average=False) == 46.0    # sum(10..13)


def test_maybe_initialize_distributed_no_op_single_host(monkeypatch):
    """Without cluster env markers the distributed entry is a strict no-op
    (must not touch the network or re-init the backend)."""
    from mindtheedge_tpu.parallel import distributed
    for var in ('JAX_COORDINATOR_ADDRESS', 'MTE_DISTRIBUTED',
                *distributed._CLUSTER_ENV_MARKERS):
        monkeypatch.delenv(var, raising=False)
    assert distributed.maybe_initialize_distributed() is False

    # single-worker TPU runtimes (this repo's relay injects
    # TPU_WORKER_HOSTNAMES=localhost) must stay single-process
    monkeypatch.setenv('TPU_WORKER_HOSTNAMES', 'localhost')
    assert distributed.maybe_initialize_distributed() is False
    monkeypatch.setenv('TPU_WORKER_HOSTNAMES', 'host-0,host-1')
    assert distributed._multi_worker_env() is True

    monkeypatch.setenv('MTE_DISTRIBUTED', '0')
    monkeypatch.setenv('SLURM_JOB_ID', '123')   # disable flag wins
    assert distributed.maybe_initialize_distributed() is False


def test_validate_reduces_across_processes(monkeypatch):
    """Experiment.validate sums metric sums and counts across processes
    (sample-weighted mean over rank-strided shards)."""
    from mindtheedge_tpu.training import experiment as E

    calls = []

    def fake_reduce(value, average=True, name=None):
        calls.append((float(np.asarray(value)), average))
        return np.asarray(value) * 2   # pretend 2 identical processes

    monkeypatch.setattr(jax, 'process_count', lambda: 2)
    import mindtheedge_tpu.utils.reduce as R
    monkeypatch.setattr(R, 'reduce_value', fake_reduce)

    exp = E.Experiment.__new__(E.Experiment)
    exp.config = type('C', (), {})()
    exp.config.model = type('M', (), {'name': 'SemiSupEdgeModel'})()
    exp.config.edges = type('E2', (), {'depth_edges_metric_log': False})()
    ds = type('D', (), {})()
    ds.validation = type('V', (), {'gt_crop': None})()
    exp.config.datasets = ds
    exp.val_loader = [{}]   # one empty batch
    monkeypatch.setattr(
        E.Experiment, 'evaluate_depth',
        lambda self, batch: {'metrics': {'depth': np.full(7, 3.0)},
                             'inv_depth_pp': None, 'depth': None,
                             'depth_pp': None})
    means = exp.validate()
    # every sum and the count doubled -> mean unchanged at 3.0
    assert all(abs(v - 3.0) < 1e-9 for v in means.values()) and means
    assert any(not avg for _, avg in calls)


def test_validate_edge_metrics_cover_whole_batch(monkeypatch):
    """Chamfer edge P/R/F1 scores EVERY sample of a val batch, not sample 0
    (the reference's per-sample loop, model_wrapper.py:376-442; the F1 feeds
    checkpoint filenames, so undersampling it silently skews model selection).
    """
    from mindtheedge_tpu.training import experiment as E
    from mindtheedge_tpu.evaluation import edge_metrics as EM

    seen = []

    def fake_edge_metrics(pred, gt, is_probability=False, gt_crop=None):
        seen.append(float(pred.mean()))
        # P, R, F1 proportional to the sample id so the mean is checkable
        return [float(pred.mean())] * len(EM.EDGE_METRIC_NAMES)

    monkeypatch.setattr(E, 'jax', jax)
    monkeypatch.setattr(jax, 'process_count', lambda: 1)

    exp = E.Experiment.__new__(E.Experiment)
    exp.config = type('C', (), {})()
    exp.config.model = type('M', (), {'name': 'SemiSupEdgeModel'})()
    exp.config.edges = type('E2', (), {'depth_edges_metric_log': True})()
    ds = type('D', (), {})()
    ds.validation = type('V', (), {'gt_crop': None})()
    exp.config.datasets = ds

    B, H, W = 2, 8, 8
    # sample i's depth_pp is constant i+1 -> per-sample metric i+1, mean 1.5
    depth_pp = np.stack([np.full((H, W, 1), i + 1.0) for i in range(B)])
    batch = {'edge': np.zeros((B, H, W, 1), np.float32),
             'rgb': np.zeros((B, H, W, 3), np.float32)}
    exp.val_loader = [batch]
    monkeypatch.setattr(
        E.Experiment, 'evaluate_depth',
        lambda self, b: {'metrics': {'depth': np.full(7, 3.0)},
                         'inv_depth_pp': depth_pp, 'depth': depth_pp,
                         'depth_pp': depth_pp})
    monkeypatch.setattr(EM, 'compute_edge_metrics', fake_edge_metrics)
    # experiment.py imports the symbol inside validate(); patch the module
    import mindtheedge_tpu.evaluation.edge_metrics as em_mod
    monkeypatch.setattr(em_mod, 'compute_edge_metrics', fake_edge_metrics)

    means = exp.validate()
    assert len(seen) == B, f'scored {len(seen)} samples, want {B}'
    for name in EM.EDGE_METRIC_NAMES:
        assert abs(means[f'edges/{name}'] - 1.5) < 1e-9
