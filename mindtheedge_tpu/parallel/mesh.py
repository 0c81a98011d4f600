"""Device-mesh sharding: the TPU-native replacement for Horovod/DataParallel.

The reference's distributed story (``utils/horovod.py``, ``trainers/
horovod_trainer.py``, ``DistributedSampler`` at ``model_wrapper.py:761-765``)
is NCCL/MPI allreduce data parallelism.  On TPU this is a 1-D ``Mesh`` over
ICI with the batch dimension sharded: the compiled train step contains the
gradient reduction (XLA inserts the psum), and metric reduction is a psum in
the same program — no host round-trips, no parameter server.

For a CNN at 384x1280 with ~110M params DP is the right (and the reference's
only) parallelism axis; spatial (H/W) sharding with halo exchange is the
escape hatch for resolutions that overflow a single core's HBM.
"""

from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name='data'):
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """Shard the leading (batch) dim of every batch leaf across the mesh."""
    def spec(leaf):
        ndim = np.ndim(leaf)
        return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))
    return spec


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name='data'):
    spec_fn = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec_fn(x)), batch)


def replicate_state(state, mesh):
    return jax.device_put(state, replicated(mesh))


def make_dp_train_step(task, optimizer, mesh, axis_name='data'):
    """Horovod-semantics data-parallel train step over a 1-D mesh.

    The reference's DP contract is PER-REPLICA batch: Horovod runs N
    processes each computing the loss over its own ``batch_size`` samples and
    allreduce-averages gradients (``horovod_trainer.py:53-55``,
    ``DistributedSampler`` per rank ``model_wrapper.py:761-793``).  Pooled
    losses (sparse masked means, class-balanced BCE alpha) are NOT linear in
    the batch split, so a global-batch jit is a different estimator; this
    step reproduces Horovod exactly: ``shard_map`` over ``data``, each device
    computes the full loss on its local shard, gradients and metrics are
    ``pmean``'d, the (replicated) optimizer applies the averaged gradient.

    Divergence (documented, NOTES.md): SAN masked-BN running stats are also
    pmean'd (sync-BN) where Horovod keeps them per-replica — replicated
    state must stay replica-identical.

    Returns ``step(state, batch, rng, progress=0.0)``; the global batch
    (leading dim = n * per_device_batch) enters sharded on ``data``.
    """
    from mindtheedge_tpu.training.train_step import make_train_step

    inner = make_train_step(
        task, optimizer,
        grad_transform=lambda g: jax.lax.pmean(g, axis_name))

    def base_step(state, batch, rng, progress):
        new_state, metrics = inner(state, batch, rng, progress)
        metrics = jax.lax.pmean(metrics, axis_name)
        if new_state.batch_stats:
            new_state = new_state.replace(
                batch_stats=jax.tree_util.tree_map(
                    lambda x: jax.lax.pmean(x, axis_name),
                    new_state.batch_stats))
        return new_state, metrics

    sharded = jax.shard_map(
        base_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P()),
        out_specs=(P(), P()), check_vma=False)
    jitted = jax.jit(sharded)
    rep = replicated(mesh)

    def step(state, batch, rng, progress=0.0):
        batch = shard_batch(batch, mesh, axis_name)
        state = jax.device_put(state, rep)
        import jax.numpy as jnp
        return jitted(state, batch, rng, jnp.asarray(progress))

    return step


def make_sharded_train_step(train_step_fn, mesh, axis_name='data'):
    """jit the train step with batch sharded over the mesh, state replicated.

    ``train_step_fn(state, batch, rng) -> (state, metrics)``.  Gradients come
    out correct without explicit psum: XLA inserts the collective for the
    replicated-output-from-sharded-input contraction.
    """
    rep = replicated(mesh)

    def batch_specs(batch):
        return jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1)))),
            batch)

    def run(state, batch, rng):
        return train_step_fn(state, batch, rng)

    jitted = jax.jit(run, donate_argnums=(0,))

    def step(state, batch, rng):
        batch = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), batch, batch_specs(batch))
        state = jax.tree_util.tree_map(
            lambda x: x if hasattr(x, 'sharding') else jax.device_put(x, rep),
            state)
        return jitted(state, batch, rng)

    return step
