"""The jit-compiled train step: forward + all losses + grads + Adam update.

This is the TPU-native replacement for the reference's per-batch Python loop
(``common_trainer.py:93-185``: sample_to_cuda -> model(batch) -> backward ->
step).  Here the entire loss stack — supervised + edge GradLoss (Sobel,
sigmoid, class-balanced BCE) + optional photometric warp — runs inside ONE
compiled XLA program per step, including the optimizer update.
"""

import jax
import jax.numpy as jnp

from mindtheedge_tpu.training.state import TrainState, variables_from_state


def make_train_step(task, optimizer, grad_transform=None):
    """Build ``train_step(state, batch, rng) -> (new_state, metrics)``.

    ``grad_transform``: optional pytree->pytree hook applied to the raw
    grads — the seam where a spatially-sharded step psums per-device
    partial gradients (``parallel/spatial.make_spatial_train_step``).
    """

    def loss_fn(params, batch_stats, batch, rng, progress):
        variables = variables_from_state(
            TrainState(params=params, batch_stats=batch_stats,
                       opt_state=None, step=0, epoch=0))
        loss, (metrics, outputs, new_stats) = task.train_loss(
            variables, batch, rng, progress)
        return loss, (metrics, new_stats)

    def train_step(state, batch, rng, progress=0.0):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, progress)
        if grad_transform is not None:
            grads = grad_transform(grads)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        batch_stats = state.batch_stats
        if new_stats:
            batch_stats = dict(batch_stats)
            batch_stats['depth'] = new_stats
        new_state = state.replace(params=new_params, batch_stats=batch_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        metrics = dict(metrics)
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def create_train_state(task, optimizer, rng, sample_batch, epoch=0,
                       variables=None):
    """Initialize params (jitted — on-TPU unjitted init is pathological).

    Pass pre-built ``variables`` to avoid a second full init (a 110M-param
    model duplicated on a 16G chip is real money).
    """
    if variables is None:
        variables = jax.jit(task.init)(rng, sample_batch)
    from mindtheedge_tpu.training.state import split_variables
    params, batch_stats = split_variables(variables)
    opt_state = optimizer.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=0, epoch=epoch)
