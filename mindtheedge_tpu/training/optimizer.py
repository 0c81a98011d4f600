"""Optimizer: per-network Adam param groups + StepLR schedule + freezing.

Reference behaviour (``model_wrapper.py:142-180``): Adam with separate
'Depth' / 'Pose' learning rates, ``StepLR(step_size, gamma)`` stepped per
epoch.  Here each group's learning rate is an optax schedule over *epochs*
(the trainer passes epoch-scaled steps), and frozen submodules
(freeze_encoder/decoder/san, ``PackNetSAN01.py:189-210``) are masked out.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


def steplr(base_lr, step_size, gamma, steps_per_epoch):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (gamma ** (epoch // step_size))
    return schedule


def _freeze_mask(params, depth_cfg):
    """True = trainable. Masks frozen encoder/decoder/san subtrees."""
    frozen_tops = set()
    if depth_cfg.freeze_encoder:
        frozen_tops.add('encoder')
    if depth_cfg.freeze_decoder:
        frozen_tops.add('decoder')
    if depth_cfg.freeze_san:
        frozen_tops.add('mconvs')

    def mask_net(net_name, net_params):
        if net_name != 'depth' or not frozen_tops:
            return jax.tree_util.tree_map(lambda _: True, net_params)
        out = {}
        for top, sub in net_params.items():
            trainable = top not in frozen_tops
            if depth_cfg.freeze_san and top in ('weight', 'bias'):
                trainable = False
            out[top] = jax.tree_util.tree_map(lambda _: trainable, sub)
        return out

    return {net: mask_net(net, p) for net, p in params.items()}


def build_optimizer(config, params, steps_per_epoch):
    """Returns an optax GradientTransformation over the params pytree."""
    opt_cfg = config.model.optimizer
    sch_cfg = config.model.scheduler
    assert opt_cfg.name.lower() == 'adam', f'Unsupported optimizer {opt_cfg.name}'
    assert sch_cfg.name == 'StepLR', f'Unsupported scheduler {sch_cfg.name}'

    def group(lr, weight_decay):
        sched = steplr(lr, sch_cfg.step_size, sch_cfg.gamma, steps_per_epoch)
        # bf16 first moment halves that buffer (~220 MB on PackNet-SAN);
        # makes full-res fp32 training fit in one chip's HBM with remat
        if weight_decay:
            return optax.adamw(sched, weight_decay=weight_decay,
                               mu_dtype=jnp.bfloat16)
        return optax.adam(sched, mu_dtype=jnp.bfloat16)

    transforms: Dict[str, Any] = {
        'depth': group(opt_cfg.depth.lr, opt_cfg.depth.weight_decay),
        'pose': group(opt_cfg.pose.lr, opt_cfg.pose.weight_decay),
        'frozen': optax.set_to_zero(),
    }

    freeze = _freeze_mask(params, config.model.depth_net)

    def label_fn(p):
        labels = {}
        for net in p:
            net_label = 'depth' if net == 'depth' else 'pose'
            labels[net] = jax.tree_util.tree_map(
                lambda trainable, lbl=net_label: lbl if trainable else 'frozen',
                freeze[net])
        return labels

    return optax.multi_transform(transforms, label_fn)
