"""Supervised depth losses (sparse-l1 / mse / berhu / silog / abs_rel).

Functional re-implementation of reference ``losses/supervised_loss.py``.
Sparse masking follows the reference exactly: boolean-index by ``gt > 0``
then reduce over *valid elements only* (``supervised_loss.py:172-180``) —
in JAX this is where+sum/count, not where+mean-over-all.
"""

import jax.numpy as jnp

from mindtheedge_tpu.utils.image import match_scales


def _masked_mean(value, mask):
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask, value, 0.0)) / count


def l1_loss(pred, gt, mask):
    return _masked_mean(jnp.abs(pred - gt), mask)


def mse_loss(pred, gt, mask):
    return _masked_mean((pred - gt) ** 2, mask)


def abs_rel_loss(pred, gt, mask):
    # reference: mean(|x - y| / x) with x = pred (supervised_loss.py:84)
    return _masked_mean(jnp.abs(pred - gt) / jnp.where(mask, pred, 1.0), mask)


def berhu_loss(pred, gt, mask, threshold=0.2):
    """BerHu (``supervised_loss.py:13-55``): L1 below c, squared above.

    The reference computes ``c = threshold * max(pred - gt)`` over valid
    elements and then *concatenates* diff with diff^2 of the above-c subset
    before the mean; we reproduce that weighting exactly:
    mean = (sum(diff) + sum(diff2[above])) / (n + n_above).
    """
    diff = jnp.abs(pred - gt)
    big_neg = jnp.asarray(-3.4e38, pred.dtype)
    c = threshold * jnp.max(jnp.where(mask, pred - gt, big_neg))
    above = (diff > c) & mask
    n = jnp.sum(mask)
    n_above = jnp.sum(above)
    total = jnp.sum(jnp.where(mask, diff, 0.0)) + jnp.sum(jnp.where(above, diff ** 2, 0.0))
    return total / jnp.maximum(n + n_above, 1.0)


def silog_loss(pred, gt, mask, ratio=10.0, ratio2=0.85):
    """Scale-invariant log loss (``supervised_loss.py:57-69``)."""
    log_diff = jnp.log(jnp.where(mask, pred, 1.0) * ratio) - \
        jnp.log(jnp.where(mask, gt, 1.0) * ratio)
    silog1 = _masked_mean(log_diff ** 2, mask)
    silog2 = ratio2 * _masked_mean(log_diff, mask) ** 2
    return jnp.sqrt(jnp.maximum(silog1 - silog2, 0.0)) * ratio


_LOSS_FNS = {
    'l1': l1_loss,
    'mse': mse_loss,
    'berhu': berhu_loss,
    'silog': silog_loss,
    'abs_rel': abs_rel_loss,
}


def get_loss_fn(supervised_method):
    """Name dispatch by suffix (``supervised_loss.py:73-86``)."""
    for name, fn in _LOSS_FNS.items():
        if supervised_method.endswith(name):
            return fn
    raise ValueError(f'Unknown supervised loss {supervised_method}')


def supervised_loss(inv_depths, gt_inv_depth, supervised_method='sparse-l1',
                    num_scales=4):
    """Per-scale-averaged supervised loss on inverse depth.

    ``inv_depths``: list of [B,h,w,1] predictions (full res first);
    ``gt_inv_depth``: [B,H,W,1].  GT is matched to each scale with nearest
    interpolation (``supervised_loss.py:207-208``); sparse methods mask by
    gt > 0; a +1e-5 stabilizer is added to predictions (``:179``).
    """
    loss_fn = get_loss_fn(supervised_method)
    sparse = supervised_method.startswith('sparse')
    gts = match_scales(gt_inv_depth, inv_depths, num_scales, mode='nearest')
    total = 0.0
    for i in range(num_scales):
        mask = (gts[i] > 0.0) if sparse else jnp.ones_like(gts[i], dtype=bool)
        total = total + loss_fn(inv_depths[i] + 1e-5, gts[i], mask)
    return total / num_scales
