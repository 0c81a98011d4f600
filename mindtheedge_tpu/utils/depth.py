"""Depth utilities, in-graph (NHWC).

Re-implementations of reference ``utils/depth.py``: inv/depth conversion,
flip-fusion post-processing, and the 7-metric depth evaluation protocol
(abs_rel, sq_rel, rmse, rmse_log, a1/a2/a3 with garg crop + median scaling).
"""

import numpy as np
import jax.numpy as jnp

from mindtheedge_tpu.utils.image import flip_lr, resize_bilinear


def inv2depth(inv_depth):
    """1 / clamp(inv, min=1e-6) (reference ``utils/depth.py:104-121``)."""
    if isinstance(inv_depth, (list, tuple)):
        return [inv2depth(d) for d in inv_depth]
    return 1.0 / jnp.clip(inv_depth, 1e-6, None)


def depth2inv(depth):
    """1/depth with invalid (<=0) pixels set to 0 (``utils/depth.py:124-144``)."""
    if isinstance(depth, (list, tuple)):
        return [depth2inv(d) for d in depth]
    inv = 1.0 / jnp.clip(depth, 1e-6, None)
    return jnp.where(depth <= 0.0, 0.0, inv)


def fuse_inv_depth(inv_depth, inv_depth_hat, method='mean'):
    if method == 'mean':
        return 0.5 * (inv_depth + inv_depth_hat)
    if method == 'max':
        return jnp.maximum(inv_depth, inv_depth_hat)
    if method == 'min':
        return jnp.minimum(inv_depth, inv_depth_hat)
    raise ValueError(f'Unknown post-process method {method}')


def post_process_inv_depth(inv_depth, inv_depth_flipped, method='mean'):
    """Flip-fusion with 5%-border ramp mask (``utils/depth.py:230-256``)."""
    b, h, w, c = inv_depth.shape
    inv_depth_hat = flip_lr(inv_depth_flipped)
    fused = fuse_inv_depth(inv_depth, inv_depth_hat, method=method)
    xs = jnp.linspace(0.0, 1.0, w, dtype=inv_depth.dtype)[None, None, :, None]
    mask = 1.0 - jnp.clip(20.0 * (xs - 0.05), 0.0, 1.0)
    mask = jnp.broadcast_to(mask, inv_depth.shape)
    mask_hat = flip_lr(mask)
    return mask_hat * inv_depth + mask * inv_depth_hat + \
        (1.0 - mask - mask_hat) * fused


def scale_depth(pred, gt_shape, scale_fn='resize'):
    """Match prediction to GT resolution (``utils/depth.py:328-361``).

    'resize' = bilinear align_corners=True; 'top-center' = zero-pad the top
    and center horizontally.
    """
    gh, gw = gt_shape
    if pred.shape[1] == gh and pred.shape[2] == gw:
        return pred
    if scale_fn == 'resize':
        return resize_bilinear(pred, (gh, gw), align_corners=True)
    if scale_fn == 'top-center':
        top = gh - pred.shape[1]
        left = (gw - pred.shape[2]) // 2
        out = jnp.zeros((pred.shape[0], gh, gw, pred.shape[3]), dtype=pred.dtype)
        return out.at[:, top:top + pred.shape[1], left:left + pred.shape[2]].set(pred)
    raise NotImplementedError(f'Depth scale function {scale_fn} not implemented.')


def _masked_median(x, mask):
    """Median of x over mask==True (host-friendly but jittable via sort)."""
    big = jnp.asarray(np.finfo(np.float32).max, x.dtype)
    n = jnp.sum(mask)
    xs = jnp.sort(jnp.where(mask, x, big).reshape(-1))
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    return 0.5 * (xs[lo] + xs[hi])


def compute_depth_metrics(gt, pred, min_depth=0.0, max_depth=80.0,
                          crop='garg', scale_output='resize',
                          use_gt_scale=True):
    """7-metric depth eval (``utils/depth.py:259-325``), batched & jittable.

    gt, pred: [B,H,W,1].  Returns [7] array: abs_rel, sq_rel, rmse, rmse_log,
    a1, a2, a3 — averaged over batch samples (samples without valid pixels
    contribute zeros, like the reference's ``continue``).
    """
    b, gh, gw, _ = gt.shape
    pred = scale_depth(pred, (gh, gw), scale_output)

    valid = (gt > min_depth) & (gt < max_depth)
    if crop == 'garg':
        y1, y2 = int(0.40810811 * gh), int(0.99189189 * gh)
        x1, x2 = int(0.03594771 * gw), int(0.96405229 * gw)
        cm = np.zeros((gh, gw), dtype=bool)
        cm[y1:y2, x1:x2] = True
        valid = valid & jnp.asarray(cm)[None, :, :, None]

    def per_sample(gt_i, pred_i, valid_i):
        gt_i = gt_i[..., 0]
        pred_i = pred_i[..., 0]
        m = valid_i[..., 0]
        count = jnp.maximum(jnp.sum(m), 1)
        if use_gt_scale:
            med_gt = _masked_median(gt_i, m)
            med_pred = _masked_median(pred_i, m)
            pred_i = pred_i * med_gt / jnp.maximum(med_pred, 1e-12)
        pred_i = jnp.clip(pred_i, min_depth, max_depth)
        safe_gt = jnp.where(m, gt_i, 1.0)
        safe_pred = jnp.where(m, pred_i, 1.0)

        thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
        mean = lambda v: jnp.sum(jnp.where(m, v, 0.0)) / count
        a1 = mean((thresh < 1.25).astype(jnp.float32))
        a2 = mean((thresh < 1.25 ** 2).astype(jnp.float32))
        a3 = mean((thresh < 1.25 ** 3).astype(jnp.float32))
        diff = safe_gt - safe_pred
        abs_rel = mean(jnp.abs(diff) / safe_gt)
        sq_rel = mean(diff ** 2 / safe_gt)
        rmse = jnp.sqrt(mean(diff ** 2))
        rmse_log = jnp.sqrt(mean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2))
        metrics = jnp.stack([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3])
        return jnp.where(jnp.sum(m) > 0, metrics, jnp.zeros(7))

    import jax
    metrics = jax.vmap(per_sample)(gt, pred, valid)
    return metrics.sum(axis=0) / b


DEPTH_METRIC_NAMES = ('abs_rel', 'sqr_rel', 'rmse', 'rmse_log', 'a1', 'a2', 'a3')
