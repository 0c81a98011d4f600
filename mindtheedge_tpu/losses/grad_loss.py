"""Edge-aware gradient loss — the paper's core contribution, in-graph.

Functional re-implementation of reference ``losses/grad_loss.py``:

* ``grad_layer``: fixed 3x3 Sobel kernels (v/h + two diagonals); without
  normals -> gradient magnitude; with normals -> per-pixel directional
  derivative selected by the normal-angle bucket (``grad_loss.py:65-95``).
* ``class_balanced_bce``: per-sample class-balanced weighted BCE
  (``comp_cross_entropy``, ``grad_loss.py:161-219``).
* ``attention_loss2`` / spatially-adaptive variant (``attention_loss.py:21-49``).
* ``dice`` variant (``grad_loss.py:150-156``).
* ``grad_loss``: resize pred to GT size -> optional grad -> optional
  ``sigmoid(grad - thresh)`` -> loss (``grad_loss.py:122-159``).

All fused into the train step; no host round-trips, no pinned CUDA buffers.
"""

import numpy as np
import jax.numpy as jnp

from mindtheedge_tpu.ops.edge_ops import (
    conv2_single, SOBEL3_V, SOBEL3_H, SOBEL3_LR, SOBEL3_RL)
from mindtheedge_tpu.utils.image import rgb_to_gray, resize_bilinear, box_filter_15


def _conv3(x, kernel):
    """3x3 fixed-kernel conv with zero padding on [B,H,W,1] (torch F.conv2d)."""
    return conv2_single(x[..., 0], kernel, reflect=False)[..., None]


def _sobel_bank_packed(x, rw, with_diag):
    """All Sobel responses in ONE W-phase-packed conv.

    ``_conv3`` is a 1-in/1-out-channel full-res conv — 1/128 MXU lanes, and
    the train loss runs up to 16 of them (4 kernels x 4 scales): measured as
    the bulk of a 53.5 ms fwd_loss-vs-bare gap at b8 (tools/probe_b8_gap.py,
    round 5).  Phase-packing the W axis by ``rw`` turns the bank into one
    [3, 2+rw, 1, n*rw] conv at full lanes; the direction selects and the
    (sum-based, layout-invariant) BCE then run in the packed domain.

    x: [B,H,W,1] -> list of n packed tensors [B,H,W/rw,rw] (channel = dx),
    same values as ``_conv3`` per kernel (zero padding).
    """
    import jax
    from mindtheedge_tpu.ops.phase_conv import expand_kernel_phase
    from mindtheedge_tpu.ops import dualgrad
    kernels = [SOBEL3_V, SOBEL3_H] + ([SOBEL3_LR, SOBEL3_RL] if with_diag else [])
    bank = jnp.stack([jnp.asarray(k, x.dtype) for k in kernels],
                     axis=-1)[:, :, None, :]              # [3,3,1,n]

    def primal(x_, k_):
        ke = expand_kernel_phase(k_, 1, rw)               # [3,2+rw,1,n*rw]
        return jax.lax.conv_general_dilated(
            x_, ke, (1, rw), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=jax.lax.Precision.HIGHEST)          # [B,H,W/rw,n*rw]

    def compact(x_, k_):
        y_ = jax.lax.conv_general_dilated(
            x_, k_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=jax.lax.Precision.HIGHEST)          # [B,H,W,n]
        b_, h_, w_, n_ = y_.shape
        y_ = y_.reshape(b_, h_, w_ // rw, rw, n_)
        return y_.transpose(0, 1, 2, 4, 3).reshape(b_, h_, w_ // rw, n_ * rw)

    # ALWAYS the compact backward (not gated on MTE_COMPACT_VJP): the
    # expanded path's dx is a W-dilation-rw transposed conv — measured as a
    # +66 ms pathology in the b3 train step — while the compact dx is a
    # plain stride-1 conv of the (reshaped) cotangent.
    y = dualgrad._dual(primal, compact)(x, bank)
    return [y[..., i * rw:(i + 1) * rw] for i in range(len(kernels))]


def _pack_w1(t, rw):
    """[B,H,W,1] -> [B,H,W/rw,rw] (phase channel dx) for loss-side tensors."""
    b, h, w, _ = t.shape
    return t[..., 0].reshape(b, h, w // rw, rw)


def _grad_mag_packed(x, normal, rw):
    """Packed-domain ``grad_layer`` magnitude: [B,H,W,1] -> [B,H,W/rw,rw]."""
    if normal is None:
        x_v, x_h = _sobel_bank_packed(x, rw, with_diag=False)
        return jnp.sqrt(x_v ** 2 + x_h ** 2 + 1e-6)
    x_v, x_h, x_lr, x_rl = _sobel_bank_packed(x, rw, with_diag=True)
    n = _pack_w1(normal, rw)
    pi = np.pi
    in_range = lambda lo, hi: (n >= lo) & (n < hi)
    range_v = in_range(-5 * pi / 8, -3 * pi / 8) | in_range(3 * pi / 8, 5 * pi / 8)
    range_rl = in_range(-7 * pi / 8, -5 * pi / 8) | in_range(1 * pi / 8, 3 * pi / 8)
    range_lr = in_range(-3 * pi / 8, -1 * pi / 8) | in_range(5 * pi / 8, 7 * pi / 8)
    mag = jnp.abs(x_h)
    mag = jnp.where(range_v, jnp.abs(x_v), mag)
    mag = jnp.where(range_rl, jnp.abs(x_rl), mag)
    mag = jnp.where(range_lr, jnp.abs(x_lr), mag)
    return mag


def grad_layer(x, normal=None):
    """Sobel gradient magnitude or normal-directed derivative.

    x: [B,H,W,1] (or [B,H,W,3], converted to gray).
    normal: optional [B,H,W,1] angle map in radians in [-pi, pi].
    Returns (magnitude, x_v, x_h).
    """
    if x.shape[-1] == 3:
        x = rgb_to_gray(x)
    x_v = _conv3(x, SOBEL3_V)
    x_h = _conv3(x, SOBEL3_H)
    if normal is None:
        mag = jnp.sqrt(x_v ** 2 + x_h ** 2 + 1e-6)
        return mag, x_v, x_h

    x_lr = _conv3(x, SOBEL3_LR)
    x_rl = _conv3(x, SOBEL3_RL)
    pi = np.pi
    mag = jnp.abs(x_h)
    in_range = lambda lo, hi: (normal >= lo) & (normal < hi)
    range_v = in_range(-5 * pi / 8, -3 * pi / 8) | in_range(3 * pi / 8, 5 * pi / 8)
    range_rl = in_range(-7 * pi / 8, -5 * pi / 8) | in_range(1 * pi / 8, 3 * pi / 8)
    range_lr = in_range(-3 * pi / 8, -1 * pi / 8) | in_range(5 * pi / 8, 7 * pi / 8)
    mag = jnp.where(range_v, jnp.abs(x_v), mag)
    mag = jnp.where(range_rl, jnp.abs(x_rl), mag)
    mag = jnp.where(range_lr, jnp.abs(x_lr), mag)
    return mag, x_v, x_h


def class_balanced_bce(prob, gt_edge, gt_mask=None, pos_to_neg_weight=1.0):
    """Per-sample class-balanced weighted BCE (``grad_loss.py:161-219``).

    prob, gt_edge: [B,H,W,1]; gt_mask: optional [B,H,W,1].  Reference
    semantics (``grad_loss.py:181-210``): alpha always uses mask-weighted
    pos/neg counts, but the loss itself is mask-zeroed and normalized by
    ``mask.sum()`` ONLY when the mask is exactly binary {0,1} with both
    values present; any other mask (continuous, all-ones, all-zeros) falls
    back to unmasked losses normalized by ``numel``.  The check is
    data-dependent, so it is folded in with ``jnp.where`` (jit-safe).
    """
    numel = jnp.asarray(float(np.prod(gt_edge.shape)))
    mask = jnp.ones_like(gt_edge) if gt_mask is None else gt_mask

    pos_loss = -gt_edge * jnp.log(prob + 0.001)
    neg_mask = 1.0 - gt_edge
    neg_loss = -neg_mask * jnp.log(1.0 - prob + 0.001)

    axes = (1, 2, 3)
    weights_pos = jnp.sum(gt_edge * mask, axis=axes)
    weights_neg = jnp.sum(neg_mask * mask, axis=axes)
    alpha = jnp.where(jnp.sum(weights_neg) == 0,
                      jnp.ones_like(weights_neg),
                      weights_neg / jnp.maximum(weights_pos + weights_neg, 1e-12))

    if gt_mask is None:
        # reference: gt_mask=ones -> unique has one value -> unmasked/numel
        pos_eff, neg_eff, valid_pixels = pos_loss, neg_loss, numel
    else:
        is_binary = (jnp.all((mask == 0) | (mask == 1))
                     & jnp.any(mask == 1) & jnp.any(mask == 0))
        pos_eff = jnp.where(is_binary, pos_loss * mask, pos_loss)
        neg_eff = jnp.where(is_binary, neg_loss * mask, neg_loss)
        valid_pixels = jnp.where(is_binary, jnp.sum(mask), numel)

    per_sample = pos_to_neg_weight * alpha * jnp.sum(pos_eff, axis=axes) + \
        (1.0 - alpha) * jnp.sum(neg_eff, axis=axes)
    return jnp.sum(per_sample) / jnp.maximum(valid_pixels, 1.0)


def attention_loss2(prob, target, mask=None, spatially_adaptive=False):
    """AF-style focal BCE (``attention_loss.py:21-49``)."""
    eps = 1e-14
    if not spatially_adaptive:
        num_pos = jnp.sum(target == 1).astype(jnp.float32)
        num_neg = jnp.sum(target == 0).astype(jnp.float32)
        alpha = num_neg / jnp.maximum(num_pos + num_neg, 1.0)
    else:
        pos_alpha = box_filter_15(target) / 225.0
        neg_alpha = 1.0 - pos_alpha
        alpha = jnp.where(neg_alpha >= 1.0 - eps, 0.5, neg_alpha)

    p = jnp.clip(prob, eps, 1.0 - eps)
    import jax
    weight = target * alpha * (4.0 ** jnp.sqrt(1.0 - p)) + \
        (1.0 - target) * (1.0 - alpha) * (4.0 ** jnp.sqrt(p))
    weight = jax.lax.stop_gradient(weight)
    if mask is not None:
        weight = weight * mask
    bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return jnp.mean(weight * bce)


def dice_loss(prob, gt_edge):
    """Inverse-dice term with the 1000x weight (``grad_loss.py:150-156``)."""
    numel = float(np.prod(gt_edge.shape))
    return 1000.0 * ((jnp.sum(prob ** 2) + jnp.sum(gt_edge ** 2) + 1e-4) /
                     (2.0 * jnp.sum(prob * gt_edge) + 1e-4)) / numel


def grad_loss(output, gt_edge, gt_mask=None, is_grad=True, is_sigmoid=True,
              sigmoid_thresh=4.0, gt_normals=None,
              edge_loss_type='cross_entropy', weight=1.0,
              pos_to_neg_weight=1.0):
    """Full GradLoss forward (``grad_loss.py:122-159``).

    output: [B,h,w,1] predicted depth (or probability when is_grad=False);
    gt_edge: [B,H,W,1].  Returns (loss, output_grad).
    """
    import jax
    gt_h, gt_w = gt_edge.shape[1], gt_edge.shape[2]
    if output.shape[1] != gt_h or output.shape[2] != gt_w:
        output = resize_bilinear(output, (gt_h, gt_w), align_corners=False)

    # Packed fast path (see _sobel_bank_packed): the whole grad->sigmoid->BCE
    # chain runs W-phase-packed — same values (BCE is sum-based and
    # layout-invariant; pack/unpack of a 1-channel tensor is a pure reshape).
    rw = 32 if (is_grad and is_sigmoid and edge_loss_type == 'cross_entropy'
                and output.shape[-1] == 1) else 1
    while rw > 1 and gt_w % rw:
        rw //= 2
    if rw > 1:
        mag_p = _grad_mag_packed(output, gt_normals, rw)
        prob_p = jnp.asarray(1.0) / (1.0 + jnp.exp(-(mag_p - sigmoid_thresh)))
        edge_loss = class_balanced_bce(
            prob_p, _pack_w1(gt_edge, rw),
            None if gt_mask is None else _pack_w1(gt_mask, rw),
            pos_to_neg_weight)
        b = output.shape[0]
        output_grad = mag_p.reshape(b, gt_h, gt_w)[..., None]
        return weight * jnp.mean(edge_loss), jax.lax.stop_gradient(output_grad)

    if is_grad:
        output_grad, _, _ = grad_layer(output, gt_normals)
    else:
        output_grad = output

    if is_sigmoid:
        prob = jnp.asarray(1.0) / (1.0 + jnp.exp(-(output_grad - sigmoid_thresh)))
    else:
        prob = output_grad

    edge_loss = 0.0
    if 'cross_entropy' in edge_loss_type:
        edge_loss = class_balanced_bce(prob, gt_edge, gt_mask, pos_to_neg_weight)
    if 'attention_loss' in edge_loss_type:
        edge_loss = attention_loss2(prob, gt_edge, gt_mask, False)
    if 'spatially_adaptive' in edge_loss_type:
        edge_loss = attention_loss2(prob, gt_edge, gt_mask, True)
    if 'dice' in edge_loss_type:
        edge_loss = edge_loss + dice_loss(prob, gt_edge)

    import jax
    return weight * jnp.mean(edge_loss), jax.lax.stop_gradient(output_grad)
