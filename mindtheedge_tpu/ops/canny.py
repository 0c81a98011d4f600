"""In-graph Canny edge detection (batched, jit/vmap-able).

The reference calls ``cv2.Canny`` on host per image per threshold — 12x per
image in the AUC sweep (``eval_depth_edges.py:264-280``) and 3x per
validation batch (``model_wrapper.py:399-401``).  This op evaluates ALL
thresholds in one compiled program over the whole batch.

cv2.Canny semantics reproduced: 3x3 Sobel (reflect-101 border), L1 gradient
magnitude (|gx|+|gy|, the cv2 default), 4-bucket direction NMS with
interpolation-free neighbor compare, double threshold + hysteresis by
iterated dilation.  Minor divergences from cv2's exact NMS tie-breaking are
possible; the AUC protocol uses the host cv2 path for strict parity, this op
is the fused fast path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mindtheedge_tpu.ops.edge_ops import conv2_single, _dilate8

SOBEL3_X = np.array([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]])
SOBEL3_Y = np.array([[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]])


def canny(img, low, high, max_iters=None):
    """Canny edges of [B,H,W] uint8-range images; returns {0,1} float maps.

    ``low``/``high``: scalars or [T]-vectors — a [T,B,H,W] map per threshold
    pair is returned for vector input (one fused program for the whole
    threshold sweep).

    Hysteresis runs to fixpoint (loop exits on no-change); ``max_iters``
    (default H*W) is a divergence backstop only.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    img = img.astype(jnp.float32)
    if max_iters is None:
        max_iters = img.shape[1] * img.shape[2]

    gx = conv2_single(img, SOBEL3_X)
    gy = conv2_single(img, SOBEL3_Y)
    mag = jnp.abs(gx) + jnp.abs(gy)          # cv2 L1 default

    # direction-quantized NMS (4 buckets over [0, 180))
    angle = jnp.rad2deg(jnp.arctan2(gy, gx))
    angle = jnp.where(angle < 0, angle + 180.0, angle)

    def shift(di, dj):
        return jnp.roll(mag, (-di, -dj), axis=(1, 2))

    q0, r0 = shift(0, 1), shift(0, -1)
    q45, r45 = shift(-1, 1), shift(1, -1)
    q90, r90 = shift(1, 0), shift(-1, 0)
    q135, r135 = shift(1, 1), shift(-1, -1)

    is45 = (angle >= 22.5) & (angle < 67.5)
    is90 = (angle >= 67.5) & (angle < 112.5)
    is135 = (angle >= 112.5) & (angle < 157.5)
    q = jnp.where(is45, q45, jnp.where(is90, q90, jnp.where(is135, q135, q0)))
    r = jnp.where(is45, r45, jnp.where(is90, r90, jnp.where(is135, r135, r0)))
    nms = jnp.where((mag >= q) & (mag >= r), mag, 0.0)

    h, w = img.shape[1], img.shape[2]
    row = jnp.arange(h)[None, :, None]
    col = jnp.arange(w)[None, None, :]
    interior = (row >= 1) & (row < h - 1) & (col >= 1) & (col < w - 1)
    nms = jnp.where(interior, nms, 0.0)

    low = jnp.atleast_1d(jnp.asarray(low, jnp.float32))
    high = jnp.atleast_1d(jnp.asarray(high, jnp.float32))

    def one_threshold(lo, hi):
        strong = (nms > hi).astype(jnp.float32)
        weak = (nms > lo).astype(jnp.float32)

        def cond(state):
            i, cur, changed = state
            return changed & (i < max_iters)

        def body(state):
            i, cur, _ = state
            grown = jnp.minimum(_dilate8(cur), weak)
            return i + 1, grown, jnp.any(grown != cur)

        _, final, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), strong, jnp.asarray(True)))
        return final

    out = jax.vmap(one_threshold)(low, high)
    if out.shape[0] == 1 and np.ndim(low) == 0:
        out = out[0]
    if squeeze:
        out = out[..., 0, :, :] if out.ndim == 4 else out[0]
    return out


def canny_sweep(img, thresholds):
    """Canny at (t/2, t) for every t — the AUC sweep
    (``eval_depth_edges.py:264,279-280``) as ONE program."""
    t = jnp.asarray(thresholds, jnp.float32)
    return canny(img, t / 2.0, t)
