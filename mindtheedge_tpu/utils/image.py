"""Image utilities (NHWC, in-graph).

Re-implementations of the reference ``utils/image.py`` helpers with exact
torch interpolation semantics where the metric protocol depends on them.
"""

import jax
import jax.numpy as jnp


def flip_lr(x):
    """Horizontal flip of [B,H,W,C] (reference ``utils/image.py`` flip_lr)."""
    return x[:, :, ::-1, :]


def gradient_x(x):
    """x[:, :, :-1] - x[:, :, 1:] over width (reference smoothness grads)."""
    return x[:, :, :-1, :] - x[:, :, 1:, :]


def gradient_y(x):
    return x[:, :-1, :, :] - x[:, 1:, :, :]


def rgb_to_gray(x):
    """ITU-R 601 luma as in the reference GradLayer (``grad_loss.py:56-63``)."""
    coeffs = jnp.asarray([65.738, 129.057, 25.064], dtype=x.dtype) / 256.0
    return (x * coeffs).sum(axis=-1, keepdims=True)


def _nearest_indices(out_size, in_size):
    # torch 'nearest' semantics: src = floor(dst * in/out)
    idx = jnp.floor(jnp.arange(out_size) * (in_size / out_size)).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


def resize_nearest(x, shape):
    """torch F.interpolate(mode='nearest') semantics on [B,H,W,C]."""
    h, w = shape
    iy = _nearest_indices(h, x.shape[1])
    ix = _nearest_indices(w, x.shape[2])
    return x[:, iy][:, :, ix]


def _linear_weights(out_size, in_size, align_corners):
    if align_corners and out_size > 1:
        src = jnp.arange(out_size) * ((in_size - 1) / (out_size - 1))
    else:
        src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(jnp.float32)
    return lo, hi, frac


def resize_bilinear(x, shape, align_corners=False):
    """torch F.interpolate(mode='bilinear') on [B,H,W,C], both align modes."""
    h, w = int(shape[0]), int(shape[1])
    y_lo, y_hi, fy = _linear_weights(h, x.shape[1], align_corners)
    x_lo, x_hi, fx = _linear_weights(w, x.shape[2], align_corners)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    top = xf[:, y_lo]
    bot = xf[:, y_hi]
    rows = top + (bot - top) * fy[None, :, None, None]
    left = rows[:, :, x_lo]
    right = rows[:, :, x_hi]
    out = left + (right - left) * fx[None, None, :, None]
    return out.astype(dtype)


def interpolate_image(image, shape, mode='bilinear', align_corners=True):
    """Reference ``utils/image.py`` interpolate_image (NHWC)."""
    if image.shape[1] == shape[0] and image.shape[2] == shape[1]:
        return image
    if mode == 'nearest':
        return resize_nearest(image, shape)
    return resize_bilinear(image, shape, align_corners=bool(align_corners))


def match_scales(image, targets, num_scales, mode='nearest', align_corners=None):
    """Resize ``image`` to the first ``num_scales`` target resolutions.

    Reference ``utils/image.py`` match_scales: reuses the image when shapes
    already match.
    """
    images = []
    for i in range(num_scales):
        t = targets[i]
        t_shape = (t.shape[1], t.shape[2])
        if image.shape[1] == t_shape[0] and image.shape[2] == t_shape[1]:
            images.append(image)
        else:
            images.append(interpolate_image(image, t_shape, mode=mode,
                                            align_corners=align_corners))
    return images


def box_filter_15(x):
    """15x15 ones-kernel conv with zero padding (attention_loss.py:10-13,29)."""
    k = jnp.ones((15, 15, 1, 1), dtype=x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(7, 7), (7, 7)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
