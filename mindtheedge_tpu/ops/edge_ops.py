"""Edge ops: Sobel gradients, vectorized NMS, hysteresis, normals — in-graph.

TPU-native replacements for the reference's host-side OpenCV + pure-Python
loops, fused into the compiled inference graph:

* ``sobel5_x/y``   == ``cv2.Sobel(img, CV_64F, 1/0, 0/1, ksize=5)`` with the
  default BORDER_REFLECT_101 border (``utils/tools.py:10-11``,
  ``infer_edge_estimation.py:194-198``).
* ``non_max_suppression`` == ``utils/tools.py:9-46`` — direction-quantized
  8-neighbor NMS; the reference implements it as an O(H*W) interpreted Python
  double loop per image per scale (the biggest single-node speedup target),
  here it's one vectorized XLA expression.
* ``hysteresis``   == ``utils/tools.py:49-92`` — 3-class thresholding and
  strong-pixel propagation to fixpoint, as a ``lax.while_loop`` of masked
  3x3 dilations.  Reference quirks preserved: border pixels keep their raw
  values in the label image, and the final map is normalized by its max.
* ``normals_angle_255`` == the annotation pipeline's Sobel-angle normal map
  encode (``infer_edge_estimation.py:194-199``).
"""

import numpy as np
import jax
import jax.numpy as jnp

# cv2 getDerivKernels(1, 0, 5): smooth = [1,4,6,4,1], deriv = [-1,-2,0,2,1]
_SMOOTH5 = np.array([1., 4., 6., 4., 1.])
_DERIV5 = np.array([-1., -2., 0., 2., 1.])
SOBEL5_X = np.outer(_SMOOTH5, _DERIV5)   # [5,5]: smoothing over rows, deriv over cols
SOBEL5_Y = np.outer(_DERIV5, _SMOOTH5)

# 3x3 Sobel kernels as in the reference GradLayer (grad_loss.py:20-31).
SOBEL3_V = np.array([[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]])
SOBEL3_H = np.array([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]])
SOBEL3_LR = np.array([[-2., -1., 0.], [-1., 0., 1.], [0., 1., 2.]])
SOBEL3_RL = np.array([[0., 1., 2.], [-1., 0., 1.], [-2., -1., 0.]])


def _reflect101_pad(x, p):
    """cv2 BORDER_REFLECT_101 padding on the two spatial dims of [..., H, W]."""
    pad = [(0, 0)] * (x.ndim - 2) + [(p, p), (p, p)]
    return jnp.pad(x, pad, mode='reflect')


def conv2_single(img, kernel, reflect=True):
    """2D correlation of [H,W] (or [B,H,W]) image with a fixed [k,k] kernel."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    k = kernel.shape[0]
    p = k // 2
    x = _reflect101_pad(img, p) if reflect else jnp.pad(
        img, [(0, 0), (p, p), (p, p)])
    x = x[..., None]                                    # [B,H+2p,W+2p,1]
    kern = jnp.asarray(kernel, dtype=img.dtype)[..., None, None]  # [k,k,1,1]
    # HIGHEST: the TPU default truncates conv inputs to bf16 on the MXU,
    # which shifts Sobel responses enough to flip NMS direction buckets
    # (~2% of pixels on smooth inputs, measured); the reference computes in
    # cv2 CV_64F, so full-f32 accumulation is the parity-correct choice.
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=jax.lax.Precision.HIGHEST)[..., 0]
    return y[0] if squeeze else y


def sobel5_x(img):
    """== cv2.Sobel(img, CV_64F, 1, 0, ksize=5) (reflect-101 border)."""
    return conv2_single(img, SOBEL5_X)


def sobel5_y(img):
    """== cv2.Sobel(img, CV_64F, 0, 1, ksize=5)."""
    return conv2_single(img, SOBEL5_Y)


def normals_angle_255(img):
    """Sobel-angle normal map, uint8-encoded (infer_edge_estimation.py:194-199).

    Returns float values in [0,255); cast to uint8 on the host for writing.
    """
    sx, sy = sobel5_x(img), sobel5_y(img)
    angle = jnp.arctan2(-sy, sx)
    return jnp.floor((angle * (180.0 / np.pi) + 180.0) / 360.0 * 255.0)


def decode_normal_png(v255):
    """Inverse of ``normals_angle_255`` uint8 encode: angle in radians.

    Matches the training-side decode (``gta_dataset.py:410-413``).
    """
    return (v255 / 255.0) * 2 * np.pi - np.pi


def non_max_suppression(img):
    """Direction-quantized NMS; exact semantics of ``utils/tools.py:9-46``.

    Works on [H,W] or batched [B,H,W].  Border pixels are zeroed (the
    reference's loop never writes them).  Ties keep the pixel (``>=``
    comparisons, ``tools.py:40``).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]

    sx, sy = sobel5_x(img), sobel5_y(img)
    angle = jnp.rad2deg(jnp.arctan2(sy, sx))
    angle = jnp.where(angle < 0, angle + 180.0, angle)

    def shift(di, dj):
        return jnp.roll(img, (-di, -dj), axis=(1, 2))

    # neighbor pairs per direction bucket (q = +offset, r = -offset)
    q0, r0 = shift(0, 1), shift(0, -1)        # angle ~0
    q45, r45 = shift(-1, -1), shift(1, 1)     # angle ~45
    q90, r90 = shift(1, 0), shift(-1, 0)      # angle ~90
    q135, r135 = shift(1, -1), shift(-1, 1)   # angle ~135

    is45 = (angle >= 22.5) & (angle < 67.5)
    is90 = (angle >= 67.5) & (angle < 112.5)
    is135 = (angle >= 112.5) & (angle < 157.5)

    q = jnp.where(is45, q45, jnp.where(is90, q90, jnp.where(is135, q135, q0)))
    r = jnp.where(is45, r45, jnp.where(is90, r90, jnp.where(is135, r135, r0)))

    keep = (img >= q) & (img >= r)
    out = jnp.where(keep, img, 0.0)

    # zero borders (reference loop range 1..H-2 / 1..W-2)
    h, w = img.shape[1], img.shape[2]
    row = jnp.arange(h)[None, :, None]
    col = jnp.arange(w)[None, None, :]
    interior = (row >= 1) & (row < h - 1) & (col >= 1) & (col < w - 1)
    out = jnp.where(interior, out, 0.0)
    return out[0] if squeeze else out


def _dilate8(mask):
    """8-neighbor binary dilation of [B,H,W] float {0,1}."""
    return jax.lax.reduce_window(
        mask, 0., jax.lax.max,
        window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)))


def hysteresis(img, t_low=0.3, t_high=0.7, max_iters=None):
    """Hysteresis thresholding; semantics of ``utils/tools.py:49-92``.

    Interior pixels are labeled strong(2)/weak(0)/intermediate(1); border
    pixels keep their raw image values (reference quirk: the loops skip
    borders of the copied image).  Intermediate pixels connected (8-way,
    through interior chains) to strong pixels become strong, to fixpoint.
    Finally intermediates are zeroed, the label image is normalized by its
    max, and multiplied back into ``img``.

    The propagation runs to fixpoint like the reference's DFS: the loop exits
    when no label changes; ``max_iters`` (default H*W, the longest possible
    snaking chain) is only a divergence backstop, never binding.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    b, h, w = img.shape
    if max_iters is None:
        max_iters = h * w
    row = jnp.arange(h)[None, :, None]
    col = jnp.arange(w)[None, None, :]
    interior = (row >= 1) & (row < h - 1) & (col >= 1) & (col < w - 1)

    labels = jnp.where(img > t_high, 2.0, jnp.where(img < t_low, 0.0, 1.0))
    labels = jnp.where(interior, labels, img)

    def cond(state):
        i, labels, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, labels, _ = state
        strong = (labels == 2.0).astype(img.dtype)
        grow = (_dilate8(strong) > 0) & (labels == 1.0) & interior
        new_labels = jnp.where(grow, 2.0, labels)
        return i + 1, new_labels, jnp.any(grow)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), labels, jnp.asarray(True)))

    labels = jnp.where(interior & (labels == 1.0), 0.0, labels)
    denom = jnp.maximum(jnp.max(labels, axis=(1, 2), keepdims=True), 1e-12)
    out = img * (labels / denom)
    return out[0] if squeeze else out


def remove_isolated_edges(img):
    """== ``utils/tools.py:94-99``: keep pixels with >=2 in their 3x3 sum."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    s = jax.lax.reduce_window(
        img, 0., jax.lax.add,
        window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)))
    out = ((s >= 2) & (img > 0)).astype(jnp.float32)
    return out[0] if squeeze else out
