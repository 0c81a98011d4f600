"""Space-to-depth packing / depth-to-space unpacking (NHWC, TPU layout).

Semantics match the reference PackNet ops exactly (channel ordering included)
so torch checkpoints port bit-for-bit:

* ``pack2d`` == reference ``packing`` (``networks/layers/packnet/layers01.py:127-149``):
  inverse PixelShuffle; output channel for (c, i, j) = c*r^2 + i*r + j where
  (i, j) is the (row, col) offset inside each r x r cell.
* ``unpack2d`` == ``torch.nn.PixelShuffle`` (used at ``layers01.py:204,275``).

The reference works in NCHW; we use NHWC, the native TPU conv layout, with the
same per-channel ordering.
"""

import jax.numpy as jnp


def pack2d(x, r=2):
    """[B,H,W,C] -> [B,H/r,W/r,C*r^2] by folding each r x r cell into channels."""
    b, h, w, c = x.shape
    assert h % r == 0 and w % r == 0, f'pack2d: H,W must divide r (got {h}x{w}, r={r})'
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)            # [B, H/r, W/r, C, r, r]
    return x.reshape(b, h // r, w // r, c * r * r)


def unpack2d(x, r=2):
    """[B,H,W,C*r^2] -> [B,H*r,W*r,C]; exact torch.nn.PixelShuffle semantics."""
    b, h, w, crr = x.shape
    assert crr % (r * r) == 0, f'unpack2d: channels must divide r^2 (got {crr})'
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)            # [B, H, r, W, r, C]
    return x.reshape(b, h * r, w * r, c)


def upsample_nearest2x(x):
    """Nearest-neighbour 2x upsample, NHWC.

    Equals ``torch.nn.Upsample(scale_factor=2, mode='nearest')``
    (``PackNetSAN01.py:92-94``).
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
