"""Phase-decomposed (space-to-depth) convolution for full-resolution layers.

TPU motivation: the reference encoder's full-res convs (``pre_calc`` 5x5 and
``conv1`` 7x7, ``PackNetSAN01.py:30-31,43-45``) have only 32 output channels,
so XLA's conv->matmul mapping uses 32/128 MXU lanes (25%).  A stride-1 conv
followed by ``pack2d`` (space-to-depth, r=2) is *exactly* equal to a stride-2
conv with a phase-expanded ``(k+1)x(k+1)`` kernel producing all four spatial
phases as channels:

    pack2d(conv(x, K, stride=1, SAME), 2)
        == conv(x, expand_kernel_phase2(K), stride=2, pad=(k//2, k//2))

with packed channel order ``co*4 + dy*2 + dx`` — the same order ``pack2d``
produces (reference ``layers01.py:127-149``), so the result feeds the PackNet
pack-layer 3D conv directly.  Output channels go 32 -> 128 (100% MXU lanes)
for a FLOP cost of ``(k+1)^2/k^2`` (1.31x at k=7, 1.44x at k=5): a large net
win on the MXU, and the 4x-fewer output rows also cut relayout traffic.

This is the MLPerf-style "conv space-to-depth" transform, derived here for
odd k and stride 1.  Derivation (per axis, p = k//2):

    y[2a + alpha] = sum_d x[2a + alpha + d - p] * K[d]

A stride-2 conv with padding (p, p) computes ``z[a] = sum_e x[2a + e - p] Kb[e]``
with ``e in [0, k+1)``; choosing ``Kb[e, :, co*4-phase-alpha] = K[e - alpha]``
(zero outside ``[0, k)``) gives ``z[a]_alpha = y[2a + alpha]`` exactly.
"""

import jax.numpy as jnp


def expand_kernel_phase(kernel, rh=2, rw=2):
    """[kh,kw,ci,co] -> [kh+rh-1, kw+rw-1, ci, co*rh*rw] phase-expanded kernel.

    ``conv(x, out, stride=(rh,rw), pad=(kh//2,kw//2))`` then equals the
    stride-1 SAME conv with each output pixel's (dy, dx) phase at channel
    ``co*rh*rw + dy*rw + dx`` (pack2d order for rh=rw=2).  Padding stays
    (p, p) per axis: pl+ph = k-1 keeps the output grid aligned for any r.
    """
    kh, kw, ci, co = kernel.shape
    rows = []
    for a in range(rh):
        cols = []
        for b in range(rw):
            cols.append(jnp.pad(kernel,
                                ((a, rh - 1 - a), (b, rw - 1 - b),
                                 (0, 0), (0, 0))))
        rows.append(jnp.stack(cols, axis=-1))   # [kh+rh-1, kw+rw-1, ci, co, rw]
    kb = jnp.stack(rows, axis=-2)               # [..., ci, co, rh, rw]
    return kb.reshape(kh + rh - 1, kw + rw - 1, ci, co * rh * rw)


def expand_kernel_phase2(kernel):
    """[k,k,ci,co] -> [k+1,k+1,ci,4co]; see ``expand_kernel_phase``."""
    return expand_kernel_phase(kernel, 2, 2)


def unpack_w(x, r):
    """Inverse of W-phase packing: [B,H,W/r,C*r] (chan co*r+dx) -> [B,H,W,C]."""
    b, h, w, cr = x.shape
    c = cr // r
    x = x.reshape(b, h, w, c, r)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w * r, c)
