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

    Built as ONE 0/1-selector einsum: the rh*rw pad+stack loop this replaces
    lowers to a SERIAL update chain (the same pathology measured at 16.9 ms
    on the 27-term pack-kernel compose), which at the disp heads' rw=128 put
    ~10 ms of kernel derivation into every training forward.  Entries are
    single selections, so values are bit-identical to the padded form.
    """
    import numpy as np
    kh, kw, ci, co = kernel.shape
    sel_h = np.zeros((rh, kh + rh - 1, kh), np.float32)   # [dy, e, a]
    for dy in range(rh):
        for a in range(kh):
            sel_h[dy, a + dy, a] = 1.0
    sel_w = np.zeros((rw, kw + rw - 1, kw), np.float32)   # [dx, f, b]
    for dx in range(rw):
        for b in range(kw):
            sel_w[dx, b + dx, b] = 1.0
    kb = jnp.einsum('yea,xfb,abic->eficyx',
                    jnp.asarray(sel_h, kernel.dtype),
                    jnp.asarray(sel_w, kernel.dtype), kernel)
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


def pack_w(x, r):
    """W-phase packing: [B,H,W,C] -> [B,H,W/r,C*r] with channel c*r + dx."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w // r, r, c)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w // r, c * r)


def unpack_h(x, r):
    """Inverse of H-phase packing: [B,H/r,W,C*r] (chan co*r+dy) -> [B,H,W,C]
    — the output layout of ``expand_kernel_phase(kernel, r, 1)``."""
    b, h, w, cr = x.shape
    c = cr // r
    x = x.reshape(b, h, w, c, r)
    x = x.transpose(0, 1, 4, 2, 3)
    return x.reshape(b, h * r, w, c)


def packed_w_conv_geometry(kw, rw):
    """(t0, kt): w'-tap offsets [t0, t0+kt) of the packed-domain conv."""
    p = kw // 2
    t0 = -((p + rw - 1) // rw)
    t1 = (kw - 1 - p + rw - 1) // rw
    return t0, t1 - t0 + 1


def expand_kernel_packed_w(kernel, rw):
    """[kh,kw,ci,co] -> [kh, kt, ci*rw, co*rw]: stride-1 SAME conv expressed
    ENTIRELY in the W-phase-packed domain (input and output both packed),
    so chains of convs never unpack between layers:

        conv(Xp, Kp, stride 1, pad=(kh//2, -t0)) == pack_w(conv(x, K, SAME), rw)
        for Xp = pack_w(x, rw)

    Derivation: y[wo] = sum_d x[wo + d - p] K[d] with wo = w'o*rw + dxo and
    x[m] = Xp[m // rw, ci*rw + m % rw] gives input w'-offset
    s = (dxo + d - p - dxi) / rw, i.e. tap t = s - t0 with
    d = (t + t0)*rw + dxi - dxo + p; entries with d outside [0, kw) are zero.
    Nonzero density is kw/(kt*rw) — the multiply-by-zero FLOP inflation is
    ~rw*kt/kw, paid on an MXU running narrow-channel convs at 25-50% lanes
    otherwise (measured net win, tools/probe_san.py).  Use
    ``packed_w_conv_geometry`` for the (t0, kt) padding: pad_w = (-t0,
    kt - 1 + t0).
    """
    import numpy as np
    kh, kw, ci, co = kernel.shape
    p = kw // 2
    t0, kt = packed_w_conv_geometry(kw, rw)
    sel = np.zeros((kt, rw, rw, kw), np.float32)     # [t, dxi, dxo, d]
    for t in range(kt):
        for dxi in range(rw):
            for dxo in range(rw):
                d = (t + t0) * rw + dxi - dxo + p
                if 0 <= d < kw:
                    sel[t, dxi, dxo, d] = 1.0
    sel = jnp.asarray(sel, kernel.dtype)
    # [kh, kt, ci, dxi, co, dxo] -> [kh, kt, ci*rw, co*rw]
    kp = jnp.einsum('tiod,adbc->atbico', sel, kernel)
    return kp.reshape(kh, kt, ci * rw, co * rw)


def packed2d_conv_geometry(k, r):
    """Per-axis (t0, kt) tap range of the pack2d-domain conv (axis length k,
    phase factor r)."""
    p = k // 2
    t0 = -((p + r - 1) // r)
    t1 = (k - 1 - p + r - 1) // r
    return t0, t1 - t0 + 1


def expand_kernel_packed_2d(kernel, r=2):
    """[kh,kw,ci,co] -> [kt_h, kt_w, ci*r*r, co*r*r]: stride-1 SAME conv
    expressed ENTIRELY in the pack2d (space-to-depth, r x r) domain — both
    input and output carry the pack2d channel order c*r*r + dy*r + dx
    (``ops/packing.pack2d``), so whole decoder levels can run on the
    half-res grid with 4x the channels and ZERO depth-to-space relayouts.

        conv(X2, K2, stride 1, pad (-t0h, kt_h-1+t0h) x (-t0w, ...))
            == pack2d(conv(x, K, SAME), r)   for X2 = pack2d(x, r)

    Same derivation as ``expand_kernel_packed_w`` applied per axis: tap
    (th, tw) holds K[dh, dw] with dh = (th + t0h)*r + dyi - dyo + p (and
    likewise dw), zero outside [0, k).  FLOP inflation kt_h*kt_w*r^2/k^2
    (4x for k=3, r=2), paid on idle MXU lanes.
    """
    import numpy as np
    kh, kw, ci, co = kernel.shape
    assert kh == kw, 'square kernels only'
    k = kh
    p = k // 2
    t0, kt = packed2d_conv_geometry(k, r)
    sel = np.zeros((kt, r, r, kt, r, r, k, k), np.float32)
    # [th, dyi, dyo, tw, dxi, dxo, dh, dw]
    for th in range(kt):
        for dyi in range(r):
            for dyo in range(r):
                dh = (th + t0) * r + dyi - dyo + p
                if not 0 <= dh < k:
                    continue
                for tw in range(kt):
                    for dxi in range(r):
                        for dxo in range(r):
                            dw = (tw + t0) * r + dxi - dxo + p
                            if 0 <= dw < k:
                                sel[th, dyi, dyo, tw, dxi, dxo, dh, dw] = 1.0
    sel = jnp.asarray(sel, kernel.dtype)
    # -> [th, tw, ci, dyi, dxi, co, dyo, dxo] -> [kt, kt, ci*r^2, co*r^2]
    kp = jnp.einsum('hyYwxXab,abic->hwiyxcYX', sel, kernel)
    return kp.reshape(kt, kt, ci * r * r, co * r * r)
