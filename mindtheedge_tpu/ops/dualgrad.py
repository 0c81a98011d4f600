"""Compact-kernel custom VJPs for the packed/phase conv formulations.

The packed formulations (``ops/phase_conv.py``) win the FORWARD on the MXU by
expanding the compact [kh,kw,ci,co] kernel into a phase/packed-domain kernel
whose extra taps are zeros: the multiply-by-zero FLOPs ride otherwise-idle
lanes.  Under autodiff, though, the weight gradient correlates activations
with output cotangents at the EXPANDED kernel size — and unlike the forward,
the wgrad contraction runs over batch x space with a [ci*r, co*r] output, so
the inflation (``r*kt/k`` for W-packing, up to 8x at r=4, ~5500x for the
r=128 disp heads) is real work, not idle lanes.  Measured: the train step
regressed 237 -> 383 ms with the pack2d decoder / W-packed heads left in the
train graph, and the SAN-ladder backward sat at 2.0x its HBM floor
(NOTES.md round 4; reference train hot loop
``packnet_code/packnet_sfm/trainers/common_trainer.py:93-185``).

Fix: every packed conv is one linear function of (x, K) that ALSO has a
compact formulation (pack/unpack are permutations):

    conv(x, expand(K), stride r)         == pack(conv(x, K, stride 1))
    conv(xp, expand_packed(K))           == pack(conv(unpack(xp), K))

``jax.custom_vjp`` lets the forward run the packed program while the
backward differentiates the compact one: dK is correlated at the COMPACT
kernel size and dx flows through a compact-kernel transposed conv plus a
(cheap, byte-cost-only) pack/unpack relayout.  The two formulations compute
the same values, so gradients agree with the expanded path's autodiff up to
float associativity (pinned by ``tests/test_dualgrad.py``).

``MTE_COMPACT_VJP=0`` disables the wrappers (plain autodiff through the
expansion) for A/B measurement.
"""

import os

import jax
import jax.numpy as jnp

from mindtheedge_tpu.ops.phase_conv import (
    expand_kernel_phase, expand_kernel_packed_w, expand_kernel_packed_2d,
    packed_w_conv_geometry, packed2d_conv_geometry, pack_w, unpack_w)
from mindtheedge_tpu.ops.packing import pack2d, unpack2d

_DN = ('NHWC', 'HWIO', 'NHWC')


def enabled():
    """Default OFF — measured on the chip (round 5, b3 384x1280 paper
    config): the full train step is 94% HBM-bound, so swapping the
    expanded-tap wgrad (whose inflated FLOPs hide under the byte floor) for
    the compact backward's extra pack/unpack relayout bytes LOSES: 235.7 ms
    baseline vs 246.0 ms with the compact VJP (tools/profile_train.py).
    The machinery stays (gradient-equality pinned in tests/test_dualgrad.py)
    for compute-bound regimes: ``MTE_COMPACT_VJP=1`` enables."""
    return os.environ.get('MTE_COMPACT_VJP', '0') == '1'


def train_packed_enabled():
    """Whether the serving-side packed formulations (pack2d decoder, W-packed
    disp heads, cross-block chaining) also run in the TRAIN graph.  Default
    OFF — measured (round 5): with everything on the step ran 300.5 ms vs
    235.7 baseline; the packings' kernel-derivation chains ride every
    training forward (fwd_loss 75.7 -> 116.3) and their backward adds bytes
    to an HBM-saturated program.  ``MTE_TRAIN_PACKED=1`` re-enables (pair
    with ``MTE_COMPACT_VJP=1`` or the expanded wgrad regresses further)."""
    return os.environ.get('MTE_TRAIN_PACKED', '0') == '1'


def _dual(primal_fn, compact_fn):
    """custom_vjp: forward = primal_fn (packed program), backward =
    autodiff of compact_fn (same function, compact kernels)."""

    @jax.custom_vjp
    def f(x, k):
        return primal_fn(x, k)

    def fwd(x, k):
        return primal_fn(x, k), (x, k)

    def bwd(res, g):
        return jax.vjp(compact_fn, *res)[1](g)

    f.defvjp(fwd, bwd)
    return f


def _pack_phase(y, rh, rw):
    """[B,H,W,C] -> [B,H/rh,W/rw,C*rh*rw], channel order c*rh*rw + dy*rw + dx
    (the order ``expand_kernel_phase`` emits; pack2d for rh=rw=2, pack_w for
    rh=1)."""
    b, h, w, c = y.shape
    y = y.reshape(b, h // rh, rh, w // rw, rw, c)
    y = y.transpose(0, 1, 3, 5, 2, 4)
    return y.reshape(b, h // rh, w // rw, c * rh * rw)


def conv_phase(x, kernel, rh, rw):
    """Full-res input -> phase-packed output == pack(conv(x, K, SAME)).

    kernel [kh,kw,ci,co]; output [B,H/rh,W/rw,co*rh*rw].
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = kh // 2, kw // 2

    def primal(x_, k_):
        ke = expand_kernel_phase(k_.astype(x_.dtype), rh, rw)
        return jax.lax.conv_general_dilated(
            x_, ke, (rh, rw), [(ph, ph), (pw, pw)], dimension_numbers=_DN)

    def compact(x_, k_):
        y = jax.lax.conv_general_dilated(
            x_, k_.astype(x_.dtype), (1, 1), [(ph, ph), (pw, pw)],
            dimension_numbers=_DN)
        return _pack_phase(y, rh, rw)

    if not enabled():
        return primal(x, kernel)
    return _dual(primal, compact)(x, kernel)


def conv_packed_w(xp, kernel, rw):
    """W-packed input -> W-packed output == pack_w(conv(unpack_w(xp), K)).

    kernel [kh,kw,ci,co]; xp [B,H,W/rw,ci*rw]; output [B,H,W/rw,co*rw].
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph = kh // 2
    t0, kt = packed_w_conv_geometry(kw, rw)

    def primal(x_, k_):
        ke = expand_kernel_packed_w(k_.astype(x_.dtype), rw)
        return jax.lax.conv_general_dilated(
            x_, ke, (1, 1), [(ph, ph), (-t0, kt - 1 + t0)],
            dimension_numbers=_DN)

    def compact(x_, k_):
        y = jax.lax.conv_general_dilated(
            unpack_w(x_, rw), k_.astype(x_.dtype), (1, 1),
            [(ph, ph), (kw // 2, kw // 2)], dimension_numbers=_DN)
        return pack_w(y, rw)

    if not enabled():
        return primal(xp, kernel)
    return _dual(primal, compact)(xp, kernel)


def conv_packed_2d(x2, kernel, r=2):
    """pack2d input -> pack2d output == pack2d(conv(unpack2d(x2), K)).

    kernel [k,k,ci,co]; x2 [B,h,w,ci*r^2]; output [B,h,w,co*r^2].
    """
    k = kernel.shape[0]
    p = k // 2
    t0, kt = packed2d_conv_geometry(k, r)

    def primal(x_, k_):
        ke = expand_kernel_packed_2d(k_.astype(x_.dtype), r)
        return jax.lax.conv_general_dilated(
            x_, ke, (1, 1), [(-t0, kt - 1 + t0)] * 2, dimension_numbers=_DN)

    def compact(x_, k_):
        y = jax.lax.conv_general_dilated(
            unpack2d(x_, r), k_.astype(x_.dtype), (1, 1), [(p, p)] * 2,
            dimension_numbers=_DN)
        return pack2d(y, r)

    if not enabled():
        return primal(x2, kernel)
    return _dual(primal, compact)(x2, kernel)
