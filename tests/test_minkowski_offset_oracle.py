"""Pin the MinkowskiEngine kernel-offset order assumed by torch_port._t_mink.

MinkowskiEngine enumerates hypercube kernel offsets with a nested-increment
region iterator that advances the FIRST coordinate fastest (ME
``src/region.hpp`` ``RegionIterator::operator++``: increment ``point[0]``,
and only when it passes the upper bound reset it and carry into ``point[1]``).
For k=3 the offsets therefore run (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),...
The kernel map pairs output coordinate ``u`` with input ``u + offset`` (the
region is centered on the output coordinate), i.e. cross-correlation, and
``W[m]`` is an [I,O] matrix applied as ``in @ W[m]``.

The reference sparsifies [B,1,H,W] maps with coordinates stacked (row, col)
(``/root/reference/packnet_code/packnet_sfm/networks/layers/minkowski.py:46-49``),
so ME's first (fastest) kernel coordinate is the dense H axis.

This test implements that enumeration as a pure-numpy coordinate-list sparse
conv oracle and checks the framework's masked-dense path
(``ops/sparse._sparse_conv_apply``) fed through ``torch_port._t_mink``:

* ``minkowski_offset_order='first_fastest'`` (the shipped default) MUST match
  the oracle exactly;
* the un-transposed alternative (plain reshape, i.e. last-coordinate-fastest)
  must NOT match on an asymmetric kernel — so the test pins the order rather
  than passing vacuously.

Closes NOTES.md known-gap #2 without MinkowskiEngine installed.
"""

import numpy as np

import jax.numpy as jnp

from mindtheedge_tpu.ops.sparse import _sparse_conv_apply
from mindtheedge_tpu.utils.torch_port import _t_mink


def me_offsets(k):
    """ME hypercube region offsets in generative order (first coord fastest)."""
    p = (k - 1) // 2
    point = [-p, -p]
    offs = []
    for _ in range(k * k):
        offs.append(tuple(point))
        # RegionIterator::operator++ — increment dim 0, carry into dim 1
        for d in range(2):
            point[d] += 1
            if point[d] <= p:
                break
            point[d] = -p
    return offs


def sparse_conv_oracle(x, mask, w_flat, k):
    """Coordinate-list sparse conv: out[u] = sum_m in[u + offset_m] @ W[m]
    over active input coords, evaluated at active output coords (stride 1,
    coordinate-preserving, no bias — ME MinkowskiConvolution semantics)."""
    H, W, _ = x.shape
    O = w_flat.shape[-1]
    offs = me_offsets(k)
    out = np.zeros((H, W, O), np.float64)
    for (i, j) in np.argwhere(mask > 0):
        acc = np.zeros(O, np.float64)
        for m, (dv, du) in enumerate(offs):
            ii, jj = i + dv, j + du
            if 0 <= ii < H and 0 <= jj < W and mask[ii, jj] > 0:
                acc += x[ii, jj].astype(np.float64) @ w_flat[m]
        out[i, j] = acc
    return out


def _dense_path(x, mask, w_flat, k, order):
    """The framework path: _t_mink layout + masked-dense conv."""
    if order == 'first_fastest':
        kernel = _t_mink(w_flat, k, 'first_fastest')
    else:  # plain reshape = last coordinate fastest, no transpose
        kernel = w_flat.reshape(k, k, *w_flat.shape[1:])
    xm = jnp.asarray((x * mask[..., None])[None], jnp.float32)
    mk = jnp.asarray(mask[None, ..., None], jnp.float32)
    y = _sparse_conv_apply(xm, jnp.asarray(kernel, jnp.float32), mk, k // 2)
    return np.asarray(y[0], np.float64)


def test_first_fastest_matches_me_oracle():
    rng = np.random.RandomState(0)
    for k in (3, 5):
        H, W, I, O = 13, 11, 4, 3
        mask = (rng.rand(H, W) < 0.3).astype(np.float32)
        x = (rng.randn(H, W, I) * mask[..., None]).astype(np.float32)
        w_flat = rng.randn(k * k, I, O).astype(np.float32)

        ref = sparse_conv_oracle(x, mask, w_flat, k)
        ours = _dense_path(x, mask, w_flat, k, 'first_fastest')
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_alternate_order_differs():
    """Plain-reshape (last-fastest) kernels must NOT reproduce ME's conv —
    guards against the test above passing through an accidental symmetry."""
    rng = np.random.RandomState(1)
    k, H, W, I, O = 3, 13, 11, 4, 3
    mask = (rng.rand(H, W) < 0.3).astype(np.float32)
    x = (rng.randn(H, W, I) * mask[..., None]).astype(np.float32)
    w_flat = rng.randn(k * k, I, O).astype(np.float32)

    ref = sparse_conv_oracle(x, mask, w_flat, k)
    wrong = _dense_path(x, mask, w_flat, k, 'plain_reshape')
    assert np.abs(wrong - ref).max() > 1e-2


def test_offset_enumeration_order():
    """The m-th ME offset is (m % k - p, m // k - p): first coord fastest."""
    assert me_offsets(3) == [(-1, -1), (0, -1), (1, -1),
                             (-1, 0), (0, 0), (1, 0),
                             (-1, 1), (0, 1), (1, 1)]
    p = 2
    assert me_offsets(5) == [((m % 5) - p, (m // 5) - p) for m in range(25)]
