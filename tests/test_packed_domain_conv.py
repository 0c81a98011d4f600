"""The packed-domain W-phase conv: conv chains that never unpack.

``expand_kernel_packed_w`` expresses a stride-1 SAME conv entirely in the
W-phase-packed layout (packed input -> packed output).  Pinned here against
the plain conv + pack_w oracle for every (kernel, rw) combination the
network uses: k in {1, 3, 5, 7} x rw in {2, 4}.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.ops.phase_conv import (
    expand_kernel_packed_w, packed_w_conv_geometry, pack_w, unpack_w)


def _conv(x, k, strides=(1, 1), pad=None):
    kh, kw = k.shape[0], k.shape[1]
    if pad is None:
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    return jax.lax.conv_general_dilated(
        x, k, strides, pad, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_pack_unpack_w_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 12, 5).astype(np.float32))
    for r in (2, 4):
        np.testing.assert_array_equal(np.asarray(unpack_w(pack_w(x, r), r)),
                                      np.asarray(x))


@pytest.mark.parametrize('kw', [1, 3, 5, 7])
@pytest.mark.parametrize('rw', [2, 4])
def test_packed_domain_conv_matches_plain(kw, rw):
    rng = np.random.RandomState(kw * 10 + rw)
    B, H, W, CI, CO = 2, 6, 24, 3, 5
    x = jnp.asarray(rng.randn(B, H, W, CI).astype(np.float32))
    k = jnp.asarray(rng.randn(kw, kw, CI, CO).astype(np.float32))

    want = pack_w(_conv(x, k), rw)

    kp = expand_kernel_packed_w(k, rw)
    t0, kt = packed_w_conv_geometry(kw, rw)
    got = _conv(pack_w(x, rw), kp,
                pad=[(kw // 2, kw // 2), (-t0, kt - 1 + t0)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('kw', [1, 3, 5])
def test_packed2d_domain_conv_matches_plain(kw):
    """Stride-1 SAME conv in the pack2d domain == pack2d(conv(x))."""
    from mindtheedge_tpu.ops.phase_conv import (
        expand_kernel_packed_2d, packed2d_conv_geometry)
    from mindtheedge_tpu.ops.packing import pack2d

    rng = np.random.RandomState(kw)
    B, H, W, CI, CO = 2, 8, 12, 3, 5
    x = jnp.asarray(rng.randn(B, H, W, CI).astype(np.float32))
    k = jnp.asarray(rng.randn(kw, kw, CI, CO).astype(np.float32))

    want = pack2d(_conv(x, k), 2)

    k2 = expand_kernel_packed_2d(k, 2)
    t0, kt = packed2d_conv_geometry(kw, 2)
    pad = (-t0, kt - 1 + t0)
    got = _conv(pack2d(x, 2), k2, pad=[pad, pad])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
