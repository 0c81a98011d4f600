"""SAN ladder fusion: the concatenated first-stage conv is bit-exact vs the
three separate convs, and the parameter tree is unchanged (checkpoints load)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mindtheedge_tpu.ops.sparse import (
    MinkConvBlock, SparseDepthEncoder, _sparse_conv_apply)


def test_concat_conv_equals_separate_convs_bitwise():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 24, 32, 8).astype(np.float32))
    mask = jnp.asarray((rng.rand(2, 24, 32, 1) > 0.9).astype(np.float32))
    ks = [jnp.asarray(rng.randn(3, 3, 8, c).astype(np.float32) * 0.1)
          for c in (16, 32, 32)]
    xm = x * mask

    fused = jax.jit(lambda xm_, k: _sparse_conv_apply(
        xm_, k, mask, 1))(xm, jnp.concatenate(ks, axis=-1))
    seps = [jax.jit(lambda xm_, k: _sparse_conv_apply(xm_, k, mask, 1))(xm, k)
            for k in ks]
    np.testing.assert_array_equal(np.asarray(fused[..., :16]),
                                  np.asarray(seps[0]))
    np.testing.assert_array_equal(np.asarray(fused[..., 16:48]),
                                  np.asarray(seps[1]))
    np.testing.assert_array_equal(np.asarray(fused[..., 48:]),
                                  np.asarray(seps[2]))


def test_minkconv_param_tree_unchanged():
    """The fused block keeps SparseConv's {layerX_Y: {conv: {kernel}}} tree."""
    block = MinkConvBlock(out_channels=16, kernel_size=3)
    x = jnp.zeros((1, 16, 16, 1))
    mask = jnp.ones((1, 16, 16, 1))
    v = jax.jit(lambda k: block.init(k, x, mask, False))(jax.random.PRNGKey(0))
    params = v['params']
    for name, cin, cout in [('layer1_0', 1, 16), ('layer2_0', 1, 32),
                            ('layer3_0', 1, 32), ('layer2_1', 32, 16),
                            ('layer3_1', 32, 32), ('layer3_2', 32, 16)]:
        kern = params[name]['conv']['kernel']
        assert kern.shape == (3, 3, cin, cout), (name, kern.shape)


@pytest.mark.slow
def test_san_ladder_forward_shapes_and_masking():
    """Densified outputs stay zero at inactive sites (sparse semantics)."""
    rng = np.random.RandomState(1)
    depth = rng.rand(1, 64, 64, 1).astype(np.float32) * 80
    depth[rng.rand(1, 64, 64, 1) < 0.95] = 0.0
    san = SparseDepthEncoder(channels=(16, 16, 16, 16, 16))
    v = jax.jit(lambda k, d: san.init(k, d, False))(
        jax.random.PRNGKey(0), jnp.asarray(depth))
    outs = jax.jit(lambda v_, d: san.apply(v_, d, False))(v, jnp.asarray(depth))
    h, w = 32, 32
    mask = (depth[..., 0] > 0)
    for i, o in enumerate(outs):
        assert o.shape == (1, h >> i, w >> i, 16)
        assert np.isfinite(np.asarray(o)).all()
    # level-0 actives derive from the pooled mask: any active in 2x2 cell
    cell = mask.reshape(1, 32, 2, 32, 2).any(axis=(2, 4))
    inactive = ~cell
    np.testing.assert_array_equal(
        np.asarray(outs[0])[inactive], 0.0)
