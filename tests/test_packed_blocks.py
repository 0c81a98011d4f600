"""Packed-domain ResidualConv and MinkConvBlock == their unpacked forms.

The W-phase-packed chains (``ops/phase_conv.expand_kernel_packed_w``) change
only the layout/laneing of the compute, never the math or the parameter
tree.  These tests share ONE set of initialized params between the packed
and unpacked module variants and assert output equality at float tolerance
(reduction order differs through the zero-padded packed kernels).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.ops.blocks import ResidualConv, ResidualBlock, ConvBlock
from mindtheedge_tpu.ops.sparse import MinkConvBlock


def _x(rng, shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


@pytest.mark.parametrize('cin,cout', [(32, 64), (64, 64), (64, 32)])
def test_packed_residual_conv_matches_unpacked(cin, cout):
    rng = np.random.RandomState(0)
    x = _x(rng, (2, 8, 24, cin))
    packed = ResidualConv(cout)
    plain = ResidualConv(cout, auto_lane_pack=False)
    key = jax.random.PRNGKey(0)
    v = plain.init(key, x, False)
    # identical parameter trees (checkpoints swap freely between paths)
    vp = packed.init(key, x, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(v)[0],
            jax.tree_util.tree_flatten_with_path(vp)[0]):
        assert a.shape == b.shape, jax.tree_util.keystr(kp)

    out_plain = plain.apply(v, x, False)
    out_packed = packed.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_plain),
                               rtol=1e-4, atol=1e-5)


def test_packed_residual_conv_dropout_matches_unpacked():
    """Same rng stream -> the packed path's manual Dropout2d draws the SAME
    per-channel mask as nn.Dropout(broadcast_dims=(1,2))."""
    rng = np.random.RandomState(1)
    x = _x(rng, (2, 8, 24, 32))
    packed = ResidualConv(32, dropout=0.5)
    plain = ResidualConv(32, dropout=0.5, auto_lane_pack=False)
    key = jax.random.PRNGKey(0)
    v = plain.init(key, x, False)
    dk = {'dropout': jax.random.PRNGKey(7)}
    out_plain = plain.apply(v, x, True, rngs=dk)
    out_packed = packed.apply(v, x, True, rngs=dk)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_plain),
                               rtol=1e-4, atol=1e-5)
    # dropout actually dropped something (mask not all-ones)
    out_nodrop = packed.apply(v, x, False)
    assert np.abs(np.asarray(out_packed) - np.asarray(out_nodrop)).max() > 1e-3


def test_packed_residual_block_matches_unpacked():
    rng = np.random.RandomState(2)
    x = _x(rng, (1, 8, 16, 32))
    packed = ResidualBlock(64, 2)
    plain = ResidualBlock(64, 2, auto_lane_pack=False)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    np.testing.assert_allclose(
        np.asarray(packed.apply(v, x, False)),
        np.asarray(plain.apply(v, x, False)), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('c,k', [(32, 5), (64, 5), (64, 3)])
def test_packed_minkconv_matches_unpacked(c, k):
    rng = np.random.RandomState(c + k)
    d = rng.rand(2, 16, 48, 1).astype(np.float32) * 80
    d[rng.rand(2, 16, 48, 1) < 0.8] = 0.0
    x = jnp.asarray(d)
    mask = (x > 0).astype(x.dtype)

    packed = MinkConvBlock(c, k)
    plain = MinkConvBlock(c, k, lane_pack=False)
    key = jax.random.PRNGKey(0)
    v = plain.init(key, x, mask, False)
    vp = packed.init(key, x, mask, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)

    yp, mp = packed.apply(v, x, mask, False)
    yu, mu = plain.apply(v, x, mask, False)
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(mu))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu),
                               rtol=1e-4, atol=1e-5)


def test_packed_minkconv_train_stats_match():
    """Masked-BN batch stats accumulated through the packed level equal the
    unpacked level's (phase reduction is exact)."""
    rng = np.random.RandomState(3)
    d = rng.rand(2, 16, 48, 1).astype(np.float32) * 80
    d[rng.rand(2, 16, 48, 1) < 0.8] = 0.0
    x = jnp.asarray(d)
    mask = (x > 0).astype(x.dtype)

    packed = MinkConvBlock(32, 5)
    plain = MinkConvBlock(32, 5, lane_pack=False)
    v = plain.init(jax.random.PRNGKey(0), x, mask, True)

    (_, _), mut_p = packed.apply(v, x, mask, True, mutable=['batch_stats'])
    (_, _), mut_u = plain.apply(v, x, mask, True, mutable=['batch_stats'])
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(mut_p)[0],
            jax.tree_util.tree_flatten_with_path(mut_u)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(kp))


@pytest.mark.parametrize('co,w', [(1, 24), (2, 160), (1, 64)])
def test_packed_invdepth_head_matches_plain(co, w):
    """The W-phase-packed InvDepthHead (1/128-lane head otherwise) equals
    the plain conv + sigmoid/min_depth."""
    import flax.linen as nn
    from mindtheedge_tpu.ops.blocks import InvDepthHead

    rng = np.random.RandomState(co * 100 + w)
    x = _x(rng, (1, 4, w, 32))
    head = InvDepthHead(co)
    v = head.init(jax.random.PRNGKey(0), x)
    got = head.apply(v, x)
    k, b = v['params']['conv1']['kernel'], v['params']['conv1']['bias']
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    want = nn.sigmoid(y) / 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_packed_chained_block3_with_dropout_matches_unpacked():
    """3-block ResidualBlock (the conv4/conv5 shape) chains packed across
    blocks incl. the packed-domain 1x1 shortcut; with dropout active the
    per-block rng streams still line up with the unpacked path."""
    rng = np.random.RandomState(4)
    x = _x(rng, (1, 8, 16, 64))
    packed = ResidualBlock(64, 3, dropout=0.5)
    plain = ResidualBlock(64, 3, dropout=0.5, auto_lane_pack=False)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    vp = packed.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)

    np.testing.assert_allclose(
        np.asarray(packed.apply(v, x, False)),
        np.asarray(plain.apply(v, x, False)), rtol=1e-4, atol=1e-5)
    dk = {'dropout': jax.random.PRNGKey(9)}
    np.testing.assert_allclose(
        np.asarray(packed.apply(v, x, True, rngs=dk)),
        np.asarray(plain.apply(v, x, True, rngs=dk)), rtol=1e-4, atol=1e-5)


def test_packed2d_split_conv_matches_plain():
    """ConvBlock with a pack2d-layout part (packed2d_parts) == the plain
    list ConvBlock fed the depth-to-space'd part."""
    from mindtheedge_tpu.ops.packing import pack2d, unpack2d

    rng = np.random.RandomState(5)
    h, w = 6, 10
    main2d = _x(rng, (2, h, w, 4 * 24))           # pack2d of [2,2h,2w,24]
    skip = _x(rng, (2, 2 * h, 2 * w, 8))
    up = _x(rng, (2, 2 * h, 2 * w, 1))

    packed = ConvBlock(32, 3, 1, packed2d_parts=(0,))
    plain = ConvBlock(32, 3, 1)
    v = plain.init(jax.random.PRNGKey(0), [unpack2d(main2d, 2), skip, up])
    vp = packed.init(jax.random.PRNGKey(0), [main2d, skip, up])
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(v)[0],
            jax.tree_util.tree_flatten_with_path(vp)[0]):
        assert a.shape == b.shape, jax.tree_util.keystr(kp)

    out_plain = plain.apply(v, [unpack2d(main2d, 2), skip, up])
    out_packed = packed.apply(v, [main2d, skip, up])
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_plain),
                               rtol=1e-4, atol=1e-5)


def test_packed2d_decoder_matches_plain():
    """The full pack2d-domain decoder == the depth-to-space decoder with the
    same params (PackNetSlim01-shaped inputs)."""
    from mindtheedge_tpu.models.packnet import PackNetDecoder, SLIM_CHANNELS

    rng = np.random.RandomState(6)
    slim = (16,) * 6
    H, W = 64, 96
    x5p = _x(rng, (1, H // 32, W // 32, slim[5]))
    skips = [_x(rng, (1, H, W, slim[0]))] + [
        _x(rng, (1, H >> s, W >> s, slim[s])) for s in range(1, 5)]

    plain = PackNetDecoder(out_channels=1, version='A', channels=slim,
                           packed2d=False)
    packed = PackNetDecoder(out_channels=1, version='A', channels=slim)
    v = plain.init(jax.random.PRNGKey(0), x5p, skips)
    vp = packed.init(jax.random.PRNGKey(0), x5p, skips)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)

    out_plain = plain.apply(v, x5p, skips)
    out_packed = packed.apply(v, x5p, skips)
    for s, (a, b) in enumerate(zip(out_plain, out_packed)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=f'scale {s}')


def test_pack_layer_border_strips_lane_packed_parity():
    """_PackConvBlock with phase-packed border strips (W-packed top/bottom,
    H-packed left/right) == the plain unfused conv3d+conv+GN pipeline."""
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import (
        PackLayerConv3d, _conv3d_tridiag_kernel)
    from mindtheedge_tpu.ops.packing import pack2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 128, 32).astype(np.float32))
    m = PackLayerConv3d(32, 5, d=4)
    v = jax.jit(lambda k, xx: m.init(k, xx))(jax.random.PRNGKey(0), x)
    y = np.asarray(jax.jit(lambda v_, xx: m.apply(v_, xx))(v, x))

    k3 = v['params']['conv3d']['kernel']
    b3 = v['params']['conv3d']['bias']
    kern = v['params']['conv']['conv']['kernel']
    bias = v['params']['conv']['conv']['bias']
    gn_sc = v['params']['conv']['norm']['scale']
    gn_b = v['params']['conv']['norm']['bias']

    def unfused(xx):
        k2 = _conv3d_tridiag_kernel(k3, xx.shape[-1]).astype(xx.dtype)
        y1 = jax.lax.conv_general_dilated(
            xx, k2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) \
            + jnp.repeat(b3, xx.shape[-1])
        z = jax.lax.conv_general_dilated(
            y1, kern, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
        xf = z.astype(jnp.float32)
        b_, h_, w_, c_ = xf.shape
        g, gs = 16, xf.shape[-1] // 16
        mc = xf.mean(axis=(1, 2))
        m2 = (xf ** 2).mean(axis=(1, 2))
        mg = mc.reshape(b_, g, gs).mean(-1)
        m2g = m2.reshape(b_, g, gs).mean(-1)
        inv = jax.lax.rsqrt(jnp.maximum(m2g - mg ** 2, 0.0) + 1e-5)
        invc = jnp.repeat(inv, gs, 1) * gn_sc[None]
        off = gn_b[None] - jnp.repeat(mg, gs, 1) * invc
        return jax.nn.elu(xf * invc[:, None, None, :] + off[:, None, None, :])

    ref = np.asarray(jax.jit(lambda: unfused(pack2d(x, 2)))())
    np.testing.assert_allclose(y, ref, atol=3e-5, rtol=1e-5)
