"""Wire codecs are exact: decode(encode(x)) is bit-identical to the
in-graph-quantized tensor (VERDICT r2 #1 'packed/unpacked paths bit-identical')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.ops import wire


def test_edge_bitpack_roundtrip_exact():
    rng = np.random.RandomState(0)
    edges = (rng.rand(3, 48, 160) > 0.7).astype(np.uint8)
    packed = jax.jit(wire.pack_edges)(jnp.asarray(edges))
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 48, 20)
    out = wire.unpack_edges(packed)
    np.testing.assert_array_equal(out, edges)


def test_edge_bitpack_rejects_ragged_width():
    with pytest.raises(AssertionError):
        wire.pack_edges(jnp.zeros((1, 4, 13)))


def test_depth_u16_roundtrip_is_device_quantization():
    rng = np.random.RandomState(1)
    depth = rng.rand(2, 32, 40).astype(np.float32) * 90.0   # past 80 m too
    enc = jax.jit(wire.encode_depth_u16)(jnp.asarray(depth))
    assert enc.dtype == jnp.uint16
    dec = wire.decode_depth_u16(enc)
    # bit-identical to the in-graph quantized reference
    ref = np.asarray(jnp.round(jnp.asarray(depth) * 256.0)) / 256.0
    np.testing.assert_array_equal(dec, ref.astype(np.float32))
    # and within half a quantization step of the original
    assert np.abs(dec - depth).max() <= 0.5 / 256.0 + 1e-7


def test_depth_u16_clips_at_range_limits():
    d = jnp.asarray([[-1.0, 0.0, 300.0]])
    dec = wire.decode_depth_u16(wire.encode_depth_u16(d))
    np.testing.assert_array_equal(dec, [[0.0, 0.0, 65535.0 / 256.0]])


def test_lidar_sparse_roundtrip_exact():
    rng = np.random.RandomState(2)
    h, w = 24, 40
    dense = rng.rand(h, w).astype(np.float32) * 80.0
    dense[rng.rand(h, w) < 0.95] = 0.0     # ~5% density, KITTI-like
    cap = 128
    idx, val = wire.encode_lidar_sparse(dense, cap)
    assert idx.dtype == np.uint32 and val.dtype == np.uint16
    out = np.asarray(jax.jit(
        lambda i, v: wire.decode_lidar_sparse(i, v, h, w))(
            jnp.asarray(idx), jnp.asarray(val)))[0, ..., 0]
    ref = np.asarray(jnp.round(jnp.asarray(dense) * 256.0)) / 256.0
    ref[dense == 0] = 0.0
    np.testing.assert_array_equal(out, ref.astype(np.float32))


def test_lidar_sparse_point_zero_and_capacity():
    h, w = 4, 8
    dense = np.zeros((h, w), np.float32)
    dense[0, 0] = 5.0   # index 0 must survive padding (pad idx is h*w)
    idx, val = wire.encode_lidar_sparse(dense, 4)
    out = np.asarray(wire.decode_lidar_sparse(
        jnp.asarray(idx), jnp.asarray(val), h, w))[0, ..., 0]
    assert out[0, 0] == 5.0 and out.sum() == 5.0

    with pytest.raises(ValueError):
        wire.encode_lidar_sparse(np.ones((h, w), np.float32), 4)


def test_lidar_sparse_batched():
    rng = np.random.RandomState(3)
    h, w = 8, 16
    frames = []
    idxs, vals = [], []
    for b in range(3):
        d = rng.rand(h, w).astype(np.float32) * 10.0
        d[rng.rand(h, w) < 0.9] = 0.0
        frames.append(d)
        i, v = wire.encode_lidar_sparse(d, 32)
        idxs.append(i)
        vals.append(v)
    out = np.asarray(wire.decode_lidar_sparse(
        jnp.asarray(np.stack(idxs)), jnp.asarray(np.stack(vals)), h, w))
    for b in range(3):
        ref = np.asarray(jnp.round(jnp.asarray(frames[b]) * 256.0)) / 256.0
        ref[frames[b] == 0] = 0.0
        np.testing.assert_array_equal(out[b, ..., 0], ref.astype(np.float32))


def test_depth_u8_protocol_grid_roundtrip():
    """u8 depth wire rides the AUC protocol's own 80/255 m quantization:
    decode(encode(d)) == the grid the protocol itself snaps depth to before
    Canny (eval_depth_edges.py:244) — so edge-AUC is unaffected."""
    import jax.numpy as jnp
    from mindtheedge_tpu.ops import wire
    rng = np.random.RandomState(0)
    d = rng.rand(2, 8, 16).astype(np.float32) * 100.0   # incl. >80 clip range
    enc = np.asarray(wire.encode_depth_u8(jnp.asarray(d)))
    assert enc.dtype == np.uint8
    dec = wire.decode_depth_u8(enc)
    # protocol's own u8 snap
    protocol = np.round(np.clip(d, 0, 80) * 255.0 / 80.0).astype(np.uint8)
    np.testing.assert_array_equal(enc, protocol)
    np.testing.assert_allclose(dec, protocol.astype(np.float32) * 80.0 / 255.0,
                               rtol=1e-6)


def test_depth_u8_preserves_protocol_edges():
    """Canny input after u8 wire == Canny input from f32 depth (the AUC
    protocol quantizes either way)."""
    import jax.numpy as jnp
    from mindtheedge_tpu.ops import wire
    rng = np.random.RandomState(1)
    d = rng.rand(6, 10).astype(np.float32) * 90.0
    via_wire = wire.decode_depth_u8(np.asarray(wire.encode_depth_u8(jnp.asarray(d))))
    q1 = np.round(np.clip(via_wire, 0, 80) * 255.0 / 80.0).astype(np.uint8)
    q2 = np.round(np.clip(d, 0, 80) * 255.0 / 80.0).astype(np.uint8)
    np.testing.assert_array_equal(q1, q2)
