"""Wire formats: byte-lean host<->device codecs for the serving path.

The reference's per-image loop (``infer_edges.py:115-120``) ships full
float32 tensors across PCIe both ways.  On link-bound deployments (and this
environment's ~20-45 MB/s relayed TPU) the serving loop is transfer-bound, so
every mandatory byte is engineered:

* **Edges down**: the annotation artifact is a BINARY map (the PNG the
  reference writes, ``infer_edge_estimation.py:253-257``) — bit-packed
  in-graph to 1 bit/px (8x less than uint8), ``np.unpackbits`` on host.
  Lossless.
* **Depth down**: uint16 at 1/256 m — the KITTI depth PNG storage format
  itself (``kitti_dataset.py:40-46`` reads png/256) — 2 bytes/px instead of
  4.  Quantization is 3.9 mm, an order finer than the edge-AUC protocol's
  own uint8 quantization (depth*255/80 = 0.31 m steps,
  ``eval_depth_edges.py:244``).
* **RGB up**: uint8, normalized in-graph (``u8/255`` equals the host float
  path bit-for-bit); 4x less than float32.
* **Lidar up**: sparse (flat_index, u16 depth) point lists padded to a
  static capacity, scattered to the dense [H,W,1] map in-graph with
  out-of-bounds padding dropped — KITTI lidar covers ~5% of pixels, so
  6 bytes/point beats 4 bytes/pixel by ~13x at typical density.

Every codec is exact-round-trip tested (tests/test_wire.py): decode(encode(x))
equals the in-graph-quantized tensor bit-for-bit.
"""

import numpy as np
import jax.numpy as jnp

# -- binary edge maps ---------------------------------------------------------


def pack_edges(edges):
    """[..., W] binary (bool/0-1 float/uint8) -> uint8 [..., W//8] bit-packed
    along the last axis (W must be a multiple of 8; true for all shipped
    resolutions).  In-graph; 8x fewer downlink bytes."""
    assert edges.shape[-1] % 8 == 0, f'W={edges.shape[-1]} not a multiple of 8'
    return jnp.packbits(edges.astype(bool), axis=-1)


def unpack_edges(packed):
    """Host-side inverse of :func:`pack_edges` -> uint8 {0,1} [..., W]."""
    return np.unpackbits(np.asarray(packed), axis=-1)


# -- depth maps ---------------------------------------------------------------

DEPTH_SCALE = 256.0   # KITTI depth-png convention (kitti_dataset.py:40-46)


def encode_depth_u16(depth):
    """float depth [m] -> uint16 KITTI wire format (in-graph)."""
    d = jnp.round(depth.astype(jnp.float32) * DEPTH_SCALE)
    return jnp.clip(d, 0.0, 65535.0).astype(jnp.uint16)


def decode_depth_u16(u16):
    """Host-side inverse -> float32 metres (exactly the values
    ``encode -> decode`` produces in-graph)."""
    return np.asarray(u16).astype(np.float32) / DEPTH_SCALE


# -- sparse lidar uplink --------------------------------------------------------


def encode_lidar_sparse(dense, capacity):
    """Host: dense [H, W] or [H, W, 1] float depth -> (idx u32 [capacity],
    val u16 [capacity]).  Valid points are d > 0; padding slots carry
    idx = H*W (out of range -> dropped by the in-graph scatter).  Raises if
    the frame has more valid points than ``capacity``."""
    d = np.asarray(dense)
    if d.ndim == 3:
        d = d[..., 0]
    h, w = d.shape
    flat = d.reshape(-1)
    nz = np.flatnonzero(flat > 0)
    if len(nz) > capacity:
        raise ValueError(
            f'{len(nz)} lidar points exceed wire capacity {capacity}; '
            'raise capacity (points are ~5% of pixels for KITTI lidar)')
    idx = np.full((capacity,), h * w, dtype=np.uint32)
    val = np.zeros((capacity,), dtype=np.uint16)
    idx[:len(nz)] = nz
    val[:len(nz)] = np.clip(np.round(flat[nz] * DEPTH_SCALE), 0, 65535)
    return idx, val


def decode_lidar_sparse(idx, val, height, width):
    """In-graph: ([B,]capacity u32, [B,]capacity u16) -> dense
    [B, H, W, 1] float32.  Padding (idx >= H*W) is dropped by the scatter."""
    if idx.ndim == 1:
        idx, val = idx[None], val[None]
    dense = jnp.zeros((idx.shape[0], height * width), jnp.float32)
    v = val.astype(jnp.float32) / DEPTH_SCALE
    dense = jax_vmap_scatter(dense, idx, v)
    return dense.reshape(idx.shape[0], height, width, 1)


def jax_vmap_scatter(dense, idx, val):
    import jax
    return jax.vmap(lambda d, i, v: d.at[i].set(v, mode='drop'))(
        dense, idx.astype(jnp.int32), val)


# -- protocol-precision u8 depth (eval-only, opt-in) ---------------------------

U8_MAX_DEPTH = 80.0   # the edge-AUC protocol's own quantization grid:
                      # clip(d, 0, 80) * 255 / 80 -> uint8 (eval_depth_edges.py:244)


def encode_depth_u8(depth):
    """float depth [m] -> uint8 at the AUC protocol's own 80/255 m grid
    (in-graph).  0.31 m steps — EXACTLY the quantization
    ``edge_from_depth`` applies before Canny, so edge-AUC results are
    unaffected; depth metrics see the coarser grid (eval-only serving)."""
    d = jnp.round(jnp.clip(depth.astype(jnp.float32), 0.0, U8_MAX_DEPTH)
                  * (255.0 / U8_MAX_DEPTH))
    return d.astype(jnp.uint8)


def decode_depth_u8(u8):
    """Host-side inverse -> float32 metres on the protocol grid."""
    return np.asarray(u8).astype(np.float32) * (U8_MAX_DEPTH / 255.0)
