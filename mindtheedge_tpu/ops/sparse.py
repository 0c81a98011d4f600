"""Masked-dense sparse convolution ops — TPU-native MinkowskiEngine replacement.

The reference's SAN branch uses MinkowskiEngine C++/CUDA sparse convolutions
over valid-LIDAR coordinates (``networks/layers/minkowski.py``,
``minkowski_encoder.py``).  On TPU, gather/scatter sparse kernels map poorly
to the MXU at these densities (LIDAR covers ~5% of pixels, and after one
stride-2 pooling the active set grows fast), so we keep tensors dense and
carry an explicit activity mask, preserving the sparse semantics exactly:

* sparse conv == ``conv2d(x * mask)`` read at active sites (inactive inputs
  contribute zero, exactly like coordinate-set sparse convs; ME convs have no
  bias by default).
* ``MinkowskiBatchNorm`` == batch-norm whose statistics are computed over
  active sites only (masked mean/var, running stats for eval).
* ``MinkowskiMaxPooling(3, stride=2)`` == 3x3/2 max-pool over ``-inf``-masked
  inputs; an output site is active iff any input in its 2x2 stride cell is
  active (ME generates output coords by stride-snapping input coords).

Everything stays dense NHWC, so XLA fuses the whole ladder.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

_xavier = nn.initializers.xavier_uniform()


def _phase_pool_nonneg(x, mask):
    """[B,H,W,C] masked 3x3/2 max-pool via H/W phase splits (plain
    elementwise maxima on phase-reshaped tensors — full lane utilization,
    no strided slices: the 13-op stride-2 slice chain measured 9.6 ms at
    [8,192,640,32] against a 1.0 ms byte floor, this formulation ~1 ms).

    Requires the non-negativity invariant documented at the call site in
    ``masked_max_pool_3x3_s2``; verified identical to the slice-chain path
    (values, masks, and gradients) by ``tests/test_sparse_pool_fusion.py``.
    """
    b, h, w, c = x.shape
    xm = x * mask                                        # [B,H,W,C], >= 0
    xr = xm.reshape(b, h // 2, 2, w, c)
    E, O = xr[:, :, 0], xr[:, :, 1]                      # rows 2i / 2i+1
    Oup = jnp.pad(O, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]   # row 2i-1
    R = jnp.maximum(jnp.maximum(E, O), Oup)              # [B,H/2,W,C]
    Rr = R.reshape(b, h // 2, w // 2, 2, c)
    RE, RO = Rr[:, :, :, 0], Rr[:, :, :, 1]              # cols 2j / 2j+1
    ROl = jnp.pad(RO, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]  # col 2j-1
    pooled = jnp.maximum(jnp.maximum(RE, RO), ROl)       # [B,H/2,W/2,C]
    hard_mask = jax.lax.stop_gradient(mask)
    mr = hard_mask[..., 0].reshape(b, h // 2, 2, w)
    cm = jnp.maximum(mr[:, :, 0], mr[:, :, 1])
    cmr = cm.reshape(b, h // 2, w // 2, 2)
    new_mask = (jnp.maximum(cmr[..., 0], cmr[..., 1]) > 0).astype(x.dtype)
    pooled = (pooled * new_mask[..., None]).astype(x.dtype)
    # same fusion barrier as the slice-chain paths (see comment below)
    pooled, new_mask = jax.lax.optimization_barrier(
        (pooled, new_mask[..., None]))
    return pooled, new_mask


def masked_max_pool_3x3_s2(x, mask, spatial_axis=None):
    """3x3 stride-2 max-pool over active sites; returns (pooled, new_mask).

    ``x``: [B,H,W,C]; ``mask``: [B,H,W,1] in {0,1}.
    Output site (i,j) is active iff any input in its 2x2 stride cell
    {2i,2i+1}x{2j,2j+1} is active; its value is the max over *active* inputs
    in the centered 3x3 window (inactive inputs masked to the finite float
    minimum — acts as -inf for the max, but stays NaN-safe under any
    multiply-by-zero the compiler may introduce; active values are >= 0
    everywhere this pool is used, so the result is identical).

    ``spatial_axis``: H-sharded mode — x and mask are exchanged separately
    so zero-filled halo rows at the mesh edges carry mask 0 and re-mask to
    the minimum, reproducing the global padding exactly.
    """
    if spatial_axis is not None:
        from mindtheedge_tpu.parallel.spatial import halo_exchange_h, spec_hw
        h_ax, w_ax = spec_hw(spatial_axis)
        if h_ax is not None:
            assert x.shape[1] % 2 == 0, 'spatial pool needs even local height'
        if w_ax is not None:
            assert x.shape[2] % 2 == 0, 'spatial pool needs even local width'
        # x and mask exchange separately: halo slices at the mesh edges come
        # back zero-FILLED with mask 0, and the where() below re-masks them
        # to the float minimum — reproducing the global -inf padding exactly
        xh = halo_exchange_h(x, 1, spatial_axis)
        mh = halo_exchange_h(mask, 1, spatial_axis)
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=x.dtype)
        xp = jnp.pad(jnp.where(mh > 0, xh, neg),
                     ((0, 0),
                      (0, 0) if h_ax is not None else (1, 1),
                      (0, 0) if w_ax is not None else (1, 1),
                      (0, 0)),
                     constant_values=float(jnp.finfo(jnp.float32).min))
        b, h, w, c = x.shape
        h_out = h // 2 if h_ax is not None else (h + 1) // 2
        w_out = w // 2 if w_ax is not None else (w + 1) // 2
        pooled = None
        for di in range(3):
            for dj in range(3):
                sl = jax.lax.slice(
                    xp, (0, di, dj, 0),
                    (b, di + 2 * (h_out - 1) + 1, dj + 2 * (w_out - 1) + 1, c),
                    (1, 2, 2, 1))
                pooled = sl if pooled is None else jnp.maximum(pooled, sl)
        hard_mask = jax.lax.stop_gradient(mask)
        mp = jnp.pad(hard_mask, ((0, 0), (0, h_out * 2 - h),
                                 (0, w_out * 2 - w), (0, 0)))
        cell = None
        for di in range(2):
            for dj in range(2):
                sl = jax.lax.slice(
                    mp, (0, di, dj, 0),
                    (b, di + 2 * (h_out - 1) + 1, dj + 2 * (w_out - 1) + 1, 1),
                    (1, 2, 2, 1))
                cell = sl if cell is None else jnp.maximum(cell, sl)
        new_mask = (cell > 0).astype(x.dtype)
        pooled = jnp.where(new_mask > 0, pooled, 0.).astype(x.dtype)
        # same fusion barrier as the unsharded branch below (see comment there)
        pooled, new_mask = jax.lax.optimization_barrier((pooled, new_mask))
        return pooled, new_mask

    b, h, w, c = x.shape
    h_out, w_out = (h + 1) // 2, (w + 1) // 2
    if h % 2 == 0 and w % 2 == 0:
        # Lane-friendly path for every even-shape pool (all five ladder
        # levels at the paper resolutions).  The 13-op strided-slice chain
        # below reads at stride 2 along the minor dims — measured 1.8 ms at
        # [8,384,1280,1] (~1% lanes) and 9.6 ms at [8,192,640,32] against a
        # 1.0 ms byte floor; the phase formulation is ~1 ms there.  Valid
        # because active values are >= 0 with inactive sites exactly 0 at
        # every call site (level 0: depth > 0; deeper: relu(.)*mask), so
        # the masked max equals a plain max of x*mask + cell-mask zeroing.
        return _phase_pool_nonneg(x, mask)
    return _chain_pool(x, mask)


def _chain_pool(x, mask):
    """Strided-slice-chain masked pool: the general (odd-shape-capable,
    no-invariant) formulation and the oracle the phase path is tested
    against (``tests/test_sparse_pool_fusion.py``)."""
    b, h, w, c = x.shape
    h_out, w_out = (h + 1) // 2, (w + 1) // 2
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=x.dtype)
    x_masked = jnp.where(mask > 0, x, neg)
    # Differentiable 3x3/2 max-pool as a chain of 9 shifted-slice maxima
    # (reduce_window max has no reverse-mode rule on this backend; an
    # elementwise-max chain fuses in XLA and differentiates exactly).
    xp = jnp.pad(x_masked, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=float(jnp.finfo(jnp.float32).min))
    pooled = None
    for di in range(3):
        for dj in range(3):
            sl = jax.lax.slice(
                xp, (0, di, dj, 0),
                (b, di + 2 * (h_out - 1) + 1, dj + 2 * (w_out - 1) + 1, c),
                (1, 2, 2, 1))
            pooled = sl if pooled is None else jnp.maximum(pooled, sl)
    # Output coords exist where the 2x2 stride cell holds an active input.
    # (mask carries no gradient — it derives from lidar validity.)
    hard_mask = jax.lax.stop_gradient(mask)
    mp = jnp.pad(hard_mask, ((0, 0), (0, h_out * 2 - h), (0, w_out * 2 - w),
                             (0, 0)))
    cell = None
    for di in range(2):
        for dj in range(2):
            sl = jax.lax.slice(
                mp, (0, di, dj, 0),
                (b, di + 2 * (h_out - 1) + 1, dj + 2 * (w_out - 1) + 1, 1),
                (1, 2, 2, 1))
            cell = sl if cell is None else jnp.maximum(cell, sl)
    new_mask = (cell > 0).astype(x.dtype)
    pooled = jnp.where(new_mask > 0, pooled, 0.).astype(x.dtype)
    # XLA:TPU miscompiles the fusion of this strided-slice max chain into a
    # downstream wide conv at batch>=4 full-res shapes (NaN at ~10% of sites;
    # every stage is finite when materialized).  The barrier forces the pooled
    # tensor to materialize, which both dodges the bad fusion and costs
    # nothing: the conv re-reads it from HBM either way.
    pooled, new_mask = jax.lax.optimization_barrier((pooled, new_mask))
    return pooled, new_mask


class MaskedBatchNorm(nn.Module):
    """BatchNorm with statistics over active sites only (sparse BN semantics).

    ``channel_repeat`` r > 1 serves W-phase-packed activations
    (``ops/phase_conv.py``): x is [B,h,w/r,C*r] with packed channel order
    c*r + dx, and ``mask`` is the PACKED mask [B,h,w/r,r].  Parameters and
    running stats stay per ORIGINAL channel (checkpoint tree unchanged);
    per-channel sums reduce over the r phase lanes too, so the statistics
    are exactly the unpacked active-site statistics.
    """
    momentum: float = 0.9   # torch BatchNorm default momentum=0.1 -> decay 0.9
    epsilon: float = 1e-5
    channel_repeat: int = 1
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        r = self.channel_repeat
        c = x.shape[-1] // r
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if r > 1:
            assert self.spatial_axis is None, \
                'packed MaskedBatchNorm is single-shard'
            assert mask.shape[-1] == r, 'packed mask [B,h,w/r,r] expected'
            m_t = jnp.tile(mask, (1, 1, 1, c)).astype(jnp.float32)
        else:
            m_t = mask.astype(jnp.float32)

        def per_channel(v):       # [C*r] -> [C] phase reduction
            return v.reshape(c, r).sum(-1) if r > 1 else v

        if train:
            count = mask.astype(jnp.float32).sum()
            sum_x = per_channel((x.astype(jnp.float32) * m_t).sum(axis=(0, 1, 2)))
            if self.spatial_axis is not None:
                # active-site stats are global over (B, H, W): psum the
                # sharded sums/count (eval mode uses running stats, no comms)
                count = jax.lax.psum(count, self.spatial_axis)
                sum_x = jax.lax.psum(sum_x, self.spatial_axis)
            count = jnp.maximum(count, 1.0)
            mean = sum_x / count
            mean_l = jnp.repeat(mean, r) if r > 1 else mean
            sum_sq = per_channel(
                ((x.astype(jnp.float32) - mean_l) ** 2 * m_t).sum(axis=(0, 1, 2)))
            if self.spatial_axis is not None:
                sum_sq = jax.lax.psum(sum_sq, self.spatial_axis)
            var = sum_sq / count
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        gain, off = inv * scale, bias - mean * inv * scale
        if r > 1:
            gain, off = jnp.repeat(gain, r), jnp.repeat(off, r)
        y = x.astype(jnp.float32) * gain + off
        return (y * m_t).astype(x.dtype)


class _SparseConvKernel(nn.Module):
    """Parameter holder matching SparseConv's tree ({conv: {kernel}})."""
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_channels):
        k = self.kernel_size
        holder = _KernelOnly(self.out_channels, k, name='conv')
        return holder(in_channels)


class _KernelOnly(nn.Module):
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_channels):
        k = self.kernel_size
        return self.param('kernel', _xavier,
                          (k, k, in_channels, self.out_channels), jnp.float32)


def _conv_plain(x, kernel, p, spatial_axis=None):
    """Bias-free SAME conv (halo-exchanged along sharded dims); no mask ops
    — callers rely on the zeros-at-inactive invariant + downstream BN."""
    pad_h = pad_w = (p, p)
    if spatial_axis is not None:
        from mindtheedge_tpu.parallel.spatial import halo_exchange_h, spec_hw
        h_ax, w_ax = spec_hw(spatial_axis)
        x = halo_exchange_h(x, p, spatial_axis)
        pad_h = (0, 0) if h_ax is not None else pad_h
        pad_w = (0, 0) if w_ax is not None else pad_w
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [pad_h, pad_w],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')), 'conv_out')


def _sparse_conv_apply(xm, kernel, mask, p, spatial_axis=None):
    """conv(x * mask) * mask with SAME zero padding (halo-exchanged along
    each sharded dim under spatial sharding)."""
    pad_h = pad_w = (p, p)
    if spatial_axis is not None:
        from mindtheedge_tpu.parallel.spatial import halo_exchange_h, spec_hw
        h_ax, w_ax = spec_hw(spatial_axis)
        xm = halo_exchange_h(xm, p, spatial_axis)
        pad_h = (0, 0) if h_ax is not None else pad_h
        pad_w = (0, 0) if w_ax is not None else pad_w
    from jax.ad_checkpoint import checkpoint_name
    y = checkpoint_name(jax.lax.conv_general_dilated(
        xm, kernel.astype(xm.dtype), (1, 1), [pad_h, pad_w],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')), 'conv_out')
    return y * mask


class SparseConv(nn.Module):
    """Stride-1 coordinate-preserving sparse conv (no bias, like ME convs)."""
    out_channels: int
    kernel_size: int
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask):
        p = self.kernel_size // 2
        kernel = _KernelOnly(self.out_channels, self.kernel_size,
                             name='conv')(x.shape[-1])
        return _sparse_conv_apply(x * mask, kernel, mask, p, self.spatial_axis)


class MinkConvBlock(nn.Module):
    """One SAN ladder level (reference ``MinkConv2D``, ``minkowski_encoder.py:11-86``).

    3x3/2 max-pool, then three parallel sparse-conv stacks (1/2/3 convs)
    summed, then masked BN + ReLU.

    TPU fusions (same math, same parameter tree):

    * the three first-stage convs (``layer1_0``, ``layer2_0``, ``layer3_0``)
      all read the same masked input — their kernels are concatenated on the
      output-channel dim and run as ONE conv (one HBM pass of x instead of
      three).
    * for the narrow levels (c < 128) the WHOLE level runs W-phase-packed
      (``ops/phase_conv.py``): the fused conv emits packed, the chained
      convs use packed-domain kernels, BN/ReLU/mask ops run on full 128-lane
      tensors, and ONE unpack at the level exit restores the layout.  The
      early levels ran at 25-50% lane utilization otherwise
      (tools/probe_san.py: 5x5 64->32 4.8 -> 2.1 ms packed).
    """
    out_channels: int
    kernel_size: int
    lane_pack: bool = True
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        sp = self.spatial_axis
        x, mask = masked_max_pool_3x3_s2(x, mask, spatial_axis=sp)
        k, c = self.kernel_size, self.out_channels
        p = k // 2
        cin = x.shape[-1]

        rw = 0
        if sp is None and self.lane_pack and c < 128 and c % 16 == 0:
            rw = min(4, 128 // c)
            while rw > 1 and x.shape[2] % rw != 0:
                rw //= 2
            rw = 0 if rw == 1 else rw

        k1 = _SparseConvKernel(c, k, name='layer1_0')(cin)
        k2 = _SparseConvKernel(2 * c, k, name='layer2_0')(cin)
        k3 = _SparseConvKernel(2 * c, k, name='layer3_0')(cin)

        if rw:
            from mindtheedge_tpu.ops.phase_conv import (
                expand_kernel_phase, expand_kernel_packed_w,
                packed_w_conv_geometry, unpack_w)
            b, h, w, _ = x.shape
            mp = mask[..., 0].reshape(b, h, w // rw, rw)

            # No mask multiply between ops: every conv output flows into a
            # MaskedBatchNorm whose statistics ignore inactive sites and
            # whose output re-zeroes them, and relu keeps zeros — so the
            # active-site values and the level output are IDENTICAL while
            # the O(#tensors) tiled-mask passes disappear (they cost +5 GB
            # HBM/batch when materialized).  Conv inputs are zero at
            # inactive sites by the same invariant (pool/BN outputs).
            from jax.ad_checkpoint import checkpoint_name
            from mindtheedge_tpu.ops import dualgrad
            from mindtheedge_tpu.ops.blocks import (
                derived_kernel, _kernel_cached)

            def conv_packed(xp, kern, cache_name):
                """packed input -> packed output sparse conv (no bias).

                Serving reads the expanded kernel from the cache; training
                routes through dualgrad so the wgrad correlates at the
                compact [k,k,ci,co] size (the SAN backward sat at 2.0x its
                HBM floor with the expanded-tap wgrad, tools/profile_bwd.py).
                """
                if _kernel_cached(self, cache_name):
                    t0, kt = packed_w_conv_geometry(k, rw)
                    ci_k, co_k = kern.shape[2], kern.shape[3]
                    kp = derived_kernel(
                        self, cache_name, (k, kt, ci_k * rw, co_k * rw),
                        xp.dtype,
                        lambda: expand_kernel_packed_w(
                            kern, rw).astype(xp.dtype))
                    y = jax.lax.conv_general_dilated(
                        xp, kp, (1, 1), [(p, p), (-t0, kt - 1 + t0)],
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    y = dualgrad.conv_packed_w(xp, kern, rw)
                return checkpoint_name(y, 'conv_out')

            if _kernel_cached(self, f'fused_w{rw}'):
                kf = derived_kernel(
                    self, f'fused_w{rw}', (k, k + rw - 1, cin, 5 * c * rw),
                    x.dtype,
                    lambda: expand_kernel_phase(
                        jnp.concatenate([k1, k2, k3], axis=-1), 1, rw
                    ).astype(x.dtype))
                fused = jax.lax.conv_general_dilated(
                    x, kf, (1, rw), [(p, p), (p, p)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            else:
                fused = dualgrad.conv_phase(
                    x, jnp.concatenate([k1, k2, k3], axis=-1), 1, rw)
            fused = checkpoint_name(fused, 'conv_out')
            x1 = fused[..., :c * rw]
            x2 = fused[..., c * rw:3 * c * rw]
            x3 = fused[..., 3 * c * rw:]

            x2 = MaskedBatchNorm(channel_repeat=rw,
                                 name='layer2_bn0')(x2, mp, train)
            x2 = nn.relu(x2)
            x2 = conv_packed(
                x2, _SparseConvKernel(c, k, name='layer2_1')(2 * c),
                'layer2_1_packed')

            x3 = MaskedBatchNorm(channel_repeat=rw,
                                 name='layer3_bn0')(x3, mp, train)
            x3 = nn.relu(x3)
            x3 = conv_packed(
                x3, _SparseConvKernel(2 * c, k, name='layer3_1')(2 * c),
                'layer3_1_packed')
            x3 = MaskedBatchNorm(channel_repeat=rw,
                                 name='layer3_bn1')(x3, mp, train)
            x3 = nn.relu(x3)
            x3 = conv_packed(
                x3, _SparseConvKernel(c, k, name='layer3_2')(2 * c),
                'layer3_2_packed')

            y = MaskedBatchNorm(channel_repeat=rw,
                                name='final_bn')(x1 + x2 + x3, mp, train)
            y = nn.relu(y)
            return unpack_w(y, rw), mask

        # No inter-op mask multiplies (same invariant as the packed branch
        # above): every conv INPUT here is zero at inactive sites (pool/BN
        # outputs), and every conv OUTPUT flows into a MaskedBatchNorm whose
        # statistics ignore inactive sites and whose output re-zeroes them —
        # active-site values and the level output are IDENTICAL while the
        # O(#tensors) mask passes disappear.  relu preserves zeros, and the
        # final BN+relu re-establishes the zeros-at-inactive contract.
        def conv_nomask(t, kern, cache_name=None):
            return _conv_plain(t, kern, p, sp)

        fused = conv_nomask(x, jnp.concatenate([k1, k2, k3], axis=-1))
        x1 = fused[..., :c]
        x2 = fused[..., c:3 * c]
        x3 = fused[..., 3 * c:]

        x2 = MaskedBatchNorm(spatial_axis=sp, name='layer2_bn0')(x2, mask, train)
        x2 = conv_nomask(nn.relu(x2),
                         _SparseConvKernel(c, k, name='layer2_1')(2 * c))

        x3 = MaskedBatchNorm(spatial_axis=sp, name='layer3_bn0')(x3, mask, train)
        x3 = conv_nomask(nn.relu(x3),
                         _SparseConvKernel(2 * c, k, name='layer3_1')(2 * c))
        x3 = MaskedBatchNorm(spatial_axis=sp, name='layer3_bn1')(x3, mask, train)
        x3 = conv_nomask(nn.relu(x3),
                         _SparseConvKernel(c, k, name='layer3_2')(2 * c))

        y = MaskedBatchNorm(spatial_axis=sp, name='final_bn')(x1 + x2 + x3, mask, train)
        return nn.relu(y), mask


class SparseDepthEncoder(nn.Module):
    """The SAN ladder (reference ``MinkowskiEncoder``, ``minkowski_encoder.py:89-132``).

    Takes the sparse input depth [B,H,W,1] and returns the 5 densified
    feature maps (one per skip level, strides 2..32).  The reference's
    stateful ``prep``/call-advances protocol becomes an explicit loop.
    """
    channels: tuple = (32, 64, 128, 256, 512)
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, depth, train: bool = False):
        mask = (depth > 0).astype(depth.dtype)
        x = depth
        kernel_sizes = [5, 5] + [3] * (len(self.channels) - 1)
        outs = []
        for i, c in enumerate(self.channels):
            x, mask = MinkConvBlock(c, kernel_sizes[i],
                                    spatial_axis=self.spatial_axis,
                                    name=f'mconv{i}')(x, mask, train)
            outs.append(x)   # densified: zeros at inactive sites already
        return outs
