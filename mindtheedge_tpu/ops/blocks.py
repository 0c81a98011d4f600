"""PackNet building blocks as flax modules (NHWC, bf16-friendly).

TPU-native re-design of the reference PackNet primitives
(``networks/layers/packnet/layers01.py``):

* ``ConvBlock``   == reference ``Conv2D`` (:11-38): pad k//2 -> conv -> GroupNorm(16) -> ELU
* ``ResidualConv``/``residual_block`` (:41-96)
* ``InvDepthHead`` == ``InvDepth`` (:99-123): 3x3 conv -> sigmoid / min_depth
* ``PackLayerConv3d`` (:214-248) / ``UnpackLayerConv3d`` (:251-287): the
  signature PackNet space-to-depth + 3D-conv ops, expressed as reshape/
  transpose + ``lax.conv_general_dilated`` so XLA tiles them onto the MXU.

All convs use xavier-uniform init + zero bias, matching the reference's
``init_weights`` (``PackNetSAN01.py:214-220``).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.dtypes import promote_dtype
from jax.ad_checkpoint import checkpoint_name

from mindtheedge_tpu.ops.packing import pack2d, unpack2d
from mindtheedge_tpu.ops.phase_conv import (
    expand_kernel_phase, expand_kernel_phase2, expand_kernel_packed_2d,
    expand_kernel_packed_w, packed2d_conv_geometry, packed_w_conv_geometry,
    unpack_h, unpack_w)
from mindtheedge_tpu.ops import dualgrad

_xavier = nn.initializers.xavier_uniform()


def _kernel_cached(module, name):
    """True when the serving kernel cache serves (or is collecting) this
    derived kernel — the no-autodiff path.  Training (no cache) routes the
    packed convs through ``ops/dualgrad.py`` for compact-kernel backwards."""
    return (module.has_variable('kernel_cache', name)
            or module.is_mutable_collection('kernel_cache'))


def derived_kernel(module, name, shape, dtype, builder):
    """A parameter-derived constant tensor (expanded / composed conv kernel).

    The phase/packed/composed conv formulations derive their kernels from
    the raw parameters with chains of small einsum/pad/concat ops.  Those
    chains are BATCH-SIZE INDEPENDENT and re-run inside every forward —
    measured as a ~64 ms fixed cost per program at 384x1280 (b3 fwd 75 ms vs
    b8 94 ms, tools/probe_trainmode.py).  For serving (fixed params),
    ``models.packnet.prepare_kernel_cache`` runs ONE forward with
    ``mutable=['kernel_cache']`` to collect every derived kernel; passing
    the collection back into ``apply`` turns them into program inputs and
    the derivation chains vanish.  Training builds inline (params change
    every step).  A cache entry whose shape/dtype doesn't match the current
    call (other resolution/precision than prepared for) is ignored.
    """
    shape = tuple(shape)
    if module.has_variable('kernel_cache', name):
        val = module.get_variable('kernel_cache', name)
        if tuple(val.shape) == shape and val.dtype == dtype:
            return val
    val = builder()
    assert tuple(val.shape) == shape and val.dtype == dtype, \
        f'{name}: built {val.shape}/{val.dtype}, declared {shape}/{dtype}'
    # never populate during module.init (where every collection is mutable):
    # initialized variable trees must stay cache-free
    if module.is_mutable_collection('kernel_cache') \
            and not module.is_initializing():
        module.put_variable('kernel_cache', name, val)
    return val


class GroupNorm(nn.Module):
    """GroupNorm with exact torch semantics (contiguous channel groups,
    per-(sample, group) statistics over (H, W, C/G), eps 1e-5, fp32 stats).

    TPU note: statistics are computed as per-channel spatial moments reduced
    again over each group — mathematically identical to the direct formula,
    but it never reshapes the [B,H,W,C] activation (a [B,HW,G,C/G] reshape
    puts C/G=2..32 on the lane dimension, forcing relayouts), and the
    normalization is a single fused scale+shift pass.

    ``channel_repeat`` > 1 serves phase-packed activations (see
    ``ops/phase_conv.py``): parameters are declared per *original* channel
    (c // channel_repeat, keeping the checkpoint tree identical) and repeated
    over the packed phases.  Because each group's packed channels cover
    exactly the original group's (channel, pixel) set, the statistics are
    bit-equal to the unpacked GroupNorm.
    """
    num_groups: int = 16
    epsilon: float = 1e-5
    channel_repeat: int = 1
    spatial_axis: Optional[str] = None   # H-sharded stats (parallel/spatial.py)

    @nn.compact
    def __call__(self, x):
        b, _, _, c = x.shape
        g = self.num_groups
        assert c % g == 0, f'channels {c} not divisible by {g} groups'
        gs = c // g
        scale = self.param('scale', nn.initializers.ones,
                           (c // self.channel_repeat,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (c // self.channel_repeat,), jnp.float32)
        if self.channel_repeat > 1:
            assert gs % self.channel_repeat == 0, \
                'phase quads must not straddle group boundaries'
            scale = jnp.repeat(scale, self.channel_repeat)
            bias = jnp.repeat(bias, self.channel_repeat)

        xf = x.astype(jnp.float32)
        mean_c = jnp.mean(xf, axis=(1, 2))               # [B,C]
        mean2_c = jnp.mean(jnp.square(xf), axis=(1, 2))  # [B,C]
        if self.spatial_axis is not None:
            # spatially sharded input: shards are equal-size, so the mean of
            # the per-shard means IS the exact global (H, W) moment
            from mindtheedge_tpu.parallel.spatial import spec_axes
            axes = spec_axes(self.spatial_axis)
            mean_c = jax.lax.pmean(mean_c, axes)
            mean2_c = jax.lax.pmean(mean2_c, axes)
        mean_g = mean_c.reshape(b, g, gs).mean(-1)       # [B,G]
        mean2_g = mean2_c.reshape(b, g, gs).mean(-1)
        var_g = jnp.maximum(mean2_g - jnp.square(mean_g), 0.0)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)      # [B,G]

        inv_c = jnp.repeat(inv_g, gs, axis=1) * scale[None, :]      # [B,C]
        off_c = bias[None, :] - jnp.repeat(mean_g, gs, axis=1) * inv_c
        y = x * inv_c[:, None, None, :].astype(x.dtype) \
            + off_c[:, None, None, :].astype(x.dtype)
        return y


class _ConvParams(nn.Module):
    """Bare conv parameters, same tree as ``nn.Conv`` ({kernel, bias})."""
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features):
        k = self.kernel_size
        kernel = self.param('kernel', _xavier,
                            (k, k, in_features, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class ConvBlock(nn.Module):
    """Conv(k, stride, SAME-zero-pad) + GroupNorm(16) + ELU.

    ``phase_pack=True`` emits ``pack2d(conv(x), 2)`` directly via a stride-2
    conv with a phase-expanded kernel (``ops/phase_conv.py``) — exact same
    math, 4x MXU output-lane utilization for narrow full-res layers.  The
    parameter tree is identical either way.

    The input may be a LIST of tensors, meaning ``conv(concat(parts, -1))``:
    the conv then runs as per-part convs with input-channel kernel slices,
    summed — the same math without ever materializing the concatenation
    (measured 2.5x faster at decoder scales: a full-res concat+conv costs
    20.0 ms vs 8.0 ms split, tools/probe_gn_traffic.py).  Only the reduction
    order over input channels changes (fp32 accumulator regrouped at part
    boundaries).  Parameter tree is identical to the concat form.
    """
    out_channels: int
    kernel_size: int
    stride: int = 1
    phase_pack: bool = False       # emit pack2d(conv(x)) (output stays packed)
    auto_lane_pack: bool = True    # W-phase-pack narrow convs internally
    packed_input_w: int = 0        # input arrives W-phase-packed (this factor)
    keep_packed_w: int = 0         # emit W-packed output (skip the unpack)
    packed2d_parts: tuple = ()     # list-input parts arriving in pack2d layout
    packed_input_2d: bool = False  # single pack2d input -> pack2d output
    spatial_axis: Optional[str] = None   # H-sharded mode (parallel/spatial.py)

    @nn.compact
    def __call__(self, x):
        parts = list(x) if isinstance(x, (list, tuple)) else None
        if parts is not None:
            cin = sum(t.shape[-1] // (4 if i in self.packed2d_parts else 1)
                      for i, t in enumerate(parts))
        else:
            cin = x.shape[-1]
        if self.packed_input_w:
            assert parts is None, 'packed input must be a single tensor'
            cin //= self.packed_input_w   # params live per ORIGINAL channel
        if self.packed_input_2d:
            assert parts is None and self.stride == 1 \
                and not self.phase_pack and self.spatial_axis is None
            cin //= 4                     # params live per ORIGINAL channel
        p = self.kernel_size // 2
        kernel, bias = _ConvParams(self.out_channels, self.kernel_size,
                                   name='conv')(cin)
        if self.packed_input_2d:
            # stride-1 SAME conv computed ENTIRELY in the pack2d domain
            # (round 5: the stem's unpacked intermediate between the packed
            # pre_calc and the strided conv1 cost ~5.7 ms of XLA layout
            # churn at b8 — standalone relayouts are roofline-cheap, the
            # composition was not; chaining pack2d end-to-end removes the
            # transition entirely).  Output stays pack2d for the consumer
            # (PackLayerConv3d input_packed / packed2d_parts iconvs).
            x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
            t0, kt = packed2d_conv_geometry(self.kernel_size, 2)
            co = self.out_channels
            if _kernel_cached(self, 'packed2d_in'):
                ke = derived_kernel(
                    self, 'packed2d_in', (kt, kt, cin * 4, co * 4),
                    kernel.dtype,
                    lambda: expand_kernel_packed_2d(kernel, 2))
                y = jax.lax.conv_general_dilated(
                    x, ke, (1, 1), [(-t0, kt - 1 + t0)] * 2,
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            else:
                y = dualgrad.conv_packed_2d(x, kernel, 2)
            y = checkpoint_name(y + jnp.repeat(bias, 4), 'conv_out')
            y = GroupNorm(num_groups=16, epsilon=1e-5, channel_repeat=4,
                          name='norm')(y)
            return nn.elu(y)
        if parts is not None:
            pr = promote_dtype(*parts, kernel, bias, dtype=None)
            parts, kernel, bias = list(pr[:-2]), pr[-2], pr[-1]
            if self.packed2d_parts:
                assert self.spatial_axis is None and not self.phase_pack \
                    and self.stride == 1
                return self._split_conv_2d(parts, kernel, bias, p)
            if self.spatial_axis is None and not self.phase_pack \
                    and self.stride == 1 and len(parts) > 1:
                return self._split_conv(parts, kernel, bias, p)
            x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
        else:
            x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        if self.spatial_axis is not None:
            # Sharded dims halo-exchange p slices and run VALID; unsharded
            # dims keep SAME padding.  Lane packing is W-phase-based, so it
            # only composes with H-only sharding (W-sharded convs would need
            # phase-aligned halos) — disabled under a W axis.
            assert not self.phase_pack and self.stride == 1, \
                'spatial sharding supports the plain stride-1 conv path'
            from mindtheedge_tpu.parallel.spatial import (
                halo_exchange_h, spec_hw)
            h_ax, w_ax = spec_hw(self.spatial_axis)
            x = halo_exchange_h(x, p, self.spatial_axis)
            pad_h = (0, 0) if h_ax is not None else (p, p)
            pad_w = (0, 0) if w_ax is not None else (p, p)
            rw = _lane_pack_width(self.out_channels, x.shape[2]) \
                if (self.auto_lane_pack and w_ax is None) else 1
            if rw > 1:
                kernel = expand_kernel_phase(kernel, 1, rw)
                bias = jnp.repeat(bias, rw)
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, rw), [pad_h, pad_w],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
            y = GroupNorm(num_groups=16, epsilon=1e-5, channel_repeat=rw,
                          spatial_axis=self.spatial_axis, name='norm')(y)
            y = nn.elu(y)
            return unpack_w(y, rw) if rw > 1 else y
        # W-only lane packing: compute the conv phase-packed along W so the
        # output channel (lane) dim is r*co instead of co, then unpack after
        # the (phase-invariant) GroupNorm+ELU.  Exact same math; the MXU runs
        # narrow-out convs (co=32) at ~1-5% lane efficiency otherwise.
        # ``packed_input_w``/``keep_packed_w`` extend this to CHAINS: the
        # packed-domain kernel (ops/phase_conv.expand_kernel_packed_w)
        # consumes an already-packed input and the unpack is skipped when the
        # consumer wants the packed layout — conv-GN-conv chains then never
        # relayout (ResidualConv, the SAN ladder).
        rin, rkeep = self.packed_input_w, self.keep_packed_w
        pads = [(p, p), (p, p)]
        k_sz, co = self.kernel_size, self.out_channels
        # Every packed formulation has two grad paths: with a kernel cache
        # (serving) the expanded kernel is a program input and autodiff never
        # runs; without one (training) the conv routes through
        # ops/dualgrad.py so the backward correlates at the COMPACT kernel
        # size instead of the expanded taps (wgrad FLOP inflation up to 8x).
        if rin:
            assert self.stride == 1 and not self.phase_pack
            assert rkeep in (0, rin), 'packed in/out factors must match'
            if _kernel_cached(self, f'packed_w{rin}'):
                t0, kt = packed_w_conv_geometry(k_sz, rin)
                ke = derived_kernel(
                    self, f'packed_w{rin}', (k_sz, kt, cin * rin, co * rin),
                    kernel.dtype, lambda: expand_kernel_packed_w(kernel, rin))
                y = jax.lax.conv_general_dilated(
                    x, ke, (1, 1), [(p, p), (-t0, kt - 1 + t0)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            else:
                y = dualgrad.conv_packed_w(x, kernel, rin)
            bias = jnp.repeat(bias, rin)
            rw = rin
        else:
            rw = rkeep
            if not rw and (self.auto_lane_pack and not self.phase_pack
                           and self.stride == 1 and self.out_channels < 128
                           and self.out_channels % 16 == 0):
                rw = min(4, 128 // self.out_channels)
                while rw > 1 and x.shape[2] % rw != 0:
                    rw //= 2
                rw = 0 if rw == 1 else rw
            if self.phase_pack:
                assert self.stride == 1, 'phase_pack requires stride 1'
                if _kernel_cached(self, 'phase2'):
                    ke = derived_kernel(
                        self, 'phase2', (k_sz + 1, k_sz + 1, cin, 4 * co),
                        kernel.dtype, lambda: expand_kernel_phase2(kernel))
                    y = jax.lax.conv_general_dilated(
                        x, ke, (2, 2), pads,
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    y = dualgrad.conv_phase(x, kernel, 2, 2)
                bias = jnp.repeat(bias, 4)
            elif rw:
                assert self.stride == 1
                if _kernel_cached(self, f'phase_w{rw}'):
                    ke = derived_kernel(
                        self, f'phase_w{rw}',
                        (k_sz, k_sz + rw - 1, cin, co * rw),
                        kernel.dtype,
                        lambda: expand_kernel_phase(kernel, 1, rw))
                    y = jax.lax.conv_general_dilated(
                        x, ke, (1, rw), pads,
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    y = dualgrad.conv_phase(x, kernel, 1, rw)
                bias = jnp.repeat(bias, rw)
            else:
                y = jax.lax.conv_general_dilated(
                    x, kernel, (self.stride, self.stride), pads,
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = checkpoint_name(y + bias, 'conv_out')
        repeat = 4 if self.phase_pack else (rw or 1)
        x = GroupNorm(num_groups=16, epsilon=1e-5, channel_repeat=repeat,
                      name='norm')(x)
        x = nn.elu(x)
        if rw and not rkeep:
            x = unpack_w(x, rw)
        return x

    def _split_conv_2d(self, parts, kernel, bias, p):
        """conv(concat(parts)) computed ON THE PACK2D GRID: parts listed in
        ``packed2d_parts`` arrive as [B,h,w,ci*4] pack2d-layout tensors of a
        virtual [B,2h,2w,ci] image (an UnpackLayerConv3d that skipped its
        depth-to-space), the rest at full res [B,2h,2w,ci].  Packed parts
        convolve with the pack2d-domain kernel
        (``ops/phase_conv.expand_kernel_packed_2d``), full-res parts with
        the stride-(2,2) phase kernel — both emit the SAME pack2d layout on
        the half-res grid, so the decoder's iconv runs at full 128-lane
        width with no depth-to-space relayout on its main input.  One
        unpack2d at the block exit.  Exact same math and parameter tree.
        """
        k_sz, co = self.kernel_size, self.out_channels
        t0, kt = packed2d_conv_geometry(k_sz, 2)
        # cache names carry the slice offset: two same-shape parts at
        # different kernel offsets must never share a derived-kernel entry
        # (the shape/dtype check alone cannot tell them apart)
        y = None
        off = 0
        for i, t in enumerate(parts):
            packed = i in self.packed2d_parts
            ci_p = t.shape[-1] // (4 if packed else 1)
            off0 = off
            off += ci_p
            if packed:
                if _kernel_cached(self, f'split2d{i}_o{off0}'):
                    ks = derived_kernel(
                        self, f'split2d{i}_o{off0}', (kt, kt, ci_p * 4, co * 4),
                        kernel.dtype,
                        lambda: expand_kernel_packed_2d(
                            kernel[:, :, off0:off0 + ci_p, :], 2))
                    yi = jax.lax.conv_general_dilated(
                        t, ks, (1, 1), [(-t0, kt - 1 + t0)] * 2,
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    yi = dualgrad.conv_packed_2d(
                        t, kernel[:, :, off0:off0 + ci_p, :], 2)
            else:
                if _kernel_cached(self, f'splitph2_{i}_o{off0}'):
                    ks = derived_kernel(
                        self, f'splitph2_{i}_o{off0}',
                        (k_sz + 1, k_sz + 1, ci_p, co * 4), kernel.dtype,
                        lambda: expand_kernel_phase(
                            kernel[:, :, off0:off0 + ci_p, :], 2, 2))
                    yi = jax.lax.conv_general_dilated(
                        t, ks, (2, 2), [(p, p)] * 2,
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    yi = dualgrad.conv_phase(
                        t, kernel[:, :, off0:off0 + ci_p, :], 2, 2)
            y = yi if y is None else y + yi
        y = checkpoint_name(y + jnp.repeat(bias, 4), 'conv_out')
        y = GroupNorm(num_groups=16, epsilon=1e-5, channel_repeat=4,
                      name='norm')(y)
        return unpack2d(nn.elu(y), 2)

    def _split_conv(self, parts, kernel, bias, p):
        """conv(concat(parts)) as summed kernel-sliced convs (no concat)."""
        assert not self.keep_packed_w, \
            'keep_packed_w is not supported for list inputs'
        rw = _lane_pack_width(self.out_channels, parts[0].shape[2]) \
            if self.auto_lane_pack else 1
        y = None
        off = 0
        k_sz, co = self.kernel_size, self.out_channels
        for i, t in enumerate(parts):
            ci_p, off0 = t.shape[-1], off
            off += ci_p
            if rw > 1:
                if _kernel_cached(self, f'split{i}_o{off0}_w{rw}'):
                    ks = derived_kernel(
                        self, f'split{i}_o{off0}_w{rw}',
                        (k_sz, k_sz + rw - 1, ci_p, co * rw), kernel.dtype,
                        lambda: expand_kernel_phase(
                            kernel[:, :, off0:off0 + ci_p, :], 1, rw))
                    yi = jax.lax.conv_general_dilated(
                        t, ks, (1, rw), [(p, p), (p, p)],
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    yi = dualgrad.conv_phase(
                        t, kernel[:, :, off0:off0 + ci_p, :], 1, rw)
            else:
                yi = jax.lax.conv_general_dilated(
                    t, kernel[:, :, off0:off0 + ci_p, :], (1, 1),
                    [(p, p), (p, p)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            y = yi if y is None else y + yi
        y = checkpoint_name(
            y + (jnp.repeat(bias, rw) if rw > 1 else bias), 'conv_out')
        y = GroupNorm(num_groups=16, epsilon=1e-5, channel_repeat=rw,
                      name='norm')(y)
        y = nn.elu(y)
        return unpack_w(y, rw) if rw > 1 else y


class ResidualConv(nn.Module):
    """Two ConvBlocks + 1x1-conv shortcut, GroupNorm(16) + ELU on the sum.

    ``dropout`` applies channel-wise Dropout2d on the shortcut path, as in the
    reference (``layers01.py:65-66``).
    """
    out_channels: int
    stride: int = 1
    dropout: Optional[float] = None
    auto_lane_pack: bool = True
    packed_input_w: int = 0     # input arrives W-phase-packed (this factor)
    keep_packed_w: int = 0      # emit W-packed output (skip the unpack)
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.spatial_axis is not None:
            assert self.stride == 1, 'spatial sharding: stride-1 blocks only'
        rin, rkeep = self.packed_input_w, self.keep_packed_w
        rw = rin or rkeep
        if (not rw and self.auto_lane_pack and self.spatial_axis is None
                and self.stride == 1
                and not isinstance(x, (list, tuple))):
            rw = _lane_pack_width(self.out_channels, x.shape[2])
            rw = 0 if rw == 1 else rw
        if rin:
            assert rkeep in (0, rin), 'packed in/out factors must match'
        if rw:
            # Packed-domain block: conv1 emits W-packed, conv2 consumes and
            # emits packed, the 1x1 shortcut emits packed, and the sum + GN +
            # ELU run packed with ONE unpack at the block end.  Exact same
            # math and parameter tree; cuts the per-ConvBlock pack/unpack
            # round-trips that made this block ~4 GB of HBM traffic vs the
            # ~1.1 GB minimum (tools/probe_overhead.py).
            C = self.out_channels
            cin = x.shape[-1] // (rin or 1)
            y = ConvBlock(C, 3, 1, packed_input_w=rin, keep_packed_w=rw,
                          name='conv1')(x)
            y = ConvBlock(C, 3, 1, packed_input_w=rw, keep_packed_w=rw,
                          name='conv2')(y)
            k1, b1 = _ConvParams(C, 1, name='conv3')(cin)
            xs, k1, b1 = promote_dtype(x, k1, b1, dtype=None)
            if rin:
                # 1x1 conv in the packed domain: kt=1, no padding
                if _kernel_cached(self, f'shortcut_p{rw}'):
                    k1e = derived_kernel(
                        self, f'shortcut_p{rw}', (1, 1, cin * rw, C * rw),
                        k1.dtype, lambda: expand_kernel_packed_w(k1, rw))
                    sc = jax.lax.conv_general_dilated(
                        xs, k1e, (1, 1), [(0, 0), (0, 0)],
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    sc = dualgrad.conv_packed_w(xs, k1, rw)
            else:
                if _kernel_cached(self, f'shortcut_w{rw}'):
                    k1e = derived_kernel(
                        self, f'shortcut_w{rw}', (1, rw, cin, C * rw),
                        k1.dtype, lambda: expand_kernel_phase(k1, 1, rw))
                    sc = jax.lax.conv_general_dilated(
                        xs, k1e, (1, rw), [(0, 0), (0, 0)],
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    sc = dualgrad.conv_phase(xs, k1, 1, rw)
            shortcut = checkpoint_name(sc + jnp.repeat(b1, rw), 'conv_out')
            if self.dropout:
                # Dropout2d with one draw per ORIGINAL channel: run the real
                # nn.Dropout submodule on a [B,1,1,C] ones tensor — the
                # module auto-name ('Dropout_0') and draw shape match the
                # unpacked path exactly, so the SAME channels drop — then
                # repeat the multiplicative factor over the W phases.
                factor = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2),
                                    deterministic=not train)(
                    jnp.ones((shortcut.shape[0], 1, 1, C), shortcut.dtype))
                shortcut = shortcut * jnp.repeat(factor, rw, axis=-1)
            out = GroupNorm(num_groups=16, epsilon=1e-5, channel_repeat=rw,
                            name='norm')(y + shortcut)
            out = nn.elu(out)
            return out if rkeep else unpack_w(out, rw)
        y = ConvBlock(self.out_channels, 3, self.stride,
                      spatial_axis=self.spatial_axis, name='conv1')(x)
        y = ConvBlock(self.out_channels, 3, 1,
                      spatial_axis=self.spatial_axis, name='conv2')(y)
        shortcut = nn.Conv(self.out_channels, (1, 1),
                           strides=(self.stride, self.stride),
                           kernel_init=_xavier, name='conv3')(x)
        if self.dropout:
            shortcut = nn.Dropout(rate=self.dropout,
                                  broadcast_dims=(1, 2),  # whole-channel drop (Dropout2d)
                                  deterministic=not train)(shortcut)
        out = GroupNorm(num_groups=16, epsilon=1e-5,
                        spatial_axis=self.spatial_axis,
                        name='norm')(y + shortcut)
        return nn.elu(out)


class ResidualBlock(nn.Module):
    """Stack of ResidualConvs; first may change channels (``layers01.py:76-96``)."""
    out_channels: int
    num_blocks: int
    stride: int = 1
    dropout: Optional[float] = None
    auto_lane_pack: bool = True
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # chain the W-packed layout ACROSS blocks: block0 emits packed, the
        # rest consume and emit packed, one unpack at the stack exit.
        # Was eval-only in round 4 (expanded-tap wgrad inflation); with the
        # compact VJP (ops/dualgrad.py) the chain trains too.
        # MTE_TRAIN_PACKED=0 restores the r4 per-block train path for A/B.
        rw = 0
        if ((not train or dualgrad.train_packed_enabled())
                and self.auto_lane_pack and self.spatial_axis is None
                and self.stride == 1 and not isinstance(x, (list, tuple))):
            rw = _lane_pack_width(self.out_channels, x.shape[2])
            rw = 0 if rw == 1 else rw
        n = self.num_blocks
        x = ResidualConv(self.out_channels, self.stride, self.dropout,
                         auto_lane_pack=self.auto_lane_pack,
                         keep_packed_w=rw if n > 1 else 0,
                         spatial_axis=self.spatial_axis,
                         name='block0')(x, train)
        for i in range(1, n):
            x = ResidualConv(self.out_channels, 1, self.dropout,
                             auto_lane_pack=self.auto_lane_pack,
                             packed_input_w=rw,
                             keep_packed_w=rw if i < n - 1 else 0,
                             spatial_axis=self.spatial_axis,
                             name=f'block{i}')(x, train)
        return x


class InvDepthHead(nn.Module):
    """3x3 conv -> sigmoid / min_depth; inverse-depth in (0, 1/min_depth).

    The 1-channel (or 2-channel DEE) output runs the MXU at 1/128 output
    lanes; the unsharded path therefore W-phase-packs aggressively (up to
    rw=128) — same math, same {conv1: kernel, bias} tree, sigmoid is
    phase-invariant, one unpack at the end.
    """
    out_channels: int = 1
    min_depth: float = 0.5
    lane_pack: bool = True     # eval-only caller gate (bwd FLOP inflation)
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        pad_h, pad_w = (1, 1), (1, 1)
        if self.spatial_axis is not None:
            from mindtheedge_tpu.parallel.spatial import (
                halo_exchange_h, spec_hw)
            h_ax, w_ax = spec_hw(self.spatial_axis)
            x = halo_exchange_h(x, 1, self.spatial_axis)
            pad_h = (0, 0) if h_ax is not None else pad_h
            pad_w = (0, 0) if w_ax is not None else pad_w
        elif self.lane_pack and self.out_channels < 64:
            rw = 128 // self.out_channels
            while rw > 1 and x.shape[2] % rw != 0:
                rw //= 2
            if rw > 1:
                kernel, bias = _ConvParams(self.out_channels, 3,
                                           name='conv1')(x.shape[-1])
                x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
                if _kernel_cached(self, f'head_w{rw}'):
                    ke = derived_kernel(
                        self, f'head_w{rw}',
                        (3, 2 + rw, x.shape[-1], self.out_channels * rw),
                        kernel.dtype,
                        lambda: expand_kernel_phase(kernel, 1, rw))
                    y = jax.lax.conv_general_dilated(
                        x, ke, (1, rw), [(1, 1), (1, 1)],
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                else:
                    y = dualgrad.conv_phase(x, kernel, 1, rw)
                y = y + jnp.repeat(bias, rw)
                return unpack_w(nn.sigmoid(y) / self.min_depth, rw)
        x = nn.Conv(self.out_channels, (3, 3), padding=[pad_h, pad_w],
                    kernel_init=_xavier, name='conv1')(x)
        return nn.sigmoid(x) / self.min_depth


def _conv3d_tridiag_kernel(kernel, g):
    """Dense no-halo 2D kernel [3,3,g,d*g] expressing the channel-depth 3D
    conv: K2[dh, dw, j, f*g + z] = K3[dz = j - z + 1, dh, dw, 0, f] for
    |j - z| <= 1, zero elsewhere — a block-tridiagonal matrix over (in, out)
    channels whose zero boundary rows ARE the 3D conv's z padding.

    Built via a constant 0/1 einsum: TPU lowers gathers to serial scalar
    loops and a lane-dimension ``jnp.pad`` costs a full unaligned relayout
    (146 ms measured at pack1 scale), so the kernel uses neither.
    """
    import numpy as np
    d_feat = kernel.shape[-1]
    k3 = kernel[:, :, :, 0, :]                       # [dz, dh, dw, f]
    sel = np.zeros((3, g, g), np.float32)            # [dz, j, z]
    for dz in range(3):
        j = np.arange(g) + dz - 1
        ok = (j >= 0) & (j < g)
        sel[dz, j[ok], np.arange(g)[ok]] = 1.0
    k2 = jnp.einsum('djz,dabf->abjfz', jnp.asarray(sel, kernel.dtype), k3)
    return k2.reshape(3, 3, g, d_feat * g)


def _conv3d_over_channels(x, kernel):
    """3x3x3 conv over (channel-as-depth, H, W) with 1 input feature, NO bias.

    x: [B,H,W,D]  kernel: [3,3,3,1,d]  ->  [B,H,W,d*D] flattened so that the
    output channel index is feat*D + depth, matching the reference's
    ``x.view(b, c*d, h, w)`` (``layers01.py:245-246``).

    TPU formulation: one dense 2D conv with the block-tridiagonal [3,3,D,4D]
    kernel.  The multiply-by-zeros inflate FLOPs by D/3 over the minimal
    count, but the matmul has full lane utilization, reads x in its native
    layout (no channel pad, no transposes, no gathers — each of which costs
    a full-tensor relayout on TPU), and the output channel order f*D+z falls
    out directly.  For the large-D pack layers the conv3d is composed into
    the following ConvBlock conv instead (``_PackConvBlock``).
    """
    k2 = _conv3d_tridiag_kernel(kernel, x.shape[-1]).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _lane_pack_width(out_channels, w):
    """W-phase packing factor for a stride-1 conv with ``out_channels`` lanes."""
    if out_channels >= 128 or out_channels % 16 != 0:
        return 1
    rw = min(4, 128 // out_channels)
    while rw > 1 and w % rw != 0:
        rw //= 2
    return rw


class _Conv3dParams(nn.Module):
    """Bare parameters of the pack/unpack 3D conv (tree: {kernel, bias})."""
    d: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', _xavier, (3, 3, 3, 1, self.d), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.d,), jnp.float32)
        return kernel, bias


class Conv3dOverChannels(nn.Module):
    """Parameter holder for the 3D conv used by Pack/Unpack layers."""
    d: int = 8
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', _xavier, (3, 3, 3, 1, self.d), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.d,), jnp.float32)
        g = x.shape[-1]
        if self.spatial_axis is not None:
            from mindtheedge_tpu.parallel.spatial import (
                halo_exchange_h, spec_hw)
            h_ax, w_ax = spec_hw(self.spatial_axis)
            k2 = _conv3d_tridiag_kernel(kernel.astype(x.dtype), g)
            xh = halo_exchange_h(x, 1, self.spatial_axis)
            y = jax.lax.conv_general_dilated(
                xh, k2, (1, 1),
                [(0, 0) if h_ax is not None else (1, 1),
                 (0, 0) if w_ax is not None else (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        else:
            k2 = derived_kernel(
                self, 'tridiag', (3, 3, g, self.d * g), x.dtype,
                lambda: _conv3d_tridiag_kernel(kernel.astype(x.dtype), g))
            y = jax.lax.conv_general_dilated(
                x, k2, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + jnp.repeat(bias, g).astype(y.dtype)


def _compose_pack_kernel(k3, kernel2, d):
    """Compose the channel-depth conv3d (k3 [3,3,3,1,d]) with the following
    k x k conv (kernel2 [k, k, d*D, C]) into ONE (k+2)x(k+2) conv kernel
    [k+2, k+2, D, C] over the pack layer's input.

    Both ops are linear, so conv2 (conv3d (x)) == conv(x, Kc) away from the
    image border (the reference zero-pads the *biased* intermediate, so the
    outermost k//2 rows/cols differ — recomputed exactly on thin strips by
    the caller).  Fusing skips the 4*D-channel intermediate entirely: at
    pack1 scale that is 1 GB of HBM round-trip plus a ~1% MXU-efficiency
    matmul replaced by one full-lane conv.
    """
    k = kernel2.shape[0]
    C = kernel2.shape[3]
    D = kernel2.shape[2] // d
    K2r = kernel2.reshape(k, k, d, D, C)
    K3 = k3[:, :, :, 0, :]                            # [dz, dh1, dw1, f]
    # 27 small [k,k,D,C] terms, placed by PAD and tree-SUMMED.  Two rejected
    # formulations, both measured (tools/probe_levels.py): a single einsum to
    # [3,3,3,k,k,D,C] materializes a 27x kernel-sized intermediate inside the
    # jit (255 MB at pack5, 16.9 ms); 27 chained ``Kc.at[].add`` updates are
    # a SERIAL dependency chain (pack5 still 9.3 ms).  Padded terms are
    # data-parallel and the sum reduces as a tree.
    terms = []
    for dz in range(3):
        for dh1 in range(3):
            for dw1 in range(3):
                T = jnp.einsum('f,abfzc->abzc', K3[dz, dh1, dw1], K2r)
                # place K2r[..., z, :] at zin = z + dz - 1 (pad+slice shift)
                Tz = jnp.pad(T, ((0, 0), (0, 0), (1, 1), (0, 0)))
                Tz = Tz[:, :, 2 - dz:2 - dz + D, :]
                terms.append(jnp.pad(
                    Tz, ((dh1, 2 - dh1), (dw1, 2 - dw1), (0, 0), (0, 0))))
    return sum(terms)


class _PackConvBlock(nn.Module):
    """conv3d + ConvBlock of a pack layer, computed as ONE composed conv.

    Interior: ``conv(x, Kc, pad p+1)`` + composed bias (for in-interior
    positions every ConvBlock tap is in-bounds, so the conv3d bias
    contribution is a constant vector), W-lane-packed for full MXU lanes.
    Border (outermost p rows/cols): the reference zero-pads the biased
    conv3d output before the ConvBlock conv (``layers01.py:214-248``), which
    the composed conv cannot express — recomputed exactly on (2p+1)-wide
    strips via the unfused pipeline and spliced in.  Falls back to the plain
    unfused pipeline when the input is too small for strips.  Parameter tree
    identical to ConvBlock ('conv' + 'norm').
    """
    out_channels: int
    kernel_size: int
    d: int
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, k3, b3):
        b, h, w, D = x.shape
        k = self.kernel_size
        p = k // 2
        kernel, bias = _ConvParams(self.out_channels, k,
                                   name='conv')(self.d * D)
        x, kernel, bias, k3, b3 = promote_dtype(
            x, kernel, bias, k3, b3, dtype=None)
        C = self.out_channels
        dn = ('NHWC', 'HWIO', 'NHWC')

        def strip_pipe(xs, pack_axis=None):
            """Unfused conv3d+conv pipeline for border strips; the ConvBlock
            conv (co = 32-64 at pack1/pack2 -> 25-50% MXU lanes) is
            phase-packed along the strip's LONG axis (``pack_axis``), the
            only one with room: W for the top/bottom bands, H for the
            left/right ones.  Exact same math (unpacked at exit)."""
            k2 = derived_kernel(
                self, 'tridiag', (3, 3, D, self.d * D), kernel.dtype,
                lambda: _conv3d_tridiag_kernel(k3, D).astype(kernel.dtype))
            y1 = jax.lax.conv_general_dilated(
                xs, k2, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn) + jnp.repeat(b3, D)
            r = 1
            if pack_axis == 'w':
                r = _lane_pack_width(C, y1.shape[2])
            elif pack_axis == 'h':
                r = _lane_pack_width(C, y1.shape[1])
            if r == 1:
                return jax.lax.conv_general_dilated(
                    y1, kernel, (1, 1), [(p, p), (p, p)],
                    dimension_numbers=dn) + bias
            rh, rw_ = (r, 1) if pack_axis == 'h' else (1, r)
            name = f'strip_{pack_axis}{r}'
            if _kernel_cached(self, name):
                ke = derived_kernel(
                    self, name,
                    (k + rh - 1, k + rw_ - 1, self.d * D, C * r),
                    kernel.dtype,
                    lambda: expand_kernel_phase(kernel, rh, rw_))
                y = jax.lax.conv_general_dilated(
                    y1, ke, (rh, rw_), [(p, p), (p, p)],
                    dimension_numbers=dn)
            else:
                y = dualgrad.conv_phase(y1, kernel, rh, rw_)
            y = y + jnp.repeat(bias, r)
            return unpack_h(y, r) if pack_axis == 'h' else unpack_w(y, r)

        if self.spatial_axis is not None:
            # H-sharded: unfused pipeline with halo exchanges.  ppermute's
            # zero fill at the mesh edges reproduces both the conv3d zero
            # pad AND the reference's zero-pad of the *biased* intermediate
            # (layers01.py:214-248) exactly, so no border strips are needed.
            from mindtheedge_tpu.parallel.spatial import (
                halo_exchange_h, spec_hw)
            h_ax, w_ax = spec_hw(self.spatial_axis)

            def pads(q):
                return [(0, 0) if h_ax is not None else (q, q),
                        (0, 0) if w_ax is not None else (q, q)]

            k2 = _conv3d_tridiag_kernel(k3, D)
            xh = halo_exchange_h(x, 1, self.spatial_axis)
            y1 = jax.lax.conv_general_dilated(
                xh, k2, (1, 1), pads(1),
                dimension_numbers=dn) + jnp.repeat(b3, D)
            y1h = halo_exchange_h(y1, p, self.spatial_axis)
            y = jax.lax.conv_general_dilated(
                y1h, kernel, (1, 1), pads(p),
                dimension_numbers=dn) + bias
            y = GroupNorm(num_groups=16, epsilon=1e-5,
                          spatial_axis=self.spatial_axis, name='norm')(y)
            return nn.elu(y)

        if h < 2 * p + 1 or w < 2 * p + 1:
            # (An unfused-below-threshold variant was A/B-tested and LOST:
            # full_rgbd 99.8 -> 105.9 ms with pack3..5 unfused — the tridiag
            # conv3d kernel build + inflated small-M convs cost more than the
            # composed path's fixed overhead.  K=10 per-segment readings that
            # suggested otherwise were relay-latency noise; trust K>=30 full-
            # model A/Bs.)
            y = strip_pipe(x)
        else:
            rw = _lane_pack_width(C, w)
            kc_shape = (k + 2, k + 2, D, C) if rw == 1 else \
                (k + 2, k + 1 + rw, D, C * rw)

            def build_kc():
                Kc = _compose_pack_kernel(k3, kernel, self.d)
                return Kc if rw == 1 else expand_kernel_phase(Kc, 1, rw)

            Kc = derived_kernel(self, f'composed_w{rw}', kc_shape,
                                kernel.dtype, build_kc)
            cbias = bias + jnp.einsum(
                'abfzc,f->c', kernel.reshape(k, k, self.d, D, C), b3)
            if rw > 1:
                cbias = jnp.repeat(cbias, rw)
            y = checkpoint_name(jax.lax.conv_general_dilated(
                x, Kc, (1, rw), [(p + 1, p + 1), (p + 1, p + 1)],
                dimension_numbers=dn) + cbias, 'conv_out')
            if rw > 1:
                y = unpack_w(y, rw)
            # exact border bands, spliced via dynamic_update_slice (an
            # explicit jnp.pad-to-full-size + where costs 150+ ms on TPU —
            # large-tensor pads are full unaligned relayouts; DUS is ~1 ms)
            # top+bottom (and left+right) strips share a shape: run each
            # pair as ONE batched pipeline (4 -> 2 conv3d+conv chains; the
            # strips were ~3.7 of pack2's 5.6 ms, tools/probe_packlayer.py)
            nb = x.shape[0]
            tb = strip_pipe(jnp.concatenate(
                [x[:, :2 * p + 1], x[:, h - 2 * p - 1:]], axis=0), 'w')
            ts, bs = tb[:nb, :p], tb[nb:, p + 1:]
            lr = strip_pipe(jnp.concatenate(
                [x[:, :, :2 * p + 1], x[:, :, w - 2 * p - 1:]], axis=0), 'h')
            ls, rs = lr[:nb, :, :p], lr[nb:, :, p + 1:]
            y = jax.lax.dynamic_update_slice(y, ts, (0, 0, 0, 0))
            y = jax.lax.dynamic_update_slice(y, bs, (0, h - p, 0, 0))
            y = jax.lax.dynamic_update_slice(y, ls, (0, 0, 0, 0))
            y = jax.lax.dynamic_update_slice(y, rs, (0, 0, w - p, 0))
        y = GroupNorm(num_groups=16, epsilon=1e-5, name='norm')(y)
        return nn.elu(y)


class PackLayerConv3d(nn.Module):
    """pack(r=2) -> 3D conv(1->d) over channels -> ConvBlock back to C.

    Reference ``layers01.py:214-248``.  ``input_packed=True`` means the input
    is already in pack2d layout (produced by a phase-packed ConvBlock) and
    the space-to-depth step is skipped.  The conv3d + ConvBlock pair runs as
    one composed conv (see ``_PackConvBlock``) — exact same math, same
    parameter tree.
    """
    in_channels: int
    kernel_size: int
    r: int = 2
    d: int = 8
    input_packed: bool = False
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if not self.input_packed:
            x = pack2d(x, self.r)    # shard-local: r=2 cells never straddle shards
        k3, b3 = _Conv3dParams(self.d, name='conv3d')()
        return _PackConvBlock(self.in_channels, self.kernel_size, self.d,
                              spatial_axis=self.spatial_axis,
                              name='conv')(x, k3, b3)


class UnpackLayerConv3d(nn.Module):
    """ConvBlock to out*r^2/d -> 3D conv(1->d) -> PixelShuffle(r).

    Reference ``layers01.py:251-287``.  ``emit_packed2d=True`` skips the
    depth-to-space: the output stays in pack2d layout (exactly
    ``pack2d(unpack2d(y)) == y``) for a consumer that convolves in the
    pack2d domain (``ConvBlock.packed2d_parts`` — the decoder's iconvs).
    """
    out_channels: int
    kernel_size: int
    r: int = 2
    d: int = 8
    emit_packed2d: bool = False
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        mid = self.out_channels * self.r ** 2 // self.d
        x = ConvBlock(mid, self.kernel_size, 1,
                      spatial_axis=self.spatial_axis, name='conv')(x)
        x = Conv3dOverChannels(self.d, spatial_axis=self.spatial_axis,
                               name='conv3d')(x)
        if self.emit_packed2d:
            assert self.spatial_axis is None and self.r == 2
            return x                 # pack2d layout of the unpacked tensor
        return unpack2d(x, self.r)   # shard-local depth-to-space
