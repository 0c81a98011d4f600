"""PackNet-SAN depth network, TPU-native (flax / NHWC / bf16-ready).

Re-design of the reference workhorse net ``networks/depth/PackNetSAN01.py``
(the net used by all three shipped configs).  Architecture hyper-parameters
(channel widths 32/32/64/128/256/512, blocks [2,2,3,3], pack kernels
[5,3,3,3,3], num_3d_feat=4) follow ``PackNetSAN01.py:179-184``.

Differences from the reference (deliberate, documented):
* NHWC layout (TPU conv layout) instead of NCHW, with torch-compatible
  channel ordering inside pack/unpack so checkpoints port exactly.
* The MinkowskiEngine SAN branch is replaced by the masked-dense
  ``SparseDepthEncoder`` (see ``mindtheedge_tpu/ops/sparse.py``).
* The reference's ``is_depth_aux_net`` ctor flag is stored properly (the
  reference forgets ``self.`` at ``PackNetSAN01.py:170-172`` — a latent
  AttributeError we do not replicate).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from mindtheedge_tpu.ops.blocks import (
    ConvBlock, ResidualBlock, InvDepthHead, PackLayerConv3d, UnpackLayerConv3d)
from mindtheedge_tpu.ops.packing import unpack2d, upsample_nearest2x
from mindtheedge_tpu.ops.sparse import SparseDepthEncoder

# Encoder/decoder widths (PackNetSAN01.py:179-184)
SLIM_CHANNELS = (32, 32, 64, 128, 256, 512)     # PackNetSlim / PackNetSAN
FULL_CHANNELS = (64, 64, 64, 128, 256, 512)     # original PackNet01 (:34-35)
NUM_BLOCKS = (2, 2, 3, 3)
PACK_KERNEL = (5, 3, 3, 3, 3)
UNPACK_KERNEL = (3, 3, 3, 3, 3)
ICONV_KERNEL = (3, 3, 3, 3, 3)
NUM_3D_FEAT = 4


class PackNetSlimEncoder(nn.Module):
    """Reference ``PackNetSlimEnc01`` (``PackNetSAN01.py:22-61``).

    ``phase_packed_stem`` computes the 7x7 full-res ``conv1`` as a stride-2
    phase-expanded conv whose output IS ``pack2d(x1)``, feeding ``pack1``
    directly (``ops/phase_conv.py``): exact same math, ~4x MXU lane
    utilization on the most expensive conv in the network.
    """
    dropout: Optional[float] = None
    channels: tuple = SLIM_CHANNELS
    phase_packed_stem: bool = True
    spatial_axis: Optional[str] = None   # H-sharded mode (parallel/spatial.py)

    @nn.compact
    def __call__(self, rgb, train: bool = False):
        ni, n1, n2, n3, n4, n5 = self.channels
        sp = self.spatial_axis
        # the phase-packed stem runs pack2d END-TO-END: pre_calc emits
        # pack2d(conv(rgb)) via a stride-2 phase conv, conv1 convolves in
        # the pack2d domain, pack1 consumes the packed layout directly —
        # zero full-res unpacked intermediates (round 5: the unpacked x
        # between a packed pre_calc and the strided conv1 cost ~5.7 ms of
        # XLA layout churn at b8).  Under H-sharding we keep the plain
        # stride-1 + pack2d pipeline (correctness-first escape path).
        pp = self.phase_packed_stem and sp is None
        x = ConvBlock(ni, 5, 1, phase_pack=pp, spatial_axis=sp,
                      name='pre_calc')(rgb)
        x1 = ConvBlock(n1, 7, 1, packed_input_2d=pp, spatial_axis=sp,
                       name='conv1')(x)
        x1p = PackLayerConv3d(n1, PACK_KERNEL[0], d=NUM_3D_FEAT,
                              input_packed=pp, spatial_axis=sp,
                              name='pack1')(x1)
        x2 = ResidualBlock(n2, NUM_BLOCKS[0], 1, self.dropout,
                           spatial_axis=sp, name='conv2')(x1p, train)
        x2p = PackLayerConv3d(n2, PACK_KERNEL[1], d=NUM_3D_FEAT,
                              spatial_axis=sp, name='pack2')(x2)
        x3 = ResidualBlock(n3, NUM_BLOCKS[1], 1, self.dropout,
                           spatial_axis=sp, name='conv3')(x2p, train)
        x3p = PackLayerConv3d(n3, PACK_KERNEL[2], d=NUM_3D_FEAT,
                              spatial_axis=sp, name='pack3')(x3)
        x4 = ResidualBlock(n4, NUM_BLOCKS[2], 1, self.dropout,
                           spatial_axis=sp, name='conv4')(x3p, train)
        x4p = PackLayerConv3d(n4, PACK_KERNEL[3], d=NUM_3D_FEAT,
                              spatial_axis=sp, name='pack4')(x4)
        x5 = ResidualBlock(n5, NUM_BLOCKS[3], 1, self.dropout,
                           spatial_axis=sp, name='conv5')(x4p, train)
        x5p = PackLayerConv3d(n5, PACK_KERNEL[4], d=NUM_3D_FEAT,
                              spatial_axis=sp, name='pack5')(x5)
        # skip1 contract is the FULL-RES pre_calc output; with the packed
        # stem it is unpacked here, off the stem's critical path (its only
        # consumer is the decoder's iconv1)
        skip1 = unpack2d(x, 2) if pp else x
        return x5p, [skip1, x1p, x2p, x3p, x4p]


class PackNetDecoder(nn.Module):
    """Reference ``Decoder`` (``PackNetSAN01.py:64-152``); version A = concat skips."""
    out_channels: int = 1
    version: str = 'A'
    channels: tuple = SLIM_CHANNELS
    packed2d: bool = True      # run iconvs in the pack2d domain (version A)
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x5p, skips, train: bool = False):
        NI, N1, N2, N3, N4, N5 = self.channels
        sp = self.spatial_axis
        skip1, skip2, skip3, skip4, skip5 = skips
        # version A concatenates skips; the iconv ConvBlocks take the parts as
        # a LIST and run kernel-sliced convs summed — same math, no
        # materialized concat (ops/blocks.py ConvBlock docstring).  In the
        # unsharded version-A path the unpack layers additionally skip their
        # depth-to-space and the iconvs convolve the main input in the
        # pack2d DOMAIN (ops/phase_conv.expand_kernel_packed_2d) — exact
        # same math, no relayout, full 128-lane convs.
        cat = (lambda a, b: [a, b]) if self.version == 'A' \
            else (lambda a, b: [a + b])
        # the pack2d-domain iconvs and the W-packed disp heads inflate the
        # backward's wgrad when autodiff correlates at the expanded taps
        # (fwd+bwd measured 237 -> 383 ms in round 4); with the compact-
        # kernel custom VJP (ops/dualgrad.py) the backward runs at compact
        # size and they re-enter the train graph.  MTE_TRAIN_PACKED=0
        # restores the eval-only gating for A/B measurement.
        from mindtheedge_tpu.ops import dualgrad
        p2d = self.packed2d and self.version == 'A' and sp is None \
            and (not train or dualgrad.train_packed_enabled())
        head_pack = not train or dualgrad.train_packed_enabled()
        marks = (0,) if p2d else ()

        unpack5 = UnpackLayerConv3d(N5, UNPACK_KERNEL[0], d=NUM_3D_FEAT,
                                    emit_packed2d=p2d,
                                    spatial_axis=sp, name='unpack5')(x5p)
        iconv5 = ConvBlock(N5, ICONV_KERNEL[0], 1, spatial_axis=sp,
                           packed2d_parts=marks,
                           name='iconv5')(cat(unpack5, skip5))

        unpack4 = UnpackLayerConv3d(N4, UNPACK_KERNEL[1], d=NUM_3D_FEAT,
                                    emit_packed2d=p2d,
                                    spatial_axis=sp, name='unpack4')(iconv5)
        iconv4 = ConvBlock(N4, ICONV_KERNEL[1], 1, spatial_axis=sp,
                           packed2d_parts=marks,
                           name='iconv4')(cat(unpack4, skip4))
        inv_depth4 = InvDepthHead(self.out_channels, spatial_axis=sp,
                                  lane_pack=head_pack,
                                  name='disp4_layer')(iconv4)
        up4 = upsample_nearest2x(inv_depth4)

        unpack3 = UnpackLayerConv3d(N3, UNPACK_KERNEL[2], d=NUM_3D_FEAT,
                                    emit_packed2d=p2d,
                                    spatial_axis=sp, name='unpack3')(iconv4)
        iconv3 = ConvBlock(N3, ICONV_KERNEL[2], 1, spatial_axis=sp,
                           packed2d_parts=marks,
                           name='iconv3')(cat(unpack3, skip3) + [up4])
        inv_depth3 = InvDepthHead(self.out_channels, spatial_axis=sp,
                                  lane_pack=head_pack,
                                  name='disp3_layer')(iconv3)
        up3 = upsample_nearest2x(inv_depth3)

        unpack2 = UnpackLayerConv3d(N2, UNPACK_KERNEL[3], d=NUM_3D_FEAT,
                                    emit_packed2d=p2d,
                                    spatial_axis=sp, name='unpack2')(iconv3)
        iconv2 = ConvBlock(N2, ICONV_KERNEL[3], 1, spatial_axis=sp,
                           packed2d_parts=marks,
                           name='iconv2')(cat(unpack2, skip2) + [up3])
        inv_depth2 = InvDepthHead(self.out_channels, spatial_axis=sp,
                                  lane_pack=head_pack,
                                  name='disp2_layer')(iconv2)
        up2 = upsample_nearest2x(inv_depth2)

        unpack1 = UnpackLayerConv3d(N1, UNPACK_KERNEL[4], d=NUM_3D_FEAT,
                                    emit_packed2d=p2d,
                                    spatial_axis=sp, name='unpack1')(iconv2)
        iconv1 = ConvBlock(N1, ICONV_KERNEL[4], 1, spatial_axis=sp,
                           packed2d_parts=marks,
                           name='iconv1')(cat(unpack1, skip1) + [up2])
        inv_depth1 = InvDepthHead(self.out_channels, spatial_axis=sp,
                                  lane_pack=head_pack,
                                  name='disp1_layer')(iconv1)

        return [inv_depth1, inv_depth2, inv_depth3, inv_depth4]


class PackNetSAN(nn.Module):
    """PackNet-SAN (reference ``PackNetSAN01``, ``PackNetSAN01.py:155-349``).

    ``__call__(rgb, input_depth=None, rgb_edge=None, train=False)`` follows the
    reference forward contract (``:274-349``):

    * eval: single pass; if ``input_channels==4`` the rgb_edge map is
      concatenated as a 4th input channel and multiplies ``inv_depths[0]``.
    * train without lidar: RGB pass only -> ``{'inv_depths'}``.
    * train with lidar: RGB pass + RGBD(SAN-fused) pass ->
      ``{'inv_depths', 'inv_depths_rgbd', 'depth_loss'}`` where depth_loss is
      the mean L2 between the two passes' skip features (rgbd detached).
    """
    version: str = '1A'
    dropout: Optional[float] = None
    input_channels: int = 3
    output_channels: int = 1
    channels: tuple = SLIM_CHANNELS
    # False: store residuals; True: full-module remat (for HBM CAPACITY —
    # loses on bandwidth: 409 vs 237 ms/step measured); 'conv': selective —
    # save conv outputs only, recompute GN/ELU/mask chains in the backward
    # fusion (the byte-reduction lever for the HBM-saturated bwd)
    remat: Any = False
    freeze_encoder: bool = False   # enforced by the optimizer partition, not here
    freeze_decoder: bool = False
    freeze_san: bool = False
    spatial_axis: Optional[str] = None   # H-sharded rgb path (parallel/spatial.py)

    def setup(self):
        # jax.checkpoint on the big submodules trades recompute for HBM —
        # required for full-res (384x1280) training batches on one chip.
        kw = {}
        if self.remat == 'conv':
            kw['policy'] = jax.checkpoint_policies.save_only_these_names(
                'conv_out')
        Enc = nn.remat(PackNetSlimEncoder, static_argnums=(2,), **kw) \
            if self.remat else PackNetSlimEncoder
        Dec = nn.remat(PackNetDecoder, static_argnums=(3,), **kw) \
            if self.remat else PackNetDecoder
        self.encoder = Enc(dropout=self.dropout, channels=self.channels,
                           spatial_axis=self.spatial_axis)
        self.decoder = Dec(out_channels=self.output_channels,
                           version=self.version[1:] or 'A',
                           channels=self.channels,
                           spatial_axis=self.spatial_axis)
        San = nn.remat(SparseDepthEncoder, static_argnums=(2,), **kw) \
            if self.remat else SparseDepthEncoder
        self.mconvs = San(channels=tuple(self.channels[1:]),
                          spatial_axis=self.spatial_axis)
        # Learnable per-level fusion scale/shift (PackNetSAN01.py:209-210)
        self.weight = self.param('weight', nn.initializers.ones, (5,), jnp.float32)
        self.bias = self.param('bias', nn.initializers.zeros, (5,), jnp.float32)

    def run_network(self, rgb, input_depth=None, train=False):
        x5p, skips = self.encoder(rgb, train)   # positional: remat static arg
        if input_depth is not None:
            san = self.mconvs(input_depth, train)
            w, b = self.weight, self.bias
            for i in range(4):
                skips[i + 1] = skips[i + 1] * w[i] + san[i] + b[i]
            x5p = x5p * w[4] + san[4] + b[4]
        inv_depths = self.decoder(x5p, skips, train)
        return inv_depths, skips + [x5p]

    def __call__(self, rgb, input_depth=None, rgb_edge=None, train=False, **kwargs):
        if self.input_channels == 4:
            net_in = jnp.concatenate([rgb, rgb_edge], axis=-1)
        else:
            net_in = rgb

        if not train:
            inv_depths, _ = self.run_network(net_in, input_depth, train=False)
            if self.input_channels == 4:
                inv_depths[0] = inv_depths[0] * rgb_edge
            return {'inv_depths': inv_depths}

        inv_depths_rgb, skip_feat_rgb = self.run_network(net_in, None, train=True)
        output = {'inv_depths': inv_depths_rgb}
        if input_depth is None:
            return output

        inv_depths_rgbd, skip_feat_rgbd = self.run_network(net_in, input_depth, train=True)
        output['inv_depths_rgbd'] = inv_depths_rgbd
        # Feature-consistency loss between RGB and RGBD passes
        # (PackNetSAN01.py:335-338); rgbd features are the teacher (detached).
        loss = sum(
            jnp.mean((jax.lax.stop_gradient(srgbd.astype(jnp.float32))
                      - srgb.astype(jnp.float32)) ** 2)
            for srgbd, srgb in zip(skip_feat_rgbd, skip_feat_rgb)
        ) / len(skip_feat_rgbd)
        output['depth_loss'] = loss
        return output


class PackNet01(nn.Module):
    """Original PackNet (CVPR'20), RGB-only, versions 1A/1B
    (reference ``networks/depth/PackNet01.py``; channels ``:34-35``)."""
    version: str = '1A'
    dropout: Optional[float] = None
    channels: tuple = FULL_CHANNELS
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, rgb, train: bool = False, **kwargs):
        x5p, skips = PackNetSlimEncoder(
            dropout=self.dropout, channels=self.channels,
            spatial_axis=self.spatial_axis, name='encoder')(rgb, train)
        inv_depths = PackNetDecoder(
            out_channels=1, version=self.version[1:] or 'A',
            channels=self.channels, spatial_axis=self.spatial_axis,
            name='decoder')(x5p, skips, train)
        return {'inv_depths': inv_depths}


class PackNetSlim01(PackNet01):
    """Slim-channel PackNet variant (reference ``networks/depth/PackNetSlim01.py``)."""
    channels: tuple = SLIM_CHANNELS


def prepare_kernel_cache(model, variables, *example_inputs, **apply_kwargs):
    """Precompute every parameter-derived conv kernel for SERVING.

    The phase/packed/composed conv formulations derive kernels from raw
    params with chains of small batch-size-independent ops — a measured
    ~64 ms fixed cost per forward at 384x1280 (tools/probe_trainmode.py).
    For fixed-parameter serving, run this ONCE at the serving input shapes
    (the packing factors depend on widths) and pass the returned variables
    to ``apply``: the derivations become program inputs and vanish from the
    per-batch program.  Entries with mismatched shapes (other resolutions)
    are ignored by the modules, so a stale cache degrades to inline builds,
    never to wrong results (``ops/blocks.derived_kernel``).

    The example inputs may use batch 1 regardless of the serving batch.
    """
    collect = jax.jit(lambda v, *a: model.apply(
        v, *a, train=False, mutable=['kernel_cache'], **apply_kwargs)[1])
    mutated = collect(variables, *example_inputs)
    out = dict(variables)
    out['kernel_cache'] = mutated['kernel_cache']
    return out
