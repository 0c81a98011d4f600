"""ResNet depth/pose networks (monodepth2 style), flax/NHWC.

Reference: ``networks/layers/resnet/*`` (encoder/depth decoder/pose decoder/
layers) and ``networks/depth/DepthResNet.py`` / ``networks/pose/PoseResNet.py``.
ImageNet-pretrained init (the reference's "pt" version suffix pulls
torchvision weights) is not bundled; torch resnet weights can be ported with
the standard [O,I,kh,kw]->[kh,kw,I,O] transpose when available.
"""

from functools import partial
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

_kaiming = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


class BatchNorm(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=self.momentum, epsilon=self.epsilon,
                            name='bn')(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_kaiming, name='conv1')(x)
        y = BatchNorm(name='bn1')(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=_kaiming, name='conv2')(y)
        y = BatchNorm(name='bn2')(y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                               use_bias=False, kernel_init=_kaiming,
                               name='downsample_conv')(x)
            identity = BatchNorm(name='downsample_bn')(identity, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False,
                    kernel_init=_kaiming, name='conv1')(x)
        y = nn.relu(BatchNorm(name='bn1')(y, train))
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_kaiming, name='conv2')(y)
        y = nn.relu(BatchNorm(name='bn2')(y, train))
        y = nn.Conv(out_ch, (1, 1), use_bias=False,
                    kernel_init=_kaiming, name='conv3')(y)
        y = BatchNorm(name='bn3')(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, kernel_init=_kaiming,
                               name='downsample_conv')(x)
            identity = BatchNorm(name='downsample_bn')(identity, train)
        return nn.relu(y + identity)


_RESNET_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
}


class ResnetEncoder(nn.Module):
    """5-feature-map encoder (``resnet_encoder.py:62-97``); input normalized
    with (x - 0.45) / 0.225."""
    num_layers: int = 18
    num_input_images: int = 1

    @property
    def num_ch_enc(self):
        chans = [64, 64, 128, 256, 512]
        if self.num_layers > 34:
            chans = [64] + [c * 4 for c in chans[1:]]
        return chans

    @nn.compact
    def __call__(self, x, train=False):
        block, layers = _RESNET_SPECS[self.num_layers]
        x = (x - 0.45) / 0.225
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_kaiming, name='conv1')(x)
        x = nn.relu(BatchNorm(name='bn1')(x, train))
        features = [x]
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        for stage, (n_blocks, planes, stride) in enumerate(
                zip(layers, (64, 128, 256, 512), (1, 2, 2, 2))):
            for b in range(n_blocks):
                x = block(planes, stride if b == 0 else 1,
                          name=f'layer{stage + 1}_{b}')(x, train)
            features.append(x)
        return features


def upsample2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Conv3x3Refl(nn.Module):
    """ReflectionPad(1) + 3x3 conv (``resnet/layers.py:39-54``)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode='reflect')
        return nn.Conv(self.out_channels, (3, 3), padding='VALID',
                       name='conv')(x)


class DepthDecoder(nn.Module):
    """monodepth2 decoder (``depth_decoder.py:17-65``)."""
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True

    @nn.compact
    def __call__(self, features):
        num_ch_dec = [16, 32, 64, 128, 256]
        outputs = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = nn.elu(Conv3x3Refl(num_ch_dec[i], name=f'upconv_{i}_0')(x))
            x = upsample2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = nn.elu(Conv3x3Refl(num_ch_dec[i], name=f'upconv_{i}_1')(x))
            if i in self.scales:
                outputs[i] = nn.sigmoid(
                    Conv3x3Refl(self.num_output_channels,
                                name=f'dispconv_{i}')(x))
        return outputs


def disp_to_depth(disp, min_depth=0.1, max_depth=100.0):
    """Sigmoid disparity -> (scaled_disp, depth) (``resnet/layers.py:12-21``)."""
    min_disp, max_disp = 1 / max_depth, 1 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1 / scaled_disp


class DepthResNet(nn.Module):
    """monodepth2-style depth net (``networks/depth/DepthResNet.py:28-55``).

    version 'XY': X = layers (18/34/50); 'pt' suffix (ImageNet weights) is
    accepted but weights must be ported separately.
    """
    version: str = '18'

    @nn.compact
    def __call__(self, rgb, train=False, **kwargs):
        num_layers = int(self.version[:2])
        feats = ResnetEncoder(num_layers, name='encoder')(rgb, train)
        disps = DepthDecoder(name='decoder')(feats)
        inv_depths = [disp_to_depth(disps[i])[0] for i in range(4)]
        if train:
            return {'inv_depths': inv_depths}
        return {'inv_depths': [inv_depths[0]]}


class PoseDecoder(nn.Module):
    """monodepth2 pose decoder (``pose_decoder.py:14-53``)."""
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2

    @nn.compact
    def __call__(self, last_features):
        feats = [nn.relu(nn.Conv(256, (1, 1), name=f'squeeze_{i}')(f))
                 for i, f in enumerate(last_features)]
        out = jnp.concatenate(feats, axis=-1)
        out = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                              name='pose_0')(out))
        out = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                              name='pose_1')(out))
        out = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1),
                      name='pose_2')(out)
        out = out.mean(axis=(1, 2))
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 6)
        return out


class PoseResNet(nn.Module):
    """ResNet18 pose net (``networks/pose/PoseResNet.py:12-49``)."""
    version: str = '18'

    @nn.compact
    def __call__(self, image, context, train=False):
        num_layers = int(self.version[:2])
        encoder = ResnetEncoder(num_layers, num_input_images=2, name='encoder')
        decoder = PoseDecoder(num_input_features=1,
                              num_frames_to_predict_for=1, name='decoder')
        poses = []
        for ctx in context:
            feats = encoder(jnp.concatenate([image, ctx], axis=-1), train)
            pose = decoder([feats[-1]])
            poses.append(pose[:, 0])
        # [B, n_ctx, 6] like the reference PoseNet contract
        return jnp.stack(poses, axis=1)


class RaySurfaceDecoder(nn.Module):
    """monodepth2-style decoder emitting a tanh ray surface
    (``resnet/raysurface_decoder.py:16-65``)."""
    num_output_channels: int = 3
    use_skips: bool = True

    @nn.compact
    def __call__(self, features):
        num_ch_dec = [16, 32, 64, 128, 256]
        x = features[-1]
        out = None
        for i in range(4, -1, -1):
            x = nn.elu(Conv3x3Refl(num_ch_dec[i], name=f'upconv_{i}_0')(x))
            x = upsample2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = nn.elu(Conv3x3Refl(num_ch_dec[i], name=f'upconv_{i}_1')(x))
            if i == 0:
                out = nn.tanh(Conv3x3Refl(self.num_output_channels,
                                          name='raysurfconv_0')(x))
        return out


class RaySurfaceResNet(nn.Module):
    """ResNet + ray-surface decoder for generic (non-pinhole) cameras
    (``networks/depth/RaySurfaceResNet.py:35-66``)."""
    version: str = '18'

    @nn.compact
    def __call__(self, rgb, train=False, **kwargs):
        num_layers = int(self.version[:2])
        feats = ResnetEncoder(num_layers, name='encoder')(rgb, train)
        disps = DepthDecoder(name='decoder')(feats)
        ray_surface = RaySurfaceDecoder(name='ray_surf')(feats)
        inv_depths = [disp_to_depth(disps[i])[0] for i in range(4)]
        if not train:
            inv_depths = [inv_depths[0]]
        return {'inv_depths': inv_depths, 'ray_surface': ray_surface}
