"""PoseNet: SfmLearner-style 7-conv pose regressor (flax / NHWC).

Reference: ``networks/pose/PoseNet.py:39-85`` — stride-2 Conv+GroupNorm(16)+
ReLU stack, 1x1 pose head, global mean, x0.01 scaling to 6-DoF per context
image (tx,ty,tz,rx,ry,rz).
"""

import jax.numpy as jnp
import flax.linen as nn

from mindtheedge_tpu.ops.blocks import GroupNorm

_xavier = nn.initializers.xavier_uniform()


class _ConvGN(nn.Module):
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(2, 2), padding=[(p, p), (p, p)],
                    kernel_init=_xavier, name='conv')(x)
        x = GroupNorm(num_groups=16, name='norm')(x)
        return nn.relu(x)


class PoseNet(nn.Module):
    nb_ref_imgs: int = 2
    rotation_mode: str = 'euler'

    @nn.compact
    def __call__(self, image, context):
        assert len(context) == self.nb_ref_imgs
        x = jnp.concatenate([image] + list(context), axis=-1)
        channels = [16, 32, 64, 128, 256, 256, 256]
        kernels = [7, 5, 3, 3, 3, 3, 3]
        for i, (c, k) in enumerate(zip(channels, kernels)):
            x = _ConvGN(c, k, name=f'conv{i + 1}')(x)
        pose = nn.Conv(6 * self.nb_ref_imgs, (1, 1),
                       kernel_init=_xavier, name='pose_pred')(x)
        pose = pose.mean(axis=(1, 2))
        return 0.01 * pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)
