"""Numerical parity vs the reference torch implementation.

These tests import the reference's torch layer definitions (CPU, no
MinkowskiEngine dependency at the layers01 level), port their weights through
``utils/torch_port.py``'s mapping, and compare activations — validating both
the op semantics and the checkpoint-porting transposes end to end.

Skipped when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference repo not mounted')


@pytest.fixture(scope='module')
def ref_layers():
    sys.path.insert(0, REFERENCE)
    import importlib
    mod = importlib.import_module(
        'packnet_code.packnet_sfm.networks.layers.packnet.layers01')
    return mod


def _to_jax_convblock(tblock, x):
    """Port a reference Conv2D block and run our ConvBlock on x (NHWC)."""
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import ConvBlock
    from mindtheedge_tpu.utils.torch_port import _conv_block

    out_ch = tblock.conv_base.out_channels
    k = tblock.conv_base.kernel_size[0]
    stride = tblock.conv_base.stride[0]
    mod = ConvBlock(out_ch, k, stride)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    src = {f'blk.{name}': p for name, p in tblock.state_dict().items()}
    _conv_block(params, src, 'blk')
    return np.asarray(mod.apply({'params': params}, jnp.asarray(x)))


def test_reference_conv2d_block_parity(ref_layers):
    import torch
    rng = np.random.RandomState(0)
    x = rng.rand(2, 24, 32, 16).astype(np.float32)
    tblock = ref_layers.Conv2D(16, 32, 5, 1).eval()
    with torch.no_grad():
        ty = tblock(torch.from_numpy(x).permute(0, 3, 1, 2))
    ty = ty.permute(0, 2, 3, 1).numpy()
    jy = _to_jax_convblock(tblock, x)
    np.testing.assert_allclose(jy, ty, rtol=1e-4, atol=1e-4)


def test_reference_pack_layer_parity(ref_layers):
    import torch
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import PackLayerConv3d
    from mindtheedge_tpu.utils.torch_port import _pack_layer

    rng = np.random.RandomState(1)
    x = rng.rand(1, 16, 24, 32).astype(np.float32)   # NHWC, C=32
    tpack = ref_layers.PackLayerConv3d(32, 3, r=2, d=4).eval()
    with torch.no_grad():
        ty = tpack(torch.from_numpy(x).permute(0, 3, 1, 2))
    ty = ty.permute(0, 2, 3, 1).numpy()

    mod = PackLayerConv3d(32, 3, d=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    src = {f'p.{name}': p for name, p in tpack.state_dict().items()}
    _pack_layer(params, src, 'p')
    jy = np.asarray(mod.apply({'params': params}, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=1e-4)


def test_reference_unpack_layer_parity(ref_layers):
    import torch
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import UnpackLayerConv3d
    from mindtheedge_tpu.utils.torch_port import _pack_layer

    rng = np.random.RandomState(2)
    x = rng.rand(1, 8, 12, 64).astype(np.float32)
    tunpack = ref_layers.UnpackLayerConv3d(64, 32, 3, r=2, d=4).eval()
    with torch.no_grad():
        ty = tunpack(torch.from_numpy(x).permute(0, 3, 1, 2))
    ty = ty.permute(0, 2, 3, 1).numpy()

    mod = UnpackLayerConv3d(32, 3, d=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    src = {f'p.{name}': p for name, p in tunpack.state_dict().items()}
    _pack_layer(params, src, 'p')
    jy = np.asarray(mod.apply({'params': params}, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=1e-4)


def test_reference_residual_block_parity(ref_layers):
    import torch
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import ResidualBlock
    from mindtheedge_tpu.utils.torch_port import _residual_block

    rng = np.random.RandomState(3)
    x = rng.rand(1, 16, 20, 32).astype(np.float32)
    tblk = ref_layers.ResidualBlock(32, 64, 2, 1, dropout=None).eval()
    with torch.no_grad():
        ty = tblk(torch.from_numpy(x).permute(0, 3, 1, 2))
    ty = ty.permute(0, 2, 3, 1).numpy()

    mod = ResidualBlock(64, 2, 1, None)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    src = {f'rb.{name}': p for name, p in tblk.state_dict().items()}
    _residual_block(params, src, 'rb', 2)
    jy = np.asarray(mod.apply({'params': params}, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=1e-4)
