"""Full-tree torch->JAX porting map coverage.

Builds a synthetic torch-style state_dict with the reference PackNetSAN01
key names and shapes (derived from our param tree via the inverse layout
transposes), ports it, and asserts every encoder/decoder/fusion leaf was
overwritten.  Combined with tests/test_reference_parity.py (numerical parity
per block against the actual reference torch code), this covers checkpoint
porting end to end without needing a real .ckpt in the image.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.models.packnet import PackNetSAN
from mindtheedge_tpu.utils import torch_port

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def jax_params():
    model = PackNetSAN(version='1A')
    rgb = jnp.zeros((1, 32, 64, 3))
    lidar = jnp.zeros((1, 32, 64, 1))
    variables = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(
        jax.random.PRNGKey(0), rgb, lidar)
    return jax.device_get(variables['params'])


def _torch_shape_conv2d(k):     # [kh,kw,I,O] -> [O,I,kh,kw]
    return (k.shape[3], k.shape[2], k.shape[0], k.shape[1])


def _torch_shape_conv3d(k):     # [3,3,3,1,d] -> [d,1,3,3,3]
    return (k.shape[4], k.shape[3], k.shape[0], k.shape[1], k.shape[2])


def _synth_state_dict(p):
    """Reference-named random state_dict with shapes matching our tree."""
    rng = np.random.RandomState(0)
    src = {}

    def conv_block(dst, name):
        src[f'{name}.conv_base.weight'] = rng.randn(
            *_torch_shape_conv2d(dst['conv']['kernel'])).astype(np.float32)
        src[f'{name}.conv_base.bias'] = rng.randn(
            *dst['conv']['bias'].shape).astype(np.float32)
        src[f'{name}.normalize.weight'] = rng.randn(
            *dst['norm']['scale'].shape).astype(np.float32)
        src[f'{name}.normalize.bias'] = rng.randn(
            *dst['norm']['bias'].shape).astype(np.float32)

    def residual(dst, name, num_blocks):
        for i in range(num_blocks):
            blk = dst[f'block{i}']
            conv_block(blk['conv1'], f'{name}.{i}.conv1')
            conv_block(blk['conv2'], f'{name}.{i}.conv2')
            src[f'{name}.{i}.conv3.weight'] = rng.randn(
                *_torch_shape_conv2d(blk['conv3']['kernel'])).astype(np.float32)
            src[f'{name}.{i}.conv3.bias'] = rng.randn(
                *blk['conv3']['bias'].shape).astype(np.float32)
            src[f'{name}.{i}.normalize.weight'] = rng.randn(
                *blk['norm']['scale'].shape).astype(np.float32)
            src[f'{name}.{i}.normalize.bias'] = rng.randn(
                *blk['norm']['bias'].shape).astype(np.float32)

    def pack(dst, name):
        src[f'{name}.conv3d.weight'] = rng.randn(
            *_torch_shape_conv3d(dst['conv3d']['kernel'])).astype(np.float32)
        src[f'{name}.conv3d.bias'] = rng.randn(
            *dst['conv3d']['bias'].shape).astype(np.float32)
        conv_block(dst['conv'], f'{name}.conv')

    enc = p['encoder']
    conv_block(enc['pre_calc'], 'encoder.pre_calc')
    conv_block(enc['conv1'], 'encoder.conv1')
    for i, nb in enumerate((2, 2, 3, 3)):
        residual(enc[f'conv{i + 2}'], f'encoder.conv{i + 2}', nb)
    for i in range(1, 6):
        pack(enc[f'pack{i}'], f'encoder.pack{i}')

    dec = p['decoder']
    for i in range(1, 6):
        pack(dec[f'unpack{i}'], f'decoder.unpack{i}')
        conv_block(dec[f'iconv{i}'], f'decoder.iconv{i}')
    for i in range(1, 5):
        d = dec[f'disp{i}_layer']
        src[f'decoder.disp{i}_layer.conv1.weight'] = rng.randn(
            *_torch_shape_conv2d(d['conv1']['kernel'])).astype(np.float32)
        src[f'decoder.disp{i}_layer.conv1.bias'] = rng.randn(
            *d['conv1']['bias'].shape).astype(np.float32)

    src['weight'] = rng.randn(5).astype(np.float32)
    src['bias'] = rng.randn(5).astype(np.float32)
    return src


def test_port_overwrites_every_encoder_decoder_leaf(jax_params):
    import copy
    p = copy.deepcopy(jax_params)
    before = {jax.tree_util.keystr(k): np.asarray(v).copy()
              for k, v in jax.tree_util.tree_flatten_with_path(p)[0]}
    src = _synth_state_dict(p)
    torch_port.port_packnet_san(src, p)

    changed = unchanged = 0
    for kp, val in jax.tree_util.tree_flatten_with_path(p)[0]:
        key = jax.tree_util.keystr(kp)
        if key.startswith("['mconvs']"):
            continue   # SAN kernels are ported only when present in the ckpt
        if np.allclose(before[key], np.asarray(val)):
            unchanged += 1
        else:
            changed += 1
    assert unchanged == 0, f'{unchanged} encoder/decoder leaves not ported'
    assert changed > 200


def test_port_with_model_prefix(jax_params):
    import copy
    p = copy.deepcopy(jax_params)
    src = {f'model.depth_net.{k}': v for k, v in _synth_state_dict(p).items()}
    _, _, n = torch_port.port_packnet_san(src, p)
    assert n > 0
