"""Torch checkpoint -> JAX parameter porting for PackNet-SAN.

Maps the reference's torch ``state_dict`` names (``PackNetSAN01.py``,
``layers01.py``; checkpoints saved by ``model_checkpoint.py:71-80``, possibly
with a ``model.depth_net.`` prefix per ``utils/load.py:117-166``) onto this
framework's flax param tree, with layout transposes:

* Conv2d  [O,I,kh,kw]     -> [kh,kw,I,O]
* Conv3d  [d,1,3,3,3]     -> [3,3,3,1,d]
* GroupNorm weight/bias   -> scale/bias
* BatchNorm (SAN)         -> MaskedBatchNorm scale/bias + batch_stats
* MinkowskiConvolution kernels [K^2, I, O] -> [kh,kw,I,O]; ME orders kernel
  offsets with the first coordinate varying fastest (hypercube region); set
  ``minkowski_offset_order`` if a ported SAN checkpoint mismatches.

Use ``port_packnet_san(torch_state_dict, jax_params)``.
"""

import re

import numpy as np


def _t_conv2d(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_conv3d(w):
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _t_mink(w, k, minkowski_offset_order='first_fastest'):
    """[K^2, I, O] -> [kh, kw, I, O]."""
    w = np.asarray(w)
    kk, i, o = w.shape
    assert kk == k * k, f'Minkowski kernel size mismatch {kk} vs {k}x{k}'
    w = w.reshape(k, k, i, o)
    if minkowski_offset_order == 'first_fastest':
        # offsets iterate the first (row) coordinate fastest -> stored as
        # (col-major); transpose spatial dims
        w = np.transpose(w, (1, 0, 2, 3))
    return w


def _strip_prefix(state_dict):
    """Remove 'model.depth_net.' / 'depth_net.' / 'module.' prefixes."""
    out = {}
    for key, val in state_dict.items():
        for prefix in ('model.depth_net.', 'depth_net.', 'module.', 'model.'):
            if key.startswith(prefix):
                key = key[len(prefix):]
        out[key] = val
    return out


def _conv_block(dst, src, name):
    """ConvBlock <- reference Conv2D (conv_base + normalize)."""
    dst['conv']['kernel'] = _t_conv2d(src[f'{name}.conv_base.weight'])
    dst['conv']['bias'] = np.asarray(src[f'{name}.conv_base.bias'])
    dst['norm']['scale'] = np.asarray(src[f'{name}.normalize.weight'])
    dst['norm']['bias'] = np.asarray(src[f'{name}.normalize.bias'])


def _residual_conv(dst, src, name):
    _conv_block(dst['conv1'], src, f'{name}.conv1')
    _conv_block(dst['conv2'], src, f'{name}.conv2')
    # shortcut conv3 may be wrapped in Sequential when dropout is set
    # (layers01.py:65-66): 'conv3.0.weight' instead of 'conv3.weight'
    key = f'{name}.conv3.weight' if f'{name}.conv3.weight' in src \
        else f'{name}.conv3.0.weight'
    dst['conv3']['kernel'] = _t_conv2d(src[key])
    dst['conv3']['bias'] = np.asarray(src[key.replace('weight', 'bias')])
    dst['norm']['scale'] = np.asarray(src[f'{name}.normalize.weight'])
    dst['norm']['bias'] = np.asarray(src[f'{name}.normalize.bias'])


def _residual_block(dst, src, name, num_blocks):
    for i in range(num_blocks):
        _residual_conv(dst[f'block{i}'], src, f'{name}.{i}')


def _pack_layer(dst, src, name):
    dst['conv3d']['kernel'] = _t_conv3d(src[f'{name}.conv3d.weight'])
    dst['conv3d']['bias'] = np.asarray(src[f'{name}.conv3d.bias'])
    _conv_block(dst['conv'], src, f'{name}.conv')


def _inv_depth(dst, src, name):
    dst['conv1']['kernel'] = _t_conv2d(src[f'{name}.conv1.weight'])
    dst['conv1']['bias'] = np.asarray(src[f'{name}.conv1.bias'])


def port_packnet_san(torch_state, jax_params, batch_stats=None,
                     minkowski_offset_order='first_fastest'):
    """Port a reference PackNetSAN01 state_dict into our param tree in place.

    ``torch_state``: dict of numpy arrays (call ``.numpy()`` on torch tensors
    first or pass a torch state_dict — tensors are converted on the fly).
    Returns (jax_params, batch_stats, n_ported).
    """
    src = {}
    for key, val in _strip_prefix(torch_state).items():
        src[key] = val.detach().cpu().numpy() if hasattr(val, 'detach') else np.asarray(val)
    p = jax_params
    n0 = _count(p)

    enc = p['encoder']
    _conv_block(enc['pre_calc'], src, 'encoder.pre_calc')
    _conv_block(enc['conv1'], src, 'encoder.conv1')
    num_blocks = [2, 2, 3, 3]
    for i, nb in enumerate(num_blocks):
        _residual_block(enc[f'conv{i + 2}'], src, f'encoder.conv{i + 2}', nb)
    for i in range(1, 6):
        _pack_layer(enc[f'pack{i}'], src, f'encoder.pack{i}')

    dec = p['decoder']
    for i in range(1, 6):
        _pack_layer(dec[f'unpack{i}'], src, f'decoder.unpack{i}')
        _conv_block(dec[f'iconv{i}'], src, f'decoder.iconv{i}')
    for i in range(1, 5):
        _inv_depth(dec[f'disp{i}_layer'], src, f'decoder.disp{i}_layer')

    # SAN fusion scale/shift vectors (PackNetSAN01.py:209-210)
    if 'weight' in src:
        p['weight'] = np.asarray(src['weight'])
        p['bias'] = np.asarray(src['bias'])

    # SAN Minkowski ladder
    if any(k.startswith('mconvs.') for k in src):
        kernel_sizes = [5, 5, 3, 3, 3]
        layer_convs = {'layer1': 1, 'layer2': 2, 'layer3': 3}
        for lvl in range(5):
            mdst = p['mconvs'][f'mconv{lvl}']
            k = kernel_sizes[lvl]
            for lname, n_convs in layer_convs.items():
                conv_slot = 0
                bn_slot = 0
                # torch Sequential interleaves Conv/BN/ReLU; conv indices are
                # 0,3,6 and BN indices 1,4 (minkowski_encoder.py:27-52)
                for j in range(n_convs):
                    seq_idx = j * 3
                    key = f'mconvs.mconvs.{lvl}.{lname}.{seq_idx}.kernel'
                    if key in src:
                        mdst[f'{lname}_{conv_slot}']['conv']['kernel'] = \
                            _t_mink(src[key], k, minkowski_offset_order)
                        conv_slot += 1
                    bn_key = f'mconvs.mconvs.{lvl}.{lname}.{seq_idx + 1}.bn.weight'
                    if j < n_convs - 1 and bn_key in src:
                        bdst = mdst[f'{lname}_bn{bn_slot}']
                        bdst['scale'] = np.asarray(src[bn_key])
                        bdst['bias'] = np.asarray(src[bn_key.replace('weight', 'bias')])
                        if batch_stats is not None:
                            bs = batch_stats['mconvs'][f'mconv{lvl}'][f'{lname}_bn{bn_slot}']
                            bs['mean'] = np.asarray(
                                src[bn_key.replace('weight', 'running_mean')])
                            bs['var'] = np.asarray(
                                src[bn_key.replace('weight', 'running_var')])
                        bn_slot += 1
            fkey = f'mconvs.mconvs.{lvl}.layer_final.0.bn.weight'
            if fkey in src:
                mdst['final_bn']['scale'] = np.asarray(src[fkey])
                mdst['final_bn']['bias'] = np.asarray(src[fkey.replace('weight', 'bias')])
                if batch_stats is not None:
                    bs = batch_stats['mconvs'][f'mconv{lvl}']['final_bn']
                    bs['mean'] = np.asarray(src[fkey.replace('weight', 'running_mean')])
                    bs['var'] = np.asarray(src[fkey.replace('weight', 'running_var')])

    assert _count(p) == n0, 'porting must not change the param count'
    return p, batch_stats, n0


def _count(tree):
    import jax
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(tree))
