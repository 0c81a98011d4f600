import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from mindtheedge_tpu.ops.blocks import ConvBlock, Conv3dOverChannels


def _port_conv(params_conv, tconv):
    """Copy torch conv weights into a flax conv param dict (NHWC kernel)."""
    params_conv['kernel'] = jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 3, 1, 0))
    if tconv.bias is not None:
        params_conv['bias'] = jnp.asarray(tconv.bias.detach().numpy())


def test_convblock_matches_torch_conv_gn_elu():
    """ConvBlock == pad(k//2) -> Conv2d -> GroupNorm(16) -> ELU (layers01.py:11-38)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 20, 32).astype(np.float32)

    tconv = nn.Conv2d(32, 64, kernel_size=5, stride=1)
    tnorm = nn.GroupNorm(16, 64)
    with torch.no_grad():
        tnorm.weight.uniform_(0.5, 1.5)
        tnorm.bias.uniform_(-0.5, 0.5)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = F.elu(tnorm(tconv(F.pad(tx, [2] * 4)))).permute(0, 2, 3, 1).detach().numpy()

    mod = ConvBlock(64, 5, 1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    _port_conv(params['conv'], tconv)
    params['norm']['scale'] = jnp.asarray(tnorm.weight.detach().numpy())
    params['norm']['bias'] = jnp.asarray(tnorm.bias.detach().numpy())
    jy = np.asarray(mod.apply({'params': params}, jnp.asarray(x)))

    np.testing.assert_allclose(jy, ty, rtol=1e-4, atol=1e-4)


def test_conv3d_over_channels_matches_torch_conv3d():
    """The pack-layer 3D conv flatten order must match layers01.py:240-248."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 8, 12).astype(np.float32)   # NHWC, D=12 channels
    d = 4

    tconv = nn.Conv3d(1, d, kernel_size=3, padding=1)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2).unsqueeze(1)  # [B,1,D,H,W]
    ty = tconv(tx)
    b, c, dd, h, w = ty.shape
    ty = ty.reshape(b, c * dd, h, w).permute(0, 2, 3, 1).detach().numpy()

    mod = Conv3dOverChannels(d)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))['params']
    params['kernel'] = jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0))
    params['bias'] = jnp.asarray(tconv.bias.detach().numpy())
    jy = np.asarray(mod.apply({'params': params}, jnp.asarray(x)))

    np.testing.assert_allclose(jy, ty, rtol=1e-4, atol=1e-4)


def test_phase_packed_convblock_exact():
    """phase_pack=True output == pack2d(ConvBlock(x)) exactly (phase_conv.py)."""
    from mindtheedge_tpu.ops.packing import pack2d
    rng = np.random.RandomState(2)
    x = rng.randn(2, 16, 24, 32).astype(np.float32)

    for k in (3, 5, 7):
        ref = ConvBlock(32, k, 1, phase_pack=False)
        pp = ConvBlock(32, k, 1, phase_pack=True)
        params = ref.init(jax.random.PRNGKey(k), jnp.asarray(x))
        # identical parameter trees by construction
        params_pp = pp.init(jax.random.PRNGKey(k), jnp.asarray(x))
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_pp))
        y_ref = pack2d(ref.apply(params, jnp.asarray(x)), 2)
        y_pp = pp.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_phase_packed_encoder_matches_reference_path():
    """Full encoder with phase_packed_stem on == off (same params)."""
    from mindtheedge_tpu.models.packnet import PackNetSlimEncoder
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    enc_ref = PackNetSlimEncoder(phase_packed_stem=False)
    enc_pp = PackNetSlimEncoder(phase_packed_stem=True)
    v = enc_ref.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        enc_pp.init(jax.random.PRNGKey(0), x, False)))
    a5, askips = enc_ref.apply(v, x, False)
    b5, bskips = enc_pp.apply(v, x, False)
    for a, b in zip([a5] + askips, [b5] + bskips):
        # float reassociation accumulates through 5 pack levels: ~1e-5 abs
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_split_input_convblock_matches_concat():
    """ConvBlock on a LIST of parts (kernel-sliced convs summed, no concat)
    must match ConvBlock on the concatenated tensor — both the lane-packed
    (out<128) and plain (out>=128) paths, with an identical parameter tree."""
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(2, 16, 24, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 16, 24, 16).astype(np.float32))
    c = jnp.asarray(rng.randn(2, 16, 24, 1).astype(np.float32))
    xcat = jnp.concatenate([a, b, c], axis=-1)

    for out in (32, 128):
        mod = ConvBlock(out, 3, 1)
        params = mod.init(jax.random.PRNGKey(0), xcat)
        p2 = mod.init(jax.random.PRNGKey(0), [a, b, c])
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(p2)
        y_cat = np.asarray(mod.apply(params, xcat))
        y_split = np.asarray(mod.apply(params, [a, b, c]))
        np.testing.assert_allclose(y_split, y_cat, rtol=2e-5, atol=2e-5)

    # single-element list degrades to the plain path
    mod = ConvBlock(32, 3, 1)
    params = mod.init(jax.random.PRNGKey(0), a)
    np.testing.assert_array_equal(
        np.asarray(mod.apply(params, [a])), np.asarray(mod.apply(params, a)))
