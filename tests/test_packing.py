import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mindtheedge_tpu.ops.packing import pack2d, unpack2d, upsample_nearest2x


def test_pack_unpack_roundtrip():
    x = np.random.randn(2, 8, 12, 5).astype(np.float32)
    y = unpack2d(pack2d(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, rtol=0, atol=0)


def test_unpack_matches_torch_pixel_shuffle():
    # NHWC unpack2d must equal torch.nn.PixelShuffle on NCHW
    x = np.random.randn(2, 6, 10, 16).astype(np.float32)
    ours = np.asarray(unpack2d(jnp.asarray(x), r=2))
    theirs = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_pack_is_pixel_unshuffle():
    x = np.random.randn(1, 8, 8, 3).astype(np.float32)
    ours = np.asarray(pack2d(jnp.asarray(x), r=2))
    theirs = F.pixel_unshuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_upsample_nearest2x_matches_torch():
    x = np.random.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(upsample_nearest2x(jnp.asarray(x)))
    theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
                           mode='nearest').permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)
