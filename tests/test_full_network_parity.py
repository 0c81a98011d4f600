"""FULL-network numerical parity vs the reference torch PackNet-SAN.

Round-1 proved per-block parity; this composes the whole thing: the
reference ``PackNetSlimEnc01`` + ``Decoder``
(``/root/reference/packnet_code/packnet_sfm/networks/depth/PackNetSAN01.py:22-152``)
are instantiated (MinkowskiEngine stubbed in sys.modules — the RGB path never
touches it), their weights ported through ``utils/torch_port.port_packnet_san``,
and the full RGB-path forward is compared at all 4 output scales and two
input shapes.  Any skip/unpack wiring error fails here (VERDICT r1 missing #4).
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                 reason='reference repo not mounted')]


@pytest.fixture(scope='module')
def ref_net_module():
    torch = pytest.importorskip('torch')
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # Stub MinkowskiEngine so PackNetSAN01.py imports; the encoder/decoder
    # classes under test never touch it.
    if 'MinkowskiEngine' not in sys.modules:
        me = types.ModuleType('MinkowskiEngine')
        me.__getattr__ = lambda name: (lambda *a, **k: None)
        sys.modules['MinkowskiEngine'] = me
    import importlib
    return importlib.import_module(
        'packnet_code.packnet_sfm.networks.depth.PackNetSAN01')


def _build_reference(ref_net_module, seed=0):
    import torch
    torch.manual_seed(seed)
    ni, n1, n2, n3, n4, n5 = 32, 32, 64, 128, 256, 512
    enc = ref_net_module.PackNetSlimEnc01(
        'A', 3, ni, n1, n2, n3, n4, n5,
        pack_kernel=[5, 3, 3, 3, 3], num_blocks=[2, 2, 3, 3],
        num_3d_feat=4, dropout=None)
    dec = ref_net_module.Decoder(
        'A', 1, ni, n1, n2, n3, n4, n5,
        unpack_kernel=[3, 3, 3, 3, 3], iconv_kernel=[3, 3, 3, 3, 3],
        num_3d_feat=4)
    # the reference's init_weights (PackNetSAN01.py:214-220) — xavier + zero
    # bias — applied to the composed net so weights are non-trivial
    for m in list(enc.modules()) + list(dec.modules()):
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
            torch.nn.init.xavier_uniform_(m.weight)
            if m.bias is not None:
                m.bias.data.zero_()
        if isinstance(m, torch.nn.GroupNorm):
            # non-identity norm affine params to exercise the port
            torch.nn.init.uniform_(m.weight, 0.5, 1.5)
            torch.nn.init.uniform_(m.bias, -0.2, 0.2)
    enc.eval()
    dec.eval()
    return enc, dec


@pytest.mark.parametrize('shape', [(64, 96), (96, 160)])
def test_full_rgb_path_parity(ref_net_module, shape):
    import torch
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.models.packnet import PackNetSAN
    from mindtheedge_tpu.utils.torch_port import port_packnet_san

    enc, dec = _build_reference(ref_net_module)
    h, w = shape
    rng = np.random.RandomState(42)
    rgb = rng.rand(1, h, w, 3).astype(np.float32)

    # reference forward (NCHW)
    with torch.no_grad():
        x5p, skips = enc(torch.from_numpy(rgb.transpose(0, 3, 1, 2)))
        ref_out = dec(x5p, skips)
    ref_out = [o.numpy().transpose(0, 2, 3, 1) for o in ref_out]

    # ours: init, then port the torch weights in
    model = PackNetSAN(version='1A')
    variables = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(rgb),
        jnp.zeros((1, h, w, 1), jnp.float32))
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    state_dict = {f'encoder.{k}': v for k, v in enc.state_dict().items()}
    state_dict.update({f'decoder.{k}': v for k, v in dec.state_dict().items()})
    params, _, _ = port_packnet_san(state_dict, params)
    variables = {**variables, 'params': params}

    out = jax.jit(lambda v, r: model.apply(v, r, None, train=False))(
        variables, jnp.asarray(rgb))
    ours = [np.asarray(o) for o in out['inv_depths']]

    assert len(ours) == len(ref_out) == 4
    for scale, (a, b) in enumerate(zip(ours, ref_out)):
        assert a.shape == b.shape, (scale, a.shape, b.shape)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4,
            err_msg=f'scale {scale} diverges at shape {shape}')
