"""Compact-kernel custom VJPs (``ops/dualgrad.py``).

The packed conv formulations run the forward with expanded (phase / packed-
domain) kernels; dualgrad's custom_vjp makes the backward differentiate the
COMPACT formulation instead (wgrad at [kh,kw,ci,co] taps).  Pinned here:

* primal outputs are bit-identical with the wrapper on and off;
* gradients (dx, dK) equal plain autodiff through the expansion to float
  tolerance (both differentiate the same mathematical function);
* a full packed ResidualConv / MinkConvBlock training gradient equals the
  unpacked oracle's.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.ops import dualgrad


def _grads(fn, *args):
    loss = lambda *a: jnp.sum(jnp.sin(fn(*a)))  # nonlinear readout
    return jax.jit(jax.grad(loss, argnums=(0, 1)))(*args)


CASES = [
    ('phase2', lambda x, k: dualgrad.conv_phase(x, k, 2, 2), (2, 8, 12, 5), (3, 3, 5, 4)),
    ('phase_w4', lambda x, k: dualgrad.conv_phase(x, k, 1, 4), (2, 8, 12, 5), (3, 3, 5, 4)),
    ('phase_w2_k5', lambda x, k: dualgrad.conv_phase(x, k, 1, 2), (2, 8, 12, 5), (5, 5, 5, 4)),
    ('phase_1x1_w4', lambda x, k: dualgrad.conv_phase(x, k, 1, 4), (2, 8, 12, 5), (1, 1, 5, 4)),
    ('packed_w2', lambda x, k: dualgrad.conv_packed_w(x, k, 2), (2, 8, 6, 10), (3, 3, 5, 4)),
    ('packed_w4_k5', lambda x, k: dualgrad.conv_packed_w(x, k, 4), (2, 8, 3, 20), (5, 5, 5, 4)),
    ('packed_1x1_w4', lambda x, k: dualgrad.conv_packed_w(x, k, 4), (2, 8, 3, 20), (1, 1, 5, 4)),
    ('packed2d', lambda x, k: dualgrad.conv_packed_2d(x, k, 2), (2, 6, 8, 20), (3, 3, 5, 4)),
]


@pytest.mark.parametrize('name,fn,xshape,kshape',
                         CASES, ids=[c[0] for c in CASES])
def test_dual_matches_plain_autodiff(name, fn, xshape, kshape, monkeypatch):
    monkeypatch.setenv('MTE_COMPACT_VJP', '1')   # default off (measured loss)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*xshape).astype(np.float32))
    k = jnp.asarray(rng.randn(*kshape).astype(np.float32) * 0.2)

    y_dual = np.asarray(jax.jit(fn)(x, k))
    gx_dual, gk_dual = _grads(fn, x, k)

    monkeypatch.setenv('MTE_COMPACT_VJP', '0')
    y_plain = np.asarray(jax.jit(fn)(x, k))
    gx_plain, gk_plain = _grads(fn, x, k)

    np.testing.assert_array_equal(y_dual, y_plain,
                                  err_msg='primal must be bit-identical')
    np.testing.assert_allclose(np.asarray(gx_dual), np.asarray(gx_plain),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gk_dual), np.asarray(gk_plain),
                               rtol=2e-5, atol=2e-5)


def test_residualconv_packed_grads_match_unpacked_oracle(monkeypatch):
    """Full packed ResidualConv (conv1 phase_w -> conv2 packed_w -> packed
    1x1 shortcut) training gradient == the auto_lane_pack=False oracle."""
    monkeypatch.setenv('MTE_COMPACT_VJP', '1')
    from mindtheedge_tpu.ops.blocks import ResidualConv

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 16, 12).astype(np.float32))
    packed = ResidualConv(32)
    plain = ResidualConv(32, auto_lane_pack=False)
    v = packed.init(jax.random.PRNGKey(0), x, False)

    def loss(mod, v_, x_):
        return jnp.mean(jnp.abs(mod.apply(v_, x_, True)))

    l1, g1 = jax.value_and_grad(lambda v_: loss(packed, v_, x))(v)
    l0, g0 = jax.value_and_grad(lambda v_: loss(plain, v_, x))(v)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    key = lambda pv: jax.tree_util.keystr(pv[0])
    for (p1, a), (p0, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g1), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g0), key=key)):
        assert p1 == p0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(p1))


def test_minkconvblock_packed_grads_match_unpacked_oracle(monkeypatch):
    """SAN ladder level: lane-packed training gradients == lane_pack=False
    through the compact VJP."""
    monkeypatch.setenv('MTE_COMPACT_VJP', '1')
    from mindtheedge_tpu.ops.sparse import MinkConvBlock

    rng = np.random.RandomState(2)
    x = np.zeros((2, 16, 32, 1), np.float32)
    sel = rng.rand(2, 16, 32, 1) > 0.9
    x[sel] = rng.rand(sel.sum()).astype(np.float32) * 5
    x = jnp.asarray(x)
    mask = (x > 0).astype(jnp.float32)

    packed = MinkConvBlock(32, 5)
    plain = MinkConvBlock(32, 5, lane_pack=False)
    v = packed.init(jax.random.PRNGKey(0), x, mask, False)

    def loss(mod, v_):
        y, _ = mod.apply(v_, x, mask, True, mutable=['batch_stats'])[0]
        return jnp.mean(jnp.abs(y))

    l1, g1 = jax.value_and_grad(lambda v_: loss(packed, v_))(v)
    l0, g0 = jax.value_and_grad(lambda v_: loss(plain, v_))(v)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    key = lambda pv: jax.tree_util.keystr(pv[0])
    for (p1, a), (p0, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g1), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g0), key=key)):
        assert p1 == p0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(p1))
