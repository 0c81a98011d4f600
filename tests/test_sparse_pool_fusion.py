"""Regression: the SAN ladder must stay finite when whole-program compiled.

XLA:TPU miscompiled the fusion of the masked max-pool's strided-slice max
chain into the (wide, fused) downstream sparse conv at batch >= 4 full-res
shapes: every individually-materialized stage was finite, but the fused
two-level program produced NaN at ~10% of active sites (deterministic, both
bf16 and f32).  ``masked_max_pool_3x3_s2`` now (a) masks inactive sites to
the finite float minimum instead of -inf (NaN-safe under any
multiply-by-zero a rewrite may introduce; identical results for the >= 0
activations this pool ever sees), and (b) emits an optimization_barrier so
the pooled tensor materializes instead of fusing into the consumer conv.

The CPU backend never miscompiled this, so the small CPU test here pins the
barrier + finite-min semantics; the full-scale case is covered on real TPU
by bench.py's in-loop finiteness assert (bench.py:124).
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mindtheedge_tpu.ops.sparse import MinkConvBlock, masked_max_pool_3x3_s2


def test_pool_masks_with_finite_min_not_inf():
    """Pooled output contains no non-finite values even before the where()
    zeroing would hide them (guards the -inf -> finfo.min change)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 20, 4).astype(np.float32)) * 80.0
    mask = jnp.asarray((rng.rand(2, 16, 20, 1) > 0.97).astype(np.float32))
    pooled, new_mask = jax.jit(masked_max_pool_3x3_s2)(x * mask, mask)
    assert np.isfinite(np.asarray(pooled)).all()
    # active outputs still take the max over active inputs only
    xm = np.asarray(x * mask)[0, :, :, 0]
    m = np.asarray(mask)[0, :, :, 0]
    p = np.asarray(pooled)[0, :, :, 0]
    nm = np.asarray(new_mask)[0, :, :, 0]
    for i in range(p.shape[0]):
        for j in range(p.shape[1]):
            cell = m[2 * i:2 * i + 2, 2 * j:2 * j + 2]
            if cell.max() == 0:
                assert p[i, j] == 0.0
                assert nm[i, j] == 0.0
            else:
                win_v = xm[max(0, 2 * i - 1):2 * i + 2,
                           max(0, 2 * j - 1):2 * j + 2]
                win_m = m[max(0, 2 * i - 1):2 * i + 2,
                          max(0, 2 * j - 1):2 * j + 2]
                assert nm[i, j] == 1.0
                np.testing.assert_allclose(p[i, j], win_v[win_m > 0].max(),
                                           rtol=1e-6)


def test_phase_pool_matches_slice_chain_values_and_grads():
    """The C=1 lane-friendly phase pool (``_phase_pool_nonneg``) must equal
    the strided-slice chain exactly — values and gradients (20x faster on
    TPU at [8,384,1280,1]: 0.09 ms vs 1.8 ms, tools/probe_pool.py)."""
    rng = np.random.RandomState(1)
    d = rng.rand(2, 32, 48, 1).astype(np.float32) * 80.0
    d[rng.rand(2, 32, 48, 1) < 0.9] = 0.0
    x = jnp.asarray(d)
    mask = (x > 0).astype(x.dtype)

    from mindtheedge_tpu.ops.sparse import _chain_pool

    def pool_phase(x1):       # dispatches to the phase path (even H/W)
        p, m = masked_max_pool_3x3_s2(x1, (x1 > 0).astype(x1.dtype))
        return p, m

    def pool_chain(x1):       # the slice-chain oracle
        return _chain_pool(x1, (x1 > 0).astype(x1.dtype))

    p1, m1 = jax.jit(pool_phase)(x)
    p2, m2 = jax.jit(pool_chain)(x)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    g1 = jax.jit(jax.grad(lambda x_: pool_phase(x_)[0].sum()))(x)
    g2 = jax.jit(jax.grad(lambda x_: pool_chain(x_)[0].sum()))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_phase_pool_multichannel_matches_chain():
    """The generalized multi-channel phase pool (round 5: ALL ladder levels
    dispatch to it; the slice chain measured 9.6 ms vs a 1.0 ms floor at
    [8,192,640,32]) == the chain oracle: values, masks, gradients."""
    from mindtheedge_tpu.ops.sparse import _chain_pool

    rng = np.random.RandomState(2)
    v = rng.rand(2, 32, 48, 16).astype(np.float32) * 5.0
    active = (rng.rand(2, 32, 48, 1) < 0.3).astype(np.float32)
    x = jnp.asarray(v * active)          # >= 0, inactive exactly 0
    mask = jnp.asarray(active)

    p1, m1 = jax.jit(masked_max_pool_3x3_s2)(x, mask)
    p2, m2 = jax.jit(_chain_pool)(x, mask)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    g1 = jax.jit(jax.grad(
        lambda x_: masked_max_pool_3x3_s2(x_, mask)[0].sum()))(x)
    g2 = jax.jit(jax.grad(lambda x_: _chain_pool(x_, mask)[0].sum()))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_two_level_ladder_finite_whole_program():
    """Two MinkConvBlocks compiled as ONE program stay finite (the TPU
    miscompile shape scaled down; on CPU this pins the barrier path)."""

    class TwoLevel(nn.Module):
        @nn.compact
        def __call__(self, depth, train=False):
            mask = (depth > 0).astype(depth.dtype)
            x0, m0 = MinkConvBlock(32, 5, name='mconv0')(depth, mask, train)
            x1, m1 = MinkConvBlock(64, 5, name='mconv1')(x0, m0, train)
            return x1

    rng = np.random.RandomState(0)
    depth = rng.rand(4, 96, 160, 1).astype(np.float32) * 80.0
    depth[rng.rand(4, 96, 160, 1) < 0.95] = 0.0
    depth = jnp.asarray(depth)
    mod = TwoLevel()
    v = jax.jit(lambda k, d: mod.init(k, d, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 1)))
    x1 = jax.jit(lambda v_, d: mod.apply(v_, d, False))(v, depth)
    assert np.isfinite(np.asarray(x1)).all()
