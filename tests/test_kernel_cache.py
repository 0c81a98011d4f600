"""Serving kernel cache (``ops/blocks.derived_kernel`` +
``models/packnet.prepare_kernel_cache``).

The parameter-derived conv kernels (phase/packed/composed expansions) are
batch-size-independent chains re-run inside every forward; for serving they
are collected once into a ``kernel_cache`` variables collection and become
program inputs.  Pinned here:

* cached apply == uncached apply BIT-exactly (same derivations, just hoisted);
* a stale cache (prepared at another resolution) is IGNORED, never misapplied;
* ``init`` never creates the collection (checkpoint trees stay cache-free).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.models.packnet import PackNetSAN, prepare_kernel_cache

pytestmark = pytest.mark.slow   # compiles several full models (~3 min)


def _setup():
    rng = np.random.RandomState(0)
    m = PackNetSAN(version='1A', channels=(16,) * 6)
    rgb = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    lid = jnp.asarray((rng.rand(1, 64, 128, 1) * 80 *
                       (rng.rand(1, 64, 128, 1) > 0.9)).astype(np.float32))
    v = jax.jit(lambda k, r, d: m.init(k, r, d, train=False))(
        jax.random.PRNGKey(0), rgb, lid)
    return m, v, rgb, lid


def test_cached_apply_bit_identical_and_init_clean():
    m, v, rgb, lid = _setup()
    assert 'kernel_cache' not in v   # init stays cache-free

    out_plain = jax.jit(lambda v_, r, d: m.apply(v_, r, d, train=False))(
        v, rgb, lid)
    vc = prepare_kernel_cache(m, v, rgb, lid)
    assert len(jax.tree_util.tree_leaves(vc['kernel_cache'])) > 20
    out_cached = jax.jit(lambda v_, r, d: m.apply(v_, r, d, train=False))(
        vc, rgb, lid)
    for s, (a, b) in enumerate(zip(out_plain['inv_depths'],
                                   out_cached['inv_depths'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f'scale {s}')


def test_stale_cache_ignored():
    m, v, rgb, lid = _setup()
    vc = prepare_kernel_cache(m, v, rgb, lid)
    rng = np.random.RandomState(1)
    rgb2 = jnp.asarray(rng.rand(1, 64, 256, 3).astype(np.float32))
    lid2 = jnp.zeros((1, 64, 256, 1), jnp.float32)
    with_stale = jax.jit(lambda v_, r, d: m.apply(v_, r, d, train=False))(
        vc, rgb2, lid2)
    without = jax.jit(lambda v_, r, d: m.apply(v_, r, d, train=False))(
        v, rgb2, lid2)
    np.testing.assert_array_equal(np.asarray(with_stale['inv_depths'][0]),
                                  np.asarray(without['inv_depths'][0]))


def test_same_shape_parts_get_distinct_cache_entries():
    """Two list-input parts with IDENTICAL shapes slice the kernel at
    different input-channel offsets; their derived-kernel cache entries must
    not collide (names carry the offset — a shape/dtype check alone cannot
    distinguish them)."""
    from mindtheedge_tpu.ops.blocks import ConvBlock

    rng = np.random.RandomState(0)
    # out=1 forces a large lane-pack rw in _split_conv -> derived kernels
    blk = ConvBlock(out_channels=16, kernel_size=3, auto_lane_pack=True)
    t1 = jnp.asarray(rng.rand(1, 16, 8, 16).astype(np.float32))
    t2 = jnp.asarray(rng.rand(1, 16, 8, 16).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), [t1, t2])

    out, mut = blk.apply(v, [t1, t2], mutable=['kernel_cache'])
    cache = mut.get('kernel_cache', {})
    if not cache:    # lane pack may not trigger at this geometry
        pytest.skip('no derived kernels at this geometry')
    names = sorted(cache)
    assert len(names) == len(set(names)) and len(names) >= 2
    # offsets present and distinct across the two parts
    offs = {n.split('_o')[1].split('_')[0] for n in names if '_o' in n}
    assert len(offs) >= 2, names
    # the two same-shape entries hold different values (different slices)
    vals = [np.asarray(cache[n]) for n in names]
    assert not np.array_equal(vals[0], vals[1])
