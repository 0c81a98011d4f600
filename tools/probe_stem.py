"""Bisect the encoder stem's 14.2 ms (round 5; floor ~4.5 ms).

Times pre_calc / conv1 pieces and input-layout variants of the full-res
5x5 rgb conv.  Run serially: ``python tools/probe_stem.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import ConvBlock, GroupNorm
    from mindtheedge_tpu.ops.phase_conv import expand_kernel_phase

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W = 8, 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    rgb = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(dtype)
    x32 = jnp.asarray(rng.rand(B, H, W, 32).astype(np.float32)).astype(dtype)
    dn = ('NHWC', 'HWIO', 'NHWC')

    def timeit(fn, args, label):
        def looped(*a):
            def body(i, acc):
                xi = a[0] + (i.astype(a[0].dtype) * jnp.asarray(1e-3, a[0].dtype))
                return acc + fn(xi, *a[1:])
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        f = jax.jit(looped)
        float(f(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(f(*args))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s), s
        print(f'{label:34s} {(min(times) - 0.020) / K * 1e3:7.2f} ms', flush=True)

    # a) pre_calc ConvBlock as-is (lane-packed rw=4, GN, ELU)
    blk = ConvBlock(32, 5, 1)
    vb = jax.jit(lambda k_, r: blk.init(k_, r))(key, rgb[:1])
    vb = jax.tree_util.tree_map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, vb)
    timeit(lambda r: blk.apply(vb, r).astype(jnp.float32).mean(), (rgb,),
           'pre_calc ConvBlock (lane-packed)')

    # b) no lane pack
    blk0 = ConvBlock(32, 5, 1, auto_lane_pack=False)
    timeit(lambda r: blk0.apply(vb, r).astype(jnp.float32).mean(), (rgb,),
           'pre_calc ConvBlock (plain)')

    k5 = jnp.asarray(rng.randn(5, 5, 3, 32).astype(np.float32)).astype(dtype) * 0.1

    # c) raw conv only, 3-channel input
    timeit(lambda r: jax.lax.conv_general_dilated(
        r, k5, (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn)
        .astype(jnp.float32).mean(), (rgb,), 'raw 5x5 conv cin=3')

    # d) raw conv, lane-packed (stride (1,4), expanded kernel)
    k5e = expand_kernel_phase(k5, 1, 4)
    timeit(lambda r: jax.lax.conv_general_dilated(
        r, k5e, (1, 4), [(2, 2), (2, 2)], dimension_numbers=dn)
        .astype(jnp.float32).mean(), (rgb,), 'raw 5x5 conv cin=3 W-packed')

    # e) raw conv, input padded to 8 channels
    k8 = jnp.concatenate([k5, jnp.zeros((5, 5, 5, 32), k5.dtype)], axis=2)
    rgb8 = jnp.concatenate(
        [rgb, jnp.zeros(rgb.shape[:3] + (5,), rgb.dtype)], axis=-1)
    timeit(lambda r: jax.lax.conv_general_dilated(
        r, k8, (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn)
        .astype(jnp.float32).mean(), (rgb8,), 'raw 5x5 conv cin=8 (padded)')

    # f) GN+ELU alone at the pre_calc output shape
    gn = GroupNorm(num_groups=16)
    vg = gn.init(key, x32)
    timeit(lambda r: jax.nn.elu(gn.apply(vg, r)).astype(jnp.float32).mean(),
           (x32,), 'GroupNorm+ELU @ [8,384,1280,32]')

    # g) conv1 phase2 equivalent: 7x7 32->128 stride 2 on x32
    k7e = jnp.asarray(rng.randn(8, 8, 32, 128).astype(np.float32)).astype(dtype) * 0.05
    timeit(lambda r: jax.lax.conv_general_dilated(
        r, k7e, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)
        .astype(jnp.float32).mean(), (x32,), 'raw conv1 phase2 8x8/2 32->128')


if __name__ == '__main__':
    main()
