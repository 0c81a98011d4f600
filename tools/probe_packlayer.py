"""Bisect _PackConvBlock's overhead (round 5: pack2 standalone 5.6 ms vs
~1.8 floor; pack1 7.0).  Times the composed interior conv alone, the border
strips alone, and the GN, at pack2's real shape.  Run serially."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import (
        PackLayerConv3d, GroupNorm, _compose_pack_kernel)
    from mindtheedge_tpu.ops.phase_conv import expand_kernel_phase, unpack_w

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B = 8
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    # pack2: input [8,192,640,64] -> pack2d [8,96,320,256] -> C=64, k=3
    x_full = jnp.asarray(rng.rand(B, 192, 640, 64).astype(np.float32)).astype(dtype)
    pl = PackLayerConv3d(64, 3, d=4, name='pack2')
    v = jax.jit(lambda k_, x: pl.init(k_, x))(key, x_full[:1])
    v = jax.tree_util.tree_map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, v)
    col = jax.jit(lambda v_, x: pl.apply(v_, x, mutable=['kernel_cache'])[1])(
        v, x_full[:1])
    vc = dict(v)
    vc['kernel_cache'] = col['kernel_cache']

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

    timeit(lambda x: pl.apply(vc, x).astype(jnp.float32).mean(), (x_full,),
           'pack2 full (cached)')

    # interior composed conv alone (no strips/DUS/GN), from the cache
    from mindtheedge_tpu.ops.packing import pack2d
    Kc = col['kernel_cache']['conv']['composed_w2']
    x2 = pack2d(x_full, 2)

    def interior(x2_):
        return jax.lax.conv_general_dilated(
            x2_, Kc, (1, 2), [(2, 2), (2, 2)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')).astype(jnp.float32).mean()
    timeit(interior, (x2,), 'interior composed conv only')

    # pack2d relayout alone
    timeit(lambda x: pack2d(x, 2).astype(jnp.float32).mean(), (x_full,),
           'pack2d relayout only')

    # GN at the output shape
    y = jnp.asarray(rng.rand(B, 96, 320, 64).astype(np.float32)).astype(dtype)
    gn = GroupNorm(num_groups=16)
    vg = gn.init(key, y)
    timeit(lambda t: jax.nn.elu(gn.apply(vg, t)).astype(jnp.float32).mean(),
           (y,), 'GN+ELU @ output shape')


if __name__ == '__main__':
    main()
