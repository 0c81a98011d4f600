"""Does the packed->unpack->pack2d seam penalty (found at the stem, ~5.7 ms)
also appear at ResidualBlock -> PackLayerConv3d seams?  Times the conv2 and
pack2 pieces separately and composed.  Run serially."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import ResidualBlock, PackLayerConv3d

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B = 8
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    # conv2 level: input pack1 output [8,192,640,32] -> ResidualBlock(64, 2)
    # -> pack2 (k=3)
    x_in = jnp.asarray(rng.rand(B, 192, 640, 32).astype(np.float32)).astype(dtype)
    x_mid = jnp.asarray(rng.rand(B, 192, 640, 64).astype(np.float32)).astype(dtype)

    rb = ResidualBlock(64, 2, 1, None, name='conv2')
    pl = PackLayerConv3d(64, 3, d=4, name='pack2')

    vr = jax.jit(lambda k_, x: rb.init(k_, x, False))(key, x_in[:1])
    vr = jax.tree_util.tree_map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, vr)
    vp = jax.jit(lambda k_, x: pl.init(k_, x))(key, x_mid[:1])
    vp = jax.tree_util.tree_map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, vp)

    def cache_of(mod, v, fn, *args):
        col = jax.jit(lambda v_, *a: fn(v_, *a, mutable=['kernel_cache'])[1])(v, *args)
        out = dict(v)
        out['kernel_cache'] = col['kernel_cache']
        return out

    vr = cache_of(rb, vr, lambda v_, x, **kw: rb.apply(v_, x, False, **kw), x_in[:1])
    vp = cache_of(pl, vp, lambda v_, x, **kw: pl.apply(v_, x, **kw), x_mid[:1])

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
        print(f'{label:30s} {(min(times) - 0.020) / K * 1e3:7.2f} ms', flush=True)

    timeit(lambda x: rb.apply(vr, x, False).astype(jnp.float32).mean(),
           (x_in,), 'conv2 ResidualBlock alone')
    timeit(lambda x: pl.apply(vp, x).astype(jnp.float32).mean(),
           (x_mid,), 'pack2 alone (fresh input)')
    timeit(lambda x: pl.apply(vp, rb.apply(vr, x, False))
           .astype(jnp.float32).mean(), (x_in,), 'conv2 -> pack2 composed')


if __name__ == '__main__':
    main()
