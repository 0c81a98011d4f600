"""Stem composition bisect (round 5): pieces sum to ~7.8 ms, the composed
stem measures 14.2 — find the composition overhead.  Run serially."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import ConvBlock

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

    pre = ConvBlock(32, 5, 1, name='pre_calc')
    c1 = ConvBlock(32, 7, 1, phase_pack=True, name='conv1')

    vp = jax.jit(lambda k_, r: pre.init(k_, r))(key, rgb[:1])
    vp = jax.tree_util.tree_map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, vp)
    x32s = jax.jit(lambda v_, r: pre.apply(v_, r))(vp, rgb[:1])
    vc = jax.jit(lambda k_, x: c1.init(k_, x))(key, x32s)
    vc = jax.tree_util.tree_map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, vc)

    def cache_of(mod, v, *args):
        col = jax.jit(lambda v_, *a: mod.apply(
            v_, *a, mutable=['kernel_cache'])[1])(v, *args)
        out = dict(v)
        out['kernel_cache'] = col['kernel_cache']
        return out

    vp_c = cache_of(pre, vp, rgb[:1])
    x32 = jnp.asarray(rng.rand(B, H, W, 32).astype(np.float32)).astype(dtype)
    vc_c = cache_of(c1, vc, x32[:1])

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
        print(f'{label:36s} {(min(times) - 0.020) / K * 1e3:7.2f} ms', flush=True)

    timeit(lambda r: pre.apply(vp_c, r).astype(jnp.float32).mean(), (rgb,),
           'pre_calc alone')
    timeit(lambda x: c1.apply(vc_c, x).astype(jnp.float32).mean(), (x32,),
           'conv1 block alone (fresh input)')
    timeit(lambda r: c1.apply(vc_c, pre.apply(vp_c, r))
           .astype(jnp.float32).mean(), (rgb,), 'pre_calc -> conv1 composed')
    # no lane pack in pre_calc: skips the unpack_w relayout before conv1
    pre0 = ConvBlock(32, 5, 1, auto_lane_pack=False, name='pre_calc')
    timeit(lambda r: c1.apply(vc_c, pre0.apply(vp, r))
           .astype(jnp.float32).mean(), (rgb,),
           'pre_calc(plain) -> conv1 composed')


if __name__ == '__main__':
    main()
