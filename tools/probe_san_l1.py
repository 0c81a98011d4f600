"""Bisect SAN level-1's 16 ms (round 5; floor ~3 ms).

Times MinkConvBlock(64, k=5) standalone on its real input shape
[8,192,640,32] in variants, plus the masked pool alone, with XLA
flop/byte counts.  Run serially: ``python tools/probe_san_l1.py``.
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
    from mindtheedge_tpu.ops.sparse import MinkConvBlock, masked_max_pool_3x3_s2

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W, C = 8, 192, 640, 32
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    x = (rng.rand(B, H, W, C) * (rng.rand(B, H, W, 1) < 0.2)).astype(np.float32)
    x = jnp.asarray(x).astype(dtype)
    mask = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(dtype)

    def timeit(fn, args, label):
        def looped(*a):
            def body(i, acc):
                xi = a[0] + (i.astype(a[0].dtype)
                             * jnp.asarray(1e-3, a[0].dtype)) \
                    * (jnp.abs(a[0]) > 0).astype(a[0].dtype)
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
        dt = (min(times) - 0.020) / K
        try:
            an = jax.jit(lambda *a: fn(*a)).lower(*args).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            fl, by = an.get('flops', 0), an.get('bytes accessed', 0)
            extra = (f'  [{fl / 1e9:6.1f} GFLOP {by / 1e9:5.2f} GB -> '
                     f'floors {fl / 197e9:4.1f}/{by / 0.819e9:4.1f} ms]')
        except Exception:
            extra = ''
        print(f'{label:28s} {dt * 1e3:7.2f} ms{extra}', flush=True)
        return dt

    def block(lane_pack):
        mod = MinkConvBlock(64, 5, lane_pack=lane_pack)
        v = jax.jit(lambda k_, xx, mm: mod.init(k_, xx, mm))(key, x[:1], mask[:1])
        v = jax.tree_util.tree_map(
            lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, v)
        col = jax.jit(lambda v_, xx, mm: mod.apply(
            v_, xx, mm, mutable=['kernel_cache'])[1])(v, x[:1], mask[:1])
        v = dict(v)
        if col.get('kernel_cache'):
            v['kernel_cache'] = col['kernel_cache']

        def fn(xx, mm):
            y, _ = mod.apply(v, xx, mm)
            return y.astype(jnp.float32).mean()
        return fn

    timeit(lambda xx, mm: sum(
        o.astype(jnp.float32).sum()
        for o in masked_max_pool_3x3_s2(xx, mm)), (x, mask), 'pool only')
    timeit(block(True), (x, mask), 'MinkConvBlock lane_pack')
    timeit(block(False), (x, mask), 'MinkConvBlock dense')


if __name__ == '__main__':
    main()
