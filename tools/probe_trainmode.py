"""Why does the TRAIN-mode forward cost ~1.8x the eval forward per image?
A/B at b3 384x1280 bf16: eval apply, train apply with/without dropout, with/
without the lr-flip wrapper, batch 3 vs 8.  Run serially on the TPU.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def bench(scalar_fn, args, iters=3):
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[0]

        def body(i, acc):
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-4, x.dtype))
            return acc + scalar_fn(xi, *a[1:])

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(looped)
    float(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = float(f(*args))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s), s
    return (min(times) - 0.020) / K


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.models.packnet import PackNetSAN

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    H, W = 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)

    res = {}
    for name, drop in (('drop0.5', 0.5), ('nodrop', None)):
        model = PackNetSAN(version='1A', dropout=drop)
        small = jnp.zeros((1, 64, 128, 3), dtype)
        v = cast(jax.jit(lambda k, r: model.init(k, r, train=False))(key, small))
        for B in (3, 8):
            rgb = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(dtype)
            res[f'eval  b{B} {name}'] = bench(
                lambda r, v_: model.apply(v_, r, train=False)['inv_depths'][0]
                .astype(jnp.float32).mean(), (rgb, v))
            res[f'train b{B} {name}'] = bench(
                lambda r, v_: model.apply(
                    v_, r, train=True, rngs={'dropout': key},
                    mutable=['batch_stats'])[0]['inv_depths'][0]
                .astype(jnp.float32).mean(), (rgb, v))

    print(f'PackNetSAN rgb-only fwd {H}x{W} bf16 (K={K}), device ms:')
    for k_, dt in res.items():
        print(f'  {k_:22s} {dt * 1e3:7.2f} ms')


if __name__ == '__main__':
    main()
