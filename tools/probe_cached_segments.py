"""CACHED per-segment serving profile (round 5).

profile_segments.py times the submodules WITHOUT the serving kernel cache,
so each segment's number carries its parameter-only derivation chains.  This
probe collects a kernel cache per submodule (encoder / SAN / decoder) and
times the cached programs — the numbers that actually compose bench.py's
device path.  Run serially: ``python tools/probe_cached_segments.py``.
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
    from mindtheedge_tpu.models.packnet import (
        PackNetSlimEncoder, PackNetDecoder, PackNetSAN, SLIM_CHANNELS)
    from mindtheedge_tpu.ops.sparse import SparseDepthEncoder

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W = 8, 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)

    def with_cache(apply_fn, v, *args):
        # apply_fn(v, *tensor_args, mutable=[...]) with train baked statically
        col = jax.jit(lambda v_, *a: apply_fn(
            v_, *a, mutable=['kernel_cache'])[1])(v, *args)
        out = dict(v)
        out['kernel_cache'] = col['kernel_cache']
        return out

    def bench(fn, perturb, args):
        def looped(*a):
            def body(i, acc):
                x = a[perturb]
                xi = jax.tree_util.tree_map(
                    lambda t: t + (i.astype(t.dtype)
                                   * jnp.asarray(1e-3, t.dtype)), x)
                ai = a[:perturb] + (xi,) + a[perturb + 1:]
                return acc + fn(*ai)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        f = jax.jit(looped)
        float(f(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(f(*args))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s), s
        return (min(times) - 0.020) / K

    small = jnp.zeros((1, 64, 128, 3), dtype)
    small_d = jnp.zeros((1, 64, 128, 1), dtype)
    rgb = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(dtype)
    lid = rng.rand(B, H, W, 1).astype(np.float32) * 80.0
    lid[rng.rand(B, H, W, 1) < 0.95] = 0.0
    lidar = jnp.asarray(lid).astype(dtype)
    results = {}

    enc = PackNetSlimEncoder(channels=SLIM_CHANNELS)
    ve = cast(jax.jit(lambda k, r: enc.init(k, r, False))(key, small))
    ve = with_cache(lambda v_, r, **kw: enc.apply(v_, r, False, **kw), ve, rgb[:1])
    results['encoder'] = bench(
        lambda v_, r: enc.apply(v_, r, False)[0].astype(jnp.float32).mean(),
        1, (ve, rgb))

    san = SparseDepthEncoder(channels=tuple(SLIM_CHANNELS[1:]))
    vs = cast(jax.jit(lambda k, d: san.init(k, d, False))(key, small_d))
    vs = with_cache(lambda v_, d, **kw: san.apply(v_, d, False, **kw), vs, lidar[:1])
    results['san'] = bench(
        lambda v_, d: sum(o.astype(jnp.float32).mean()
                          for o in san.apply(v_, d, False)), 1, (vs, lidar))

    x5p, skips = jax.jit(lambda v_, r: enc.apply(v_, r, False))(ve, rgb)
    dec = PackNetDecoder(out_channels=1, version='A', channels=SLIM_CHANNELS)
    vd = cast(jax.jit(lambda k, a, b: dec.init(k, a, b))(
        key, x5p[:1], [s[:1] for s in skips]))
    vd = with_cache(lambda v_, a, b, **kw: dec.apply(v_, a, b, **kw), vd, x5p[:1], [s_[:1] for s_ in skips])
    results['decoder'] = bench(
        lambda v_, a, b: dec.apply(v_, a, b)[0].astype(jnp.float32).mean(),
        1, (vd, x5p, skips))

    print(f'batch={B} {H}x{W} bf16 CACHED segments (K={K}):')
    for k_, dt in results.items():
        print(f'  {k_:10s} {dt * 1e3:8.1f} ms')


if __name__ == '__main__':
    main()
