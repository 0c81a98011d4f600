"""Per-level CACHED profile of the SAN ladder (round 5).

The honest (lidar-perturbed) serving forward pays ~32 ms/b8-batch for the
SAN ladder — 4-5x its byte/FLOP floor and the largest single headroom in
the serving path.  This probe times ladder PREFIXES (level 0, levels 0-1,
...) so per-level cost falls out by differencing.  Run serially:
``python tools/probe_san_levels.py``.
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
    import flax.linen as nn
    from mindtheedge_tpu.ops.sparse import MinkConvBlock
    from mindtheedge_tpu.models.packnet import SLIM_CHANNELS

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W = 8, 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    lid = rng.rand(B, H, W, 1).astype(np.float32) * 80.0
    lid[rng.rand(B, H, W, 1) < 0.95] = 0.0
    lidar = jnp.asarray(lid).astype(dtype)

    channels = tuple(SLIM_CHANNELS[1:])          # (32, 64, 128, 256, 512)
    kernel_sizes = [5, 5] + [3] * (len(channels) - 1)

    class Prefix(nn.Module):
        n: int

        @nn.compact
        def __call__(self, depth):
            mask = (depth > 0).astype(depth.dtype)
            x = depth
            s = jnp.float32(0.0)
            for i in range(self.n):
                x, mask = MinkConvBlock(channels[i], kernel_sizes[i],
                                        name=f'mconv{i}')(x, mask, False)
                s = s + x.astype(jnp.float32).mean()
            return s

    def timeit(n):
        mod = Prefix(n)
        v = jax.jit(lambda k, d: mod.init(k, d))(key, lidar[:1])
        v = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)
        col = jax.jit(lambda v_, d: mod.apply(
            v_, d, mutable=['kernel_cache'])[1])(v, lidar[:1])
        v = dict(v)
        v['kernel_cache'] = col['kernel_cache']

        def looped(v_, d):
            def body(i, acc):
                di = d + (i.astype(d.dtype) * jnp.asarray(1e-3, d.dtype)) \
                    * (d > 0).astype(d.dtype)
                return acc + mod.apply(v_, di)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(looped)
        float(f(v, lidar))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(f(v, lidar))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s), s
        return (min(times) - 0.020) / K

    prev = 0.0
    for n in range(1, len(channels) + 1):
        dt = timeit(n) * 1e3
        print(f'levels 0..{n - 1}: {dt:7.1f} ms   (level {n - 1} '
              f'~{dt - prev:6.1f} ms)', flush=True)
        prev = dt


if __name__ == '__main__':
    main()
