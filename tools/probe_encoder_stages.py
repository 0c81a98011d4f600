"""Per-stage CACHED profile of the PackNet encoder (round 5).

The honest serving forward is encoder-dominated (52.2 of 103.1 ms at b8).
Times encoder PREFIXES (stem, +pack1, +level2, ...) so per-stage cost falls
out by differencing.  Run serially: ``python tools/probe_encoder_stages.py``.
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
    from mindtheedge_tpu.ops.blocks import (
        ConvBlock, ResidualBlock, PackLayerConv3d)
    from mindtheedge_tpu.models.packnet import (
        SLIM_CHANNELS, NUM_BLOCKS, PACK_KERNEL, NUM_3D_FEAT)

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

    ni, n1, n2, n3, n4, n5 = SLIM_CHANNELS

    class Prefix(nn.Module):
        n: int   # number of stages

        @nn.compact
        def __call__(self, rgb_):
            s = jnp.float32(0.0)
            x = ConvBlock(ni, 5, 1, name='pre_calc')(rgb_)
            x1 = ConvBlock(n1, 7, 1, phase_pack=True, name='conv1')(x)
            if self.n == 0:
                return x1.astype(jnp.float32).mean()
            x = PackLayerConv3d(n1, PACK_KERNEL[0], d=NUM_3D_FEAT,
                                input_packed=True, name='pack1')(x1)
            if self.n == 1:
                return x.astype(jnp.float32).mean()
            for i, (c, nb, pk) in enumerate(zip(
                    (n2, n3, n4, n5), NUM_BLOCKS, PACK_KERNEL[1:])):
                x = ResidualBlock(c, nb, 1, None, name=f'conv{i + 2}')(x, False)
                x = PackLayerConv3d(c, pk, d=NUM_3D_FEAT,
                                    name=f'pack{i + 2}')(x)
                if self.n == i + 2:
                    return x.astype(jnp.float32).mean()
            return x.astype(jnp.float32).mean()

    def timeit(n):
        mod = Prefix(n)
        v = jax.jit(lambda k_, r: mod.init(k_, r))(key, rgb[:1])
        v = jax.tree_util.tree_map(
            lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, v)
        col = jax.jit(lambda v_, r: mod.apply(
            v_, r, mutable=['kernel_cache'])[1])(v, rgb[:1])
        v = dict(v)
        v['kernel_cache'] = col['kernel_cache']

        def looped(v_, r):
            def body(i, acc):
                ri = r + (i.astype(r.dtype) * jnp.asarray(1e-3, r.dtype))
                return acc + mod.apply(v_, ri)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(looped)
        float(f(v, rgb))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(f(v, rgb))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s), s
        return (min(times) - 0.020) / K

    names = ['stem (pre_calc+conv1)', '+pack1', '+conv2+pack2',
             '+conv3+pack3', '+conv4+pack4', '+conv5+pack5']
    prev = 0.0
    for n in range(len(names)):
        dt = timeit(n) * 1e3
        print(f'{names[n]:22s}: {dt:7.1f} ms   (stage ~{dt - prev:6.1f} ms)',
              flush=True)
        prev = dt


if __name__ == '__main__':
    main()
