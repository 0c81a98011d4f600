"""Per-level device timing: encoder stages and SAN ladder levels at b8
384x1280 bf16.  In-program fori_loop timing (see tools/profile_segments.py).
Run on the real TPU: ``python tools/probe_levels.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 40


def bench(scalar_fn, args, iters=3):
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[0]

        def body(i, acc):
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-3, x.dtype))
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
    import flax.linen as nn
    from mindtheedge_tpu.ops.blocks import (
        ConvBlock, ResidualBlock, PackLayerConv3d)
    from mindtheedge_tpu.ops.sparse import MinkConvBlock
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

    def mk(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dtype)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)

    ni, n1, n2, n3, n4, n5 = SLIM_CHANNELS

    # ---- encoder stages (input shapes per stage at 384x1280) --------------
    stages = [
        ('pre_calc 5x5 3->32 @384x1280', ConvBlock(ni, 5, 1), (B, H, W, 3)),
        ('conv1 7x7 pp 32->32 @384x1280', ConvBlock(n1, 7, 1, phase_pack=True),
         (B, H, W, ni)),
        # pack1 consumes the packed conv1 output [B,192,640,128]
        ('pack1 (composed) @192x640', PackLayerConv3d(
            n1, PACK_KERNEL[0], d=NUM_3D_FEAT, input_packed=True),
         (B, H // 2, W // 2, 4 * n1)),
        ('conv2 resx2 64 @192x640', ResidualBlock(n2, NUM_BLOCKS[0], 1),
         (B, H // 2, W // 2, n1)),
        ('pack2 @96x320', PackLayerConv3d(n2, PACK_KERNEL[1], d=NUM_3D_FEAT),
         (B, H // 2, W // 2, n2)),
        ('conv3 resx2 128 @96x320', ResidualBlock(n3, NUM_BLOCKS[1], 1),
         (B, H // 4, W // 4, n2)),
        ('pack3 @48x160', PackLayerConv3d(n3, PACK_KERNEL[2], d=NUM_3D_FEAT),
         (B, H // 4, W // 4, n3)),
        ('conv4 resx3 256 @48x160', ResidualBlock(n4, NUM_BLOCKS[2], 1),
         (B, H // 8, W // 8, n3)),
        ('pack4 @24x80', PackLayerConv3d(n4, PACK_KERNEL[3], d=NUM_3D_FEAT),
         (B, H // 8, W // 8, n4)),
        ('conv5 resx3 512 @24x80', ResidualBlock(n5, NUM_BLOCKS[3], 1),
         (B, H // 16, W // 16, n4)),
        ('pack5 @12x40', PackLayerConv3d(n5, PACK_KERNEL[4], d=NUM_3D_FEAT),
         (B, H // 16, W // 16, n5)),
    ]
    print(f'encoder stages, b{B} {H}x{W} bf16, ms/batch:')
    total = 0.0
    for name, mod, shp in stages:
        x = mk(shp)
        if isinstance(mod, ResidualBlock):
            v = cast(jax.jit(lambda k, xx: mod.init(k, xx, False))(key, x[:1]))
            dt = bench(lambda xx, v_: mod.apply(
                v_, xx, False)[0].astype(jnp.float32).mean(), (x, v))
        else:
            v = cast(jax.jit(lambda k, xx: mod.init(k, xx))(key, x[:1]))
            dt = bench(lambda xx, v_: mod.apply(
                v_, xx).astype(jnp.float32).mean(), (x, v))
        total += dt
        print(f'  {name:34s} {dt * 1e3:7.2f} ms')
    print(f'  {"SUM":34s} {total * 1e3:7.2f} ms')

    # ---- SAN ladder levels ------------------------------------------------
    lid = rng.rand(B, H, W, 1).astype(np.float32) * 80.0
    lid[rng.rand(B, H, W, 1) < 0.95] = 0.0
    ksizes = [5, 5, 3, 3, 3]
    chans = SLIM_CHANNELS[1:]
    print(f'SAN levels, ms/batch:')
    x = jnp.asarray(lid).astype(dtype)
    mask = (x > 0).astype(dtype)
    total = 0.0
    for i, (c, kz) in enumerate(zip(chans, ksizes)):
        mod = MinkConvBlock(c, kz)
        v = cast(jax.jit(lambda k, xx, mm: mod.init(k, xx, mm, False))(
            key, x[:1], mask[:1]))
        dt = bench(lambda xx, v_, mm: mod.apply(
            v_, xx, mm, False)[0].astype(jnp.float32).mean(), (x, v, mask))
        total += dt
        print(f'  mconv{i} {kz}x{kz} ->{c:4d} @{x.shape[1]}x{x.shape[2]}'
              f'   {dt * 1e3:7.2f} ms')
        x, mask = jax.jit(lambda v_, xx, mm: mod.apply(v_, xx, mm, False))(
            v, x, mask)
    print(f'  SAN SUM {total * 1e3:7.2f} ms')


if __name__ == '__main__':
    main()
