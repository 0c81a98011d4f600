"""Calibrate the in-program-loop bench overhead and get XLA cost analysis
for the suspicious level-0-shape ops (everything measures 3-5x its HBM floor
in tools/probe_san.py — is that real inefficiency, fori_loop per-iteration
overhead, or hidden materializations?).  Run on the TPU.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 10


def bench(scalar_fn, args, iters=3, k=K):
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[0]

        def body(i, acc):
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-3, x.dtype))
            return acc + scalar_fn(xi, *a[1:])

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    f = jax.jit(looped)
    float(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = float(f(*args))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s), s
    return (min(times) - 0.020) / k


def cost(fn, *args):
    import jax
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return an.get('flops', 0), an.get('bytes accessed', 0)
    except Exception:
        return 0, 0


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from mindtheedge_tpu.ops.blocks import ConvBlock, ResidualConv, GroupNorm

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, h, w = 8, 192, 640
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def mk(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dtype)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)

    x64 = mk((B, h, w, 64))
    x128 = mk((B, h, w, 128))

    # calibration: pure elementwise at the same byte volume
    t_add = bench(lambda x_: (x_ * 1.0001 + 0.5).astype(jnp.float32).mean(),
                  (x64,))
    t_add_k40 = bench(lambda x_: (x_ * 1.0001 + 0.5).astype(jnp.float32).mean(),
                      (x64,), k=40)
    t_add128 = bench(lambda x_: (x_ * 1.0001 + 0.5).astype(jnp.float32).mean(),
                     (x128,))
    print(f'elementwise x64 [floor 0.31]: K=10 {t_add * 1e3:.2f} ms, '
          f'K=40 {t_add_k40 * 1e3:.2f} ms  -> per-iter overhead '
          f'{(t_add - t_add_k40) * 1e3 * 40 / 30:.2f}?')
    print(f'elementwise x128 [floor 0.61]: {t_add128 * 1e3:.2f} ms')

    # conv/GN cost analyses at level-0 shapes
    items = {}
    cb = ConvBlock(64, 3, 1)
    vcb = cast(jax.jit(lambda k_, x_: cb.init(k_, x_))(key, x64[:1]))
    items['ConvBlock 64->64'] = (lambda x_, v_: cb.apply(v_, x_)
                                 .astype(jnp.float32).mean(), (x64, vcb))
    rc = ResidualConv(64)
    vrc = cast(jax.jit(lambda k_, x_: rc.init(k_, x_, False))(key, x64[:1]))
    items['ResidualConv 64->64'] = (
        lambda x_, v_: rc.apply(v_, x_, False).astype(jnp.float32).mean(),
        (x64, vrc))
    gn = GroupNorm(num_groups=16)
    vgn = cast(jax.jit(lambda k_, x_: gn.init(k_, x_))(key, x64[:1]))
    items['GN(16) C=64'] = (lambda x_, v_: gn.apply(v_, x_)
                            .astype(jnp.float32).mean(), (x64, vgn))
    sc = nn.Conv(64, (1, 1))
    vsc = cast(jax.jit(lambda k_, x_: sc.init(k_, x_))(key, x64[:1]))
    items['1x1 conv 64->64'] = (lambda x_, v_: sc.apply(v_, x_)
                                .astype(jnp.float32).mean(), (x64, vsc))

    for name, (fn, args) in items.items():
        fl, by = cost(fn, *args)
        dt = bench(fn, args)
        dt40 = bench(fn, args, k=40)
        print(f'{name:22s} {fl / 1e9:7.1f} GFLOP {by / 1e6:8.1f} MB '
              f'-> HBM floor {by / 819e9 * 1e3:5.2f} ms; K=10 {dt * 1e3:5.2f} '
              f'K=40 {dt40 * 1e3:5.2f} ms')


if __name__ == '__main__':
    main()
