"""Per-segment device profiling for the PackNet-SAN forward at 384x1280.

The relay costs ~17-25 ms per dispatched program, which floors any
per-dispatch timing of small segments (a ~1 ms op measures as ~23 ms).  Each
segment is therefore timed with an IN-PROGRAM ``lax.fori_loop`` that re-runs
the segment K times on an input perturbed by the loop index (defeats CSE and
the relay's (program, args) memoization) — one dispatch, K executions, so the
per-iteration time is device time to ~1 ms accuracy.  Also prints XLA cost
analysis (FLOPs / HBM bytes) per segment.  Run on the real TPU (single
tenant): ``python tools/profile_segments.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 10  # in-program iterations per timed dispatch


def bench(scalar_fn, perturb_arg, args, iters=3):
    """Time ``scalar_fn(*args)`` with an in-program K-iteration loop.

    ``scalar_fn`` must return a SCALAR.  ``perturb_arg`` is the positional
    index of the array argument to perturb with the loop counter (keeps every
    iteration's program execution distinct).
    """
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[perturb_arg]

        def body(i, acc):
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-3, x.dtype))
            ai = a[:perturb_arg] + (xi,) + a[perturb_arg + 1:]
            return acc + scalar_fn(*ai)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(looped)
    float(f(*args))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = float(f(*args))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s), s
    # subtract one relay round-trip (~20 ms measured) and divide by K
    return (min(times) - 0.020) / K


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
    from mindtheedge_tpu.models.packnet import (
        PackNetSlimEncoder, PackNetDecoder, PackNetSAN, SLIM_CHANNELS)
    from mindtheedge_tpu.ops.sparse import SparseDepthEncoder, masked_max_pool_3x3_s2

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W = 8, 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def mk(shape, sparse=False):
        a = rng.rand(*shape).astype(np.float32)
        if sparse:
            a = a * 80.0 * (rng.rand(*shape) < 0.05)
        return jnp.asarray(a).astype(dtype)

    small = jnp.zeros((1, 64, 128, 3), dtype)
    small_d = jnp.zeros((1, 64, 128, 1), dtype)
    rgb = mk((B, H, W, 3))
    lidar = mk((B, H, W, 1), sparse=True)

    results = {}

    # -- full model ----------------------------------------------------------
    model = PackNetSAN(version='1A')
    v = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(key, small, small_d)
    v = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)
    results['full_rgbd'] = bench(
        lambda v_, r, d: model.apply(v_, r, d, train=False)['inv_depths'][0]
        .astype(jnp.float32).mean(), 1, (v, rgb, lidar))
    results['full_rgb'] = bench(
        lambda v_, r: model.apply(v_, r, train=False)['inv_depths'][0]
        .astype(jnp.float32).mean(), 1, (v, rgb))

    # -- encoder ----------------------------------------------------------
    enc = PackNetSlimEncoder(channels=SLIM_CHANNELS)
    ve = jax.jit(lambda k, r: enc.init(k, r, False))(key, small)
    ve = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, ve)
    results['encoder'] = bench(
        lambda v_, r: enc.apply(v_, r, False)[0].astype(jnp.float32).mean(),
        1, (ve, rgb))

    # -- SAN ladder ----------------------------------------------------------
    san = SparseDepthEncoder(channels=tuple(SLIM_CHANNELS[1:]))
    vs = jax.jit(lambda k, d: san.init(k, d, False))(key, small_d)
    vs = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, vs)
    results['san'] = bench(
        lambda v_, d: sum(o.astype(jnp.float32).mean()
                          for o in san.apply(v_, d, False)), 1, (vs, lidar))
    results['san_pool0'] = bench(
        lambda d: sum(o.astype(jnp.float32).sum() for o in
                      masked_max_pool_3x3_s2(d, (d > 0).astype(d.dtype))),
        0, (lidar,))

    # -- decoder ----------------------------------------------------------
    x5p, skips = jax.jit(lambda v_, r: enc.apply(v_, r, False))(ve, rgb)
    dec = PackNetDecoder(out_channels=1, version='A', channels=SLIM_CHANNELS)
    vd = jax.jit(lambda k, a, b: dec.init(k, a, b))(
        key, x5p[:1], [s[:1] for s in skips])
    vd = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, vd)
    results['decoder'] = bench(
        lambda v_, a, b: dec.apply(v_, a, b)[0].astype(jnp.float32).mean(),
        1, (vd, x5p, skips))

    print(f'batch={B} {H}x{W} bf16 — in-program loop (K={K}), device ms/batch:')
    for k_, dt in results.items():
        print(f'  {k_:12s} {dt * 1e3:8.1f} ms  {B / dt:7.1f} img/s')

    for name, (fn, args) in {
        'full_rgbd': (lambda v_, r, d: model.apply(v_, r, d, train=False)['inv_depths'][0],
                      (v, rgb, lidar)),
        'encoder': (lambda v_, r: enc.apply(v_, r, False), (ve, rgb)),
        'san': (lambda v_, d: san.apply(v_, d, False), (vs, lidar)),
        'decoder': (lambda v_, a, b: dec.apply(v_, a, b)[0], (vd, x5p, skips)),
    }.items():
        fl, by = cost(fn, *args)
        if by:
            print(f'  {name:12s} {fl / 1e12:6.2f} TFLOP  {by / 1e9:6.1f} GB  '
                  f'-> floor {by / 819e9 * 1e3:5.1f} ms (HBM) / '
                  f'{fl / 197e12 * 1e3:5.1f} ms (MXU)')


if __name__ == '__main__':
    main()
