"""Per-segment device profiling for the PackNet-SAN forward at 384x1280.

Times each compiled segment with distinct inputs + final sync (the relay
memoizes identical (program, args) executions and block_until_ready is a
no-op there — see NOTES.md), and prints XLA cost analysis (FLOPs / HBM
bytes) per segment.  Run on the real TPU: ``python tools/profile_segments.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def bench(fn, args_list, iters=8, warmup=2):
    """fn must return a SCALAR (reduce in-graph: the relay's host fetch of a
    large buffer costs more than the compute being measured)."""
    import jax
    for i in range(warmup):
        float(fn(*args_list[i % len(args_list)]))
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    s = sum(float(o) for o in outs)
    dt = (time.perf_counter() - t0) / iters
    if not np.isfinite(s):
        print('  WARNING: non-finite checksum', s)
    return dt


def cost(fn, *args):
    import jax
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return an.get('flops', 0), an.get('bytes accessed', 0)
    except Exception as e:
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

    def mk_inputs(n, shape, sparse=False):
        outs = []
        for i in range(n):
            a = rng.rand(*shape).astype(np.float32)
            if sparse:
                a = a * 80.0 * (rng.rand(*shape) < 0.05)
            outs.append(jnp.asarray(a).astype(dtype))
        return outs

    small = jnp.zeros((1, 64, 128, 3), dtype)
    small_d = jnp.zeros((1, 64, 128, 1), dtype)

    results = {}

    # -- full model ------------------------------------------------------------
    model = PackNetSAN(version='1A')
    v = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(key, small, small_d)
    v = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)
    full = jax.jit(lambda v, r, d: model.apply(v, r, d, train=False)['inv_depths'][0].astype(jnp.float32).mean())
    rgbs = mk_inputs(4, (B, H, W, 3))
    lidars = mk_inputs(4, (B, H, W, 1), sparse=True)
    results['full_rgbd'] = bench(full, list(zip([v] * 4, rgbs, lidars)))
    rgb_only = jax.jit(lambda v, r: model.apply(v, r, train=False)['inv_depths'][0].astype(jnp.float32).mean())
    results['full_rgb'] = bench(rgb_only, list(zip([v] * 4, rgbs)))

    # -- encoder ------------------------------------------------------------
    enc = PackNetSlimEncoder(channels=SLIM_CHANNELS)
    ve = jax.jit(lambda k, r: enc.init(k, r, False))(key, small)
    ve = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, ve)
    enc_fn = jax.jit(lambda v, r: enc.apply(v, r, False)[0].astype(jnp.float32).mean())
    results['encoder'] = bench(enc_fn, list(zip([ve] * 4, rgbs)))

    # -- SAN ladder ------------------------------------------------------------
    san = SparseDepthEncoder(channels=tuple(SLIM_CHANNELS[1:]))
    vs = jax.jit(lambda k, d: san.init(k, d, False))(key, small_d)
    vs = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, vs)
    san_fn = jax.jit(lambda v, d: sum(o.astype(jnp.float32).mean() for o in san.apply(v, d, False)))
    results['san'] = bench(san_fn, list(zip([vs] * 4, lidars)))

    # SAN level 0 only (full-res pool + 6 convs at 192x640)
    pool_fn = jax.jit(lambda d: masked_max_pool_3x3_s2(d, (d > 0).astype(d.dtype))[0].astype(jnp.float32).mean())
    results['san_pool0'] = bench(pool_fn, [(l,) for l in lidars])

    # -- decoder ------------------------------------------------------------
    x5p, skips = jax.jit(lambda v, r: enc.apply(v, r, False))(ve, rgbs[0])
    dec = PackNetDecoder(out_channels=1, version='A', channels=SLIM_CHANNELS)
    vd = jax.jit(lambda k, a, b: dec.init(k, a, b))(
        key, x5p[:1], [s[:1] for s in skips])
    vd = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, vd)
    dec_fn = jax.jit(lambda v, a, b: dec.apply(v, a, b)[0].astype(jnp.float32).mean())
    x5ps = [x5p + jnp.asarray(i * 1e-3, dtype) for i in range(4)]
    results['decoder'] = bench(dec_fn, [(vd, x, skips) for x in x5ps])

    print(f'batch={B} {H}x{W} bf16 — seconds/batch and img/s:')
    for k, dt in results.items():
        print(f'  {k:12s} {dt * 1e3:8.1f} ms  {B / dt:7.1f} img/s')

    for name, (fn, args) in {
        'full_rgbd': (lambda v_, r, d: model.apply(v_, r, d, train=False)['inv_depths'][0],
                      (v, rgbs[0], lidars[0])),
        'encoder': (lambda v_, r: enc.apply(v_, r, False), (ve, rgbs[0])),
        'san': (lambda v_, d: san.apply(v_, d, False), (vs, lidars[0])),
        'decoder': (lambda v_, a, b: dec.apply(v_, a, b)[0], (vd, x5p, skips)),
    }.items():
        fl, by = cost(fn, *args)
        if by:
            print(f'  {name:12s} {fl / 1e12:6.2f} TFLOP  {by / 1e9:6.1f} GB  '
                  f'-> floor {by / 819e9 * 1e3:5.1f} ms (HBM) / '
                  f'{fl / 197e12 * 1e3:5.1f} ms (MXU)')


if __name__ == '__main__':
    main()
