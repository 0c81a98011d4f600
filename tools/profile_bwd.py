"""Backward per-segment profile at the paper train config (NOTES round-5 lead).

The b3 384x1280 bf16 train step costs ~237 ms of which only ~75 ms is the
forward — this probe decomposes the remaining ~162 ms of backward by taking
``jax.grad`` of each segment separately (encoder / SAN ladder / decoder /
full model), with the same in-program fori_loop timing as
``tools/profile_segments.py`` (the relay's ~20 ms round-trip and program
memoization make per-dispatch timing useless).  Each segment's grad is taken
w.r.t. params AND inputs, as it would be inside the full chain.  XLA cost
analysis (FLOPs / bytes) per grad program is printed next to the HBM/MXU
floors so the table reads as a roofline.

Reference workload: 21-epoch training, hot loop
``/root/reference/packnet_code/packnet_sfm/trainers/common_trainer.py:93-185``.
Run serially on the TPU: ``python tools/profile_bwd.py [--batch 3]``.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 6  # in-program iterations per timed dispatch (fwd+bwd programs are heavy)


def bench(scalar_fn, args, perturb_arg=1, iters=3):
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[perturb_arg]

        def body(i, acc):
            xi = jax.tree_util.tree_map(
                lambda t: t + (i.astype(t.dtype) * jnp.asarray(1e-4, t.dtype))
                if jnp.issubdtype(t.dtype, jnp.floating) else t, x)
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


def tree_sum(out):
    import jax
    import jax.numpy as jnp
    return sum(l.astype(jnp.float32).mean()
               for l in jax.tree_util.tree_leaves(out)
               if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype, jnp.floating))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=3)
    args = ap.parse_args()

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

    B, H, W = args.batch, 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)

    small = jnp.zeros((1, 64, 128, 3), dtype)
    small_d = jnp.zeros((1, 64, 128, 1), dtype)
    rgb = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(dtype)
    lidar = jnp.asarray(
        (rng.rand(B, H, W, 1) * 80 * (rng.rand(B, H, W, 1) < 0.05))
        .astype(np.float32)).astype(dtype)

    results, costs = {}, {}

    # -- full model fwd+bwd (train mode, no loss stack) ---------------------
    model = PackNetSAN(version='1A', dropout=0.5)
    v = cast(jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(
        key, small, small_d))

    def model_grad(v_, r, d):
        bs = v_.get('batch_stats', {})

        def lf(p, r_, d_):
            out, _ = model.apply(
                {'params': p, 'batch_stats': bs}, r_, d_, train=True,
                rngs={'dropout': key}, mutable=['batch_stats'])
            return tree_sum(out)

        g, gr, gd = jax.grad(lf, argnums=(0, 1, 2))(v_['params'], r, d)
        return (tree_sum(g) + gr.astype(jnp.float32).mean()
                + gd.astype(jnp.float32).mean())

    results['model_fwd_bwd'] = bench(model_grad, (v, rgb, lidar))
    costs['model_fwd_bwd'] = cost(model_grad, v, rgb, lidar)
    print(f'  model_fwd_bwd {results["model_fwd_bwd"] * 1e3:8.1f} ms', flush=True)

    # -- encoder fwd+bwd ----------------------------------------------------
    enc = PackNetSlimEncoder(channels=SLIM_CHANNELS, dropout=0.5)
    ve = cast(jax.jit(lambda k, r: enc.init(k, r, False))(key, small))

    def enc_grad(ve_, r):
        def lf(p, r_):
            return tree_sum(enc.apply({'params': p}, r_, True,
                                      rngs={'dropout': key}))

        g, gr = jax.grad(lf, argnums=(0, 1))(ve_['params'], r)
        return tree_sum(g) + gr.astype(jnp.float32).mean()

    results['encoder_fwd_bwd'] = bench(enc_grad, (ve, rgb))
    costs['encoder_fwd_bwd'] = cost(enc_grad, ve, rgb)
    print(f'  encoder_fwd_bwd {results["encoder_fwd_bwd"] * 1e3:8.1f} ms', flush=True)

    # -- SAN ladder fwd+bwd -------------------------------------------------
    san = SparseDepthEncoder(channels=tuple(SLIM_CHANNELS[1:]))
    vs = cast(jax.jit(lambda k, d: san.init(k, d, False))(key, small_d))

    def san_grad(vs_, d):
        bs = vs_.get('batch_stats', {})

        def lf(p, d_):
            out, _ = san.apply({'params': p, 'batch_stats': bs}, d_, True,
                               mutable=['batch_stats'])
            return tree_sum(out)

        g, gd = jax.grad(lf, argnums=(0, 1))(vs_['params'], d)
        return tree_sum(g) + gd.astype(jnp.float32).mean()

    results['san_fwd_bwd'] = bench(san_grad, (vs, lidar))
    costs['san_fwd_bwd'] = cost(san_grad, vs, lidar)
    print(f'  san_fwd_bwd {results["san_fwd_bwd"] * 1e3:8.1f} ms', flush=True)

    # -- decoder fwd+bwd ----------------------------------------------------
    x5p, skips = jax.jit(lambda v_, r: enc.apply(v_, r, False))(ve, rgb)
    dec = PackNetDecoder(out_channels=1, version='A', channels=SLIM_CHANNELS)
    vd = cast(jax.jit(lambda k, a, b: dec.init(k, a, b))(
        key, x5p[:1], [s[:1] for s in skips]))

    def dec_grad(vd_, a, b):
        def lf(p, a_, b_):
            return tree_sum(dec.apply({'params': p}, a_, b_, train=True,
                                      rngs={'dropout': key}))

        g, ga, gb = jax.grad(lf, argnums=(0, 1, 2))(vd_['params'], a, b)
        return tree_sum(g) + ga.astype(jnp.float32).mean() + tree_sum(gb)

    results['decoder_fwd_bwd'] = bench(dec_grad, (vd, x5p, skips))
    costs['decoder_fwd_bwd'] = cost(dec_grad, vd, x5p, skips)

    print(f'\nbackward decomposition: batch={B} {H}x{W} bf16 '
          f'(in-program loop K={K}), device ms (fwd+bwd per segment):')
    for k_, dt in results.items():
        fl, by = costs.get(k_, (0, 0))
        floor = (f'  {fl / 1e12:5.2f} TFLOP {by / 1e9:6.1f} GB -> floor '
                 f'{by / 819e9 * 1e3:5.1f} ms (HBM) / {fl / 197e12 * 1e3:5.1f} ms (MXU)'
                 if by else '')
        print(f'  {k_:16s} {dt * 1e3:8.1f} ms{floor}')
    seg_sum = sum(results[k] for k in
                  ('encoder_fwd_bwd', 'san_fwd_bwd', 'decoder_fwd_bwd'))
    print(f'  enc+san+dec sum  {seg_sum * 1e3:8.1f} ms '
          f'(vs model_fwd_bwd {results["model_fwd_bwd"] * 1e3:.1f} ms)')


if __name__ == '__main__':
    main()
