"""Re-measure the b8 train-fwd gap on quiet hardware (NOTES round-4 open item).

Round-4 measured the b8 task ``train_loss`` forward at 180.7 ms vs 94.1 ms for
the bare ``model.apply(train=True)`` at the same batch, while at b3 the delta
is ~5.6 ms — and a StableHLO op-count diff showed the loss stack adds only the
4-scale Sobel convs (+16 convolutions), nothing that costs 86 ms.  This probe
re-times EXACTLY those two programs back to back with the K=30 in-program
loop, twice each in alternating order (A B A B), so a relay-health drift
between the two measurements — the prime suspect — shows up as A1 != A2.

Run serially on the TPU: ``python tools/probe_b8_gap.py [--batch 8]``.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def make_timer(scalar_fn, args, perturb_arg=0):
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

    def run(iters=3):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            s = float(f(*args))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s), s
        return (min(times) - 0.020) / K

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tools.profile_train import paper_cfg, paper_batch
    from mindtheedge_tpu.models.tasks import build_task
    from mindtheedge_tpu.training.state import split_variables

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    cfg = paper_cfg()
    task = build_task(cfg)
    B = args.batch
    batch = paper_batch(B, 384, 1280)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(task.init)(key, batch)

    # A: full task train_loss forward (double fwd + loss stack)
    def fwd_loss(batch_, variables_):
        loss, _ = task.train_loss(variables_, batch_, key, 0.0)
        return loss.astype(jnp.float32)

    # B: bare depth-net train-mode apply on the same rgb
    model = task.depth_net
    params, rest = split_variables(variables)
    mv = {'params': params['depth']}
    if 'depth' in rest:
        mv['batch_stats'] = rest['depth']

    def bare(rgb, mv_):
        out, _ = model.apply(mv_, rgb, train=True, rngs={'dropout': key},
                             mutable=['batch_stats'])
        return out['inv_depths'][0].astype(jnp.float32).mean()

    print('compiling A (fwd_loss)...', flush=True)
    run_a = make_timer(fwd_loss, (batch, variables))
    print('compiling B (bare train apply)...', flush=True)
    run_b = make_timer(bare, (batch['rgb'].astype(jnp.bfloat16), mv))

    rows = []
    for tag in ('1', '2'):
        rows.append((f'A{tag} fwd_loss', run_a()))
        rows.append((f'B{tag} bare    ', run_b()))
    print(f'b{B} 384x1280 bf16, alternating (K={K}):')
    for name, dt in rows:
        print(f'  {name} {dt * 1e3:8.1f} ms  ({B / dt:6.1f} img/s)')


if __name__ == '__main__':
    main()
