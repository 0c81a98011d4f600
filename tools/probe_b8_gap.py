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

    # The paper batch carries input_depth, so task.train_loss runs the
    # train-with-lidar DOUBLE forward (RGB pass + RGBD+SAN pass,
    # packnet.py).  The round-4 b3 baseline (tools/probe_loss.py) compared
    # against an RGB-only batch — so the decomposition here times FOUR
    # programs so the "gap" splits into (second forward) vs (loss stack):
    #   A_rgbd  task.train_loss on the full batch   (double fwd + loss)
    #   A_rgb   task.train_loss w/o input_depth     (single fwd + loss)
    #   B_rgbd  bare model.apply(rgb, lidar)        (double fwd)
    #   B_rgb   bare model.apply(rgb)               (single fwd)
    batch_rgb = {k: v for k, v in batch.items() if k != 'input_depth'}

    def fwd_loss_rgbd(batch_, variables_):
        loss, _ = task.train_loss(variables_, batch_, key, 0.0)
        return loss.astype(jnp.float32)

    def fwd_loss_rgb(batch_, variables_):
        loss, _ = task.train_loss(variables_, batch_, key, 0.0)
        return loss.astype(jnp.float32)

    model = task.depth_net
    params, rest = split_variables(variables)
    mv = {'params': params['depth']}
    if 'depth' in rest:
        mv['batch_stats'] = rest['depth']

    def bare_rgb(rgb, mv_):
        out, _ = model.apply(mv_, rgb, train=True, rngs={'dropout': key},
                             mutable=['batch_stats'])
        return out['inv_depths'][0].astype(jnp.float32).mean()

    def bare_rgbd(rgb, mv_, lidar):
        out, _ = model.apply(mv_, rgb, train=True, rngs={'dropout': key},
                             mutable=['batch_stats'], input_depth=lidar)
        s = out['inv_depths'][0].astype(jnp.float32).mean()
        if 'inv_depths_rgbd' in out:
            s = s + out['inv_depths_rgbd'][0].astype(jnp.float32).mean()
        return s

    rgb_bf16 = batch['rgb'].astype(jnp.bfloat16)
    lidar_bf16 = batch['input_depth'].astype(jnp.bfloat16)
    timers = []
    for name, fn, a in (
            ('A_rgbd fwd_loss+lidar', fwd_loss_rgbd, (batch, variables)),
            ('A_rgb  fwd_loss      ', fwd_loss_rgb, (batch_rgb, variables)),
            ('B_rgbd bare double   ', bare_rgbd, (rgb_bf16, mv, lidar_bf16)),
            ('B_rgb  bare single   ', bare_rgb, (rgb_bf16, mv))):
        print(f'compiling {name.strip()}...', flush=True)
        timers.append((name, make_timer(fn, a)))

    rows = []
    for tag in ('1', '2'):   # alternating so relay drift shows as A1 != A2
        for name, run in timers:
            rows.append((f'{name} #{tag}', run()))
    print(f'b{B} 384x1280 bf16, alternating (K={K}):')
    for name, dt in rows:
        print(f'  {name} {dt * 1e3:8.1f} ms  ({B / dt:6.1f} img/s)')


if __name__ == '__main__':
    main()
