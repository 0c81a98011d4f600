"""Train-step roofline at the paper config (VERDICT r3 #2).

The reference's dominant workload is 21-epoch training of SemiSupEdgeModel at
384x1280 batch 3 (``train_packnet_san_kitti_with_edges.yaml:1-76``, hot loop
``trainers/common_trainer.py:93-185``).  This probe measures the full
fwd+bwd+Adam step (the exact ``make_train_step`` program Experiment.fit runs)
on the real chip with the in-program-loop technique from
``tools/profile_segments.py`` (one dispatch, K executions — immune to the
relay's ~20 ms round-trip and (program, args) memoization), and prints XLA
cost analysis so FLOP / HBM-byte floors and MFU are measured, not guessed.

Segments: full step, fwd-only loss, fwd+bwd without optimizer, and the
RGB/RGBD double forward split.  Run serially on the TPU:
``python tools/profile_train.py [--batch 3] [--remat]``.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 8   # in-program iterations per timed dispatch


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
    except Exception as e:
        print(f'  (cost analysis unavailable: {e})')
        return 0, 0


def paper_cfg(precision='bfloat16', remat=''):
    from mindtheedge_tpu.config import get_cfg_defaults, prepare_config
    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupEdgeModel'
    cfg.model.depth_net.name = 'PackNetSAN01'
    cfg.model.depth_net.version = '1A'
    cfg.model.depth_net.dropout = 0.5
    cfg.model.depth_net.remat = {'': False, 'full': True}.get(remat, remat)
    cfg.model.loss.supervised_method = 'sparse-silog'
    cfg.model.loss.supervised_num_scales = 1
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.model.loss.edges_depth_edge_loss_all_scales = True
    cfg.model.loss.upsample_depth_maps = False
    cfg.model.loss.flip_lr_prob = 0.5
    cfg.edges.train_depth_edges = True
    cfg.arch.precision = precision
    return prepare_config(cfg)


def paper_batch(b, h, w, seed=0):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    batch = {
        'rgb': rng.rand(b, h, w, 3).astype(np.float32),
        'depth': (rng.rand(b, h, w, 1) * 80 *
                  (rng.rand(b, h, w, 1) > 0.95)).astype(np.float32),
        'edge': (rng.rand(b, h, w, 1) > 0.95).astype(np.float32),
        'normal': ((rng.rand(b, h, w, 1) * 2 - 1) * np.pi).astype(np.float32),
        'input_depth': (rng.rand(b, h, w, 1) * 80 *
                        (rng.rand(b, h, w, 1) > 0.95)).astype(np.float32),
    }
    for s in range(1, 4):
        hs, ws = h >> s, w >> s
        batch[f'edge_{s}'] = (rng.rand(b, hs, ws, 1) > 0.95).astype(np.float32)
        batch[f'normal_{s}'] = ((rng.rand(b, hs, ws, 1) * 2 - 1)
                                * np.pi).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=3)
    ap.add_argument('--height', type=int, default=384)
    ap.add_argument('--width', type=int, default=1280)
    ap.add_argument('--remat', default='', help="'' | 'full' | 'conv'")
    ap.add_argument('--precision', default='bfloat16')
    ap.add_argument('--only', default='',
                    help='comma list of segments (default: all); '
                         'full_step,fwd_loss,fwd_bwd,fwd_loss_rgb_only')
    args = ap.parse_args()
    only = set(args.only.split(',')) if args.only else None

    def want(name):
        return only is None or name in only

    import jax
    import jax.numpy as jnp
    import optax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from mindtheedge_tpu.models.tasks import build_task
    from mindtheedge_tpu.training.optimizer import build_optimizer
    from mindtheedge_tpu.training.train_step import (
        make_train_step, create_train_state)
    from mindtheedge_tpu.training.state import split_variables

    cfg = paper_cfg(args.precision, args.remat)
    task = build_task(cfg)
    B, H, W = args.batch, args.height, args.width
    batch = paper_batch(B, H, W)
    key = jax.random.PRNGKey(0)

    variables = jax.jit(task.init)(key, batch)
    params, _ = split_variables(variables)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    optimizer = build_optimizer(cfg, params, steps_per_epoch=100)
    state = create_train_state(task, optimizer, key, batch, variables=variables)
    train_step = make_train_step(task, optimizer)

    results = {}

    # full step: fwd + bwd + Adam.  The scalar must depend on the UPDATED
    # state or XLA dead-code-eliminates the entire backward + optimizer
    # (first run of this probe measured 74.8 ms for the "full step" — equal
    # to fwd-only — with a fwd-only cost analysis; the grad_norm + updated-
    # param term forces the whole chain).
    def full(state_, batch_, key_):
        new_state, metrics = train_step(state_, batch_, key_)
        upd = new_state.params['depth']['weight'].astype(jnp.float32).sum()
        return (metrics['loss'] + metrics['grad_norm']).astype(jnp.float32) + upd

    if want('full_step'):
        results['full_step'] = bench(full, (state, batch, key))

    # fwd-only loss (the double RGB+RGBD forward incl. loss stack)
    def fwd_only(state_, batch_, key_):
        from mindtheedge_tpu.training.state import variables_from_state
        loss, _ = task.train_loss(variables_from_state(state_), batch_, key_, 0.0)
        return loss.astype(jnp.float32)

    if want('fwd_loss'):
        results['fwd_loss'] = bench(fwd_only, (state, batch, key))

    # fwd + bwd, no optimizer update
    def fwd_bwd(state_, batch_, key_):
        from mindtheedge_tpu.training.state import variables_from_state

        def lf(p):
            vs = dict(state_.batch_stats)
            variables = {net: ({'params': p[net], 'batch_stats': vs[net]}
                               if net in vs else {'params': p[net]})
                         for net in p}
            loss, _ = task.train_loss(variables, batch_, key_, 0.0)
            return loss

        g = jax.grad(lf)(state_.params)
        return optax.global_norm(g).astype(jnp.float32)

    if want('fwd_bwd'):
        results['fwd_bwd'] = bench(fwd_bwd, (state, batch, key))

    # single RGB-only train forward (no lidar -> no RGBD pass)
    batch_rgb = {k: v for k, v in batch.items() if k != 'input_depth'}
    def fwd_rgb(state_, batch_, key_):
        from mindtheedge_tpu.training.state import variables_from_state
        loss, _ = task.train_loss(variables_from_state(state_), batch_, key_, 0.0)
        return loss.astype(jnp.float32)

    if want('fwd_loss_rgb_only'):
        results['fwd_loss_rgb_only'] = bench(fwd_rgb, (state, batch_rgb, key))

    print(f'paper train config: batch={B} {H}x{W} {args.precision} '
          f'remat={args.remat} params={n_params / 1e6:.1f}M '
          f'(in-program loop K={K}) device ms/step:')
    for k_, dt in results.items():
        print(f'  {k_:18s} {dt * 1e3:8.1f} ms  {B / dt:6.2f} img/s/chip')

    print('XLA cost analysis:')
    for name, (fn, a) in {
        'full_step': (full, (state, batch, key)),
        'fwd_loss': (fwd_only, (state, batch, key)),
        'fwd_bwd': (fwd_bwd, (state, batch, key)),
    }.items():
        if name not in results:
            continue
        fl, by = cost(fn, *a)
        if by:
            t = results[name]
            print(f'  {name:18s} {fl / 1e12:6.2f} TFLOP  {by / 1e9:6.1f} GB '
                  f'-> floors {by / 819e9 * 1e3:5.1f} ms (HBM) / '
                  f'{fl / 197e12 * 1e3:5.1f} ms (MXU); measured {t * 1e3:6.1f} ms '
                  f'= {fl / t / 197e12 * 100:4.1f}% MFU, '
                  f'{by / t / 819e9 * 100:4.1f}% HBM')


if __name__ == '__main__':
    main()
