"""Bisect the b8 train-forward gap: task.train_loss costs ~180 ms at b8 vs
94 ms for the bare model.apply(train=True) — which loss-stack piece is the
~86 ms?  Variants: full, flips off, edge loss off, both off.
Run serially on the TPU: ``python tools/probe_trainfwd_bisect.py <variant>``.

STATUS: every b8 run of this probe OOMs on the chip (HLO temp) even at K=6,
while tools/profile_train.py --batch 8 fwd_loss (K=8) succeeds — cause not
understood; the b8 loss-stack decomposition is an open round-5 lead
(NOTES.md).  Runs fine at --batch<=3 via tools/probe_loss.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 6


def bench(scalar_fn, args, iters=3):
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[1]['rgb']

        def body(i, acc):
            bb = dict(a[1])
            bb['rgb'] = x + (i.astype(x.dtype) * jnp.asarray(1e-4, x.dtype))
            return acc + scalar_fn(a[0], bb)

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
    from tools.profile_train import paper_cfg, paper_batch
    from mindtheedge_tpu.models.tasks import build_task

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W = 8, 384, 1280
    batch = paper_batch(B, H, W)
    batch_rgb = {k: v for k, v in batch.items() if k != 'input_depth'}
    key = jax.random.PRNGKey(0)

    base = paper_cfg()
    task0 = build_task(base)
    variables = jax.jit(task0.init)(key, batch)

    variants = {'full': (0.5, None), 'no-flip': (0.0, None),
                'no-edge': (0.5, 0.0), 'no-flip-no-edge': (0.0, 0.0)}
    pick = sys.argv[1] if len(sys.argv) > 1 else 'full'
    res = {}
    for name, (flip, edge_w) in [(pick, variants[pick])]:
        cfg = paper_cfg()
        cfg.defrost() if hasattr(cfg, 'defrost') else None
        cfg.model.loss.flip_lr_prob = flip
        if edge_w is not None:
            cfg.model.loss.depth_edges_loss_weight = edge_w
            cfg.model.loss.edges_depth_edge_loss_all_scales = False
        task = build_task(cfg)
        if edge_w is not None:
            task.depth_edges_loss_weight = 0.0
            # skip the edge-loss computation entirely
            task._edge_loss_all_scales = \
                lambda *a, **k: jnp.asarray(0.0)

        def f(v_, bb, task=task):
            loss, _ = task.train_loss(v_, bb, key, 0.0)
            return loss.astype(jnp.float32)

        res[name] = bench(f, (variables, batch_rgb))

    print(f'b{B} train fwd (rgb-only pass) bisect (K={K}), device ms:')
    for k_, dt in res.items():
        print(f'  {k_:18s} {dt * 1e3:7.2f} ms')


if __name__ == '__main__':
    main()
