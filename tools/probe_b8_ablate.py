"""Bisect the (real, reproducible) b8 train-fwd loss-stack gap by config knob.

``tools/probe_b8_gap.py`` pinned the gap at 53 ms (fwd_loss 162.0 vs bare
train apply 109.0 ms, A/B/A/B stable to 0.1 ms) — vs only ~5.6 ms at b3.
The earlier full bisect probe OOM'd at b8; this one instead toggles one
config knob at a time and re-times the SAME ``task.train_loss`` program:

  full      — paper config anchor (cached from probe_b8_gap)
  noflip    — ``flip_lr_prob = 0`` (drops the lax.cond lr-flip wrapper)
  noedge    — ``train_depth_edges = False`` (drops the 4-scale GradLoss/BCE
              edge stack; pure sparse-silog supervision remains)

Whichever toggle recovers the 53 ms is the culprit.  Run serially on the
TPU: ``python tools/probe_b8_ablate.py [--batch 8]``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

from tools.probe_b8_gap import make_timer  # noqa: E402  (same K=30 loop)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tools.profile_train import paper_cfg, paper_batch
    from mindtheedge_tpu.models.tasks import build_task

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B = args.batch
    batch = paper_batch(B, 384, 1280)
    key = jax.random.PRNGKey(0)

    def variant(name, mutate):
        cfg = paper_cfg()
        mutate(cfg)
        task = build_task(cfg)
        variables = jax.jit(task.init)(key, batch)

        def fwd_loss(batch_, variables_):
            loss, _ = task.train_loss(variables_, batch_, key, 0.0)
            return loss.astype(jnp.float32)

        print(f'compiling {name}...', flush=True)
        run = make_timer(fwd_loss, (batch, variables))
        dt = run()
        print(f'  {name:8s} {dt * 1e3:8.1f} ms  ({B / dt:6.1f} img/s)', flush=True)
        return dt

    res = {}
    res['full'] = variant('full', lambda cfg: None)
    res['noflip'] = variant(
        'noflip', lambda cfg: setattr(cfg.model.loss, 'flip_lr_prob', 0.0))

    def no_edge(cfg):
        cfg.edges.train_depth_edges = False

    res['noedge'] = variant('noedge', no_edge)

    print(f'\nb{B} 384x1280 bf16 fwd_loss ablation (K=30):')
    for k, dt in res.items():
        print(f'  {k:8s} {dt * 1e3:8.1f} ms  (delta vs full '
              f'{(res["full"] - dt) * 1e3:+7.1f} ms)')


if __name__ == '__main__':
    main()
