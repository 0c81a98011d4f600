"""Bisect the b8 train-fwd loss-stack gap by config knob.

``tools/probe_b8_gap.py`` decomposes the gap into (second RGBD forward) vs
(loss stack) with a 4-program A/B; this probe then toggles one config knob at
a time and re-times the SAME ``task.train_loss`` program:

  full      — paper config anchor
  noflip    — ``flip_lr_prob = 0``; the flip wrapper is now statically
              elided at trace time when the prob is 0 (tasks.run_depth), so
              this toggle genuinely removes the flip+select work
  noedge    — ``train_depth_edges = False``; SemiSupEdgeTask now consumes
              this flag (the same gate the reference applies at
              model_wrapper.py:657), so the 4-scale GradLoss/BCE edge stack
              really drops out of the traced program
  nolidar   — strip ``input_depth`` from the batch (single RGB forward,
              no SAN ladder — isolates the double-forward cost)

Whichever toggle recovers the gap is the culprit.  Run serially on the
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

    def variant(name, mutate, batch_=None):
        cfg = paper_cfg()
        mutate(cfg)
        task = build_task(cfg)
        b = batch if batch_ is None else batch_
        variables = jax.jit(task.init)(key, batch)  # same param tree always

        def fwd_loss(b_, variables_):
            loss, _ = task.train_loss(variables_, b_, key, 0.0)
            return loss.astype(jnp.float32)

        print(f'compiling {name}...', flush=True)
        run = make_timer(fwd_loss, (b, variables))
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
    res['nolidar'] = variant(
        'nolidar', lambda cfg: None,
        batch_={k: v for k, v in batch.items() if k != 'input_depth'})

    print(f'\nb{B} 384x1280 bf16 fwd_loss ablation (K=30):')
    for k, dt in res.items():
        print(f'  {k:8s} {dt * 1e3:8.1f} ms  (delta vs full '
              f'{(res["full"] - dt) * 1e3:+7.1f} ms)')


if __name__ == '__main__':
    main()
