"""Where does the TRAIN forward's loss stack spend time?  The paper-config
train fwd at b3 costs ~75 ms vs ~36 ms for the bare eval forward; this probe
times the SemiSupEdge loss pieces at their real shapes: the 4-scale GradLoss
(Sobel on 1-channel depth at HIGHEST precision), class-balanced BCE,
supervised silog, and the full train_loss with edge loss toggled.
Run serially on the TPU: ``python tools/probe_loss.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def bench(scalar_fn, args, iters=3):
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[0]

        def body(i, acc):
            xi = jax.tree_util.tree_map(
                lambda t: t + (i.astype(t.dtype) * jnp.asarray(1e-4, t.dtype))
                if jnp.issubdtype(t.dtype, jnp.floating) else t, x)
            return acc + scalar_fn(xi, *a[1:])

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
    from mindtheedge_tpu.losses.grad_loss import grad_loss, grad_layer
    from mindtheedge_tpu.losses.supervised import supervised_loss
    from mindtheedge_tpu.utils.depth import depth2inv

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    import argparse
    ap = argparse.ArgumentParser(); ap.add_argument('--batch', type=int, default=3)
    B = ap.parse_args().batch
    H, W = 384, 1280
    cfg = paper_cfg()
    task = build_task(cfg)
    batch = paper_batch(B, H, W)
    batch_rgb = {k: v for k, v in batch.items() if k != 'input_depth'}
    key = jax.random.PRNGKey(0)
    variables = jax.jit(task.init)(key, batch)

    res = {}

    def fwd_full(v_, bb):
        loss, _ = task.train_loss(v_, bb, key, 0.0)
        return loss.astype(jnp.float32)

    res['train_fwd rgb-only'] = bench(fwd_full, (variables, batch_rgb))

    # edge loss off: pure supervised
    def fwd_noedge(v_, bb):
        out, _ = task.run_depth(v_, bb, train=True, rng=key)
        sup = task._supervised(out['inv_depths'], bb['depth'])
        return sup.astype(jnp.float32)

    res['train_fwd no edge loss'] = bench(fwd_noedge, (variables, batch_rgb))

    def fwd_depth_only(v_, bb):
        out, _ = task.run_depth(v_, bb, train=True, rng=key)
        return out['inv_depths'][0].astype(jnp.float32).mean()

    res['train_fwd net only'] = bench(fwd_depth_only, (variables, batch_rgb))

    # the 4-scale edge loss alone on fixed pyramids
    rng = np.random.RandomState(0)
    preds = [jnp.asarray(rng.rand(B, H >> s, W >> s, 1).astype(np.float32))
             for s in range(4)]

    def edge_only(p0, bb):
        total = 0.0
        for s, p_ in enumerate([p0] + preds[1:]):
            ek = 'edge' if s == 0 else f'edge_{s}'
            nk = 'normal' if s == 0 else f'normal_{s}'
            l, _ = grad_loss(p_, bb[ek], gt_mask=None, is_grad=True,
                             is_sigmoid=True, sigmoid_thresh=4.0,
                             gt_normals=bb[nk], weight=10.0)
            total = total + l
        return (total / 4).astype(jnp.float32)

    res['edge loss x4 scales'] = bench(edge_only, (preds[0], batch))

    def sobel_only(p0):
        m, _, _ = grad_layer(p0, batch['normal'])
        return m.astype(jnp.float32).mean()

    res['grad_layer full-res'] = bench(sobel_only, (preds[0],))

    def silog_only(p0, bb):
        return supervised_loss([p0], depth2inv(bb['depth']),
                               supervised_method='sparse-silog',
                               num_scales=1).astype(jnp.float32)

    res['silog 1 scale'] = bench(silog_only, (preds[0], batch))

    print(f'paper-config loss stack, b{B} {H}x{W} (K={K}), device ms:')
    for k_, dt in res.items():
        print(f'  {k_:24s} {dt * 1e3:7.2f} ms')


if __name__ == '__main__':
    main()
