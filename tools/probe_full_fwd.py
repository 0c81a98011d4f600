"""Quick A/B probe: time ONE program — the full RGBD forward at b8 384x1280
bf16 — with an in-program fori_loop (see tools/profile_segments.py for why).
Run on the real TPU: ``python tools/probe_full_fwd.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.models.packnet import PackNetSAN

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B = int(sys.argv[sys.argv.index('--batch') + 1]) \
        if '--batch' in sys.argv else 8
    H, W = 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    rgb = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(dtype)
    lid = rng.rand(B, H, W, 1).astype(np.float32) * 80.0
    lid[rng.rand(B, H, W, 1) < 0.95] = 0.0
    lidar = jnp.asarray(lid).astype(dtype)

    model = PackNetSAN(version='1A')
    small = jnp.zeros((1, 64, 128, 3), dtype)
    small_d = jnp.zeros((1, 64, 128, 1), dtype)
    v = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(key, small, small_d)
    v = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)
    if '--cache' in sys.argv:
        from mindtheedge_tpu.models.packnet import prepare_kernel_cache
        v = prepare_kernel_cache(model, v, rgb[:1], lidar[:1])
        print(f"kernel cache: "
              f"{len(jax.tree_util.tree_leaves(v['kernel_cache']))} entries")

    perturb_lidar = '--perturb-lidar' in sys.argv

    def looped(v_, r, d):
        def body(i, acc):
            ri = r + (i.astype(r.dtype) * jnp.asarray(1e-3, r.dtype))
            # perturbing ONLY rgb leaves the lidar-only SAN sub-DAG loop-
            # invariant, which XLA can hoist out of the fori_loop -> the
            # loop then measures a program without the SAN ladder
            di = d + (i.astype(d.dtype) * jnp.asarray(1e-3, d.dtype)) * (d > 0) \
                if perturb_lidar else d
            out = model.apply(v_, ri, di, train=False)['inv_depths'][0]
            return acc + out.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(looped)
    float(f(v, rgb, lidar))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        s = float(f(v, rgb, lidar))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s), s
    dt = (min(times) - 0.020) / K
    print(f'full_rgbd {dt * 1e3:8.1f} ms  {B / dt:7.1f} img/s')


if __name__ == '__main__':
    main()
