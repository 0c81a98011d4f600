"""Cached-serving batch sweep + NMS/wire tail cost (round 5).

Times the CACHED serving program (the bench.py device path) at several batch
sizes, bare and with the fused NMS-edge + wire tail, with the K-loop
in-program technique.  Picks where the device headline should be measured
and how much the post-model chain costs.  Run serially on the TPU:
``python tools/probe_serving_sweep.py``.
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
    from mindtheedge_tpu.models.packnet import PackNetSAN, prepare_kernel_cache
    from mindtheedge_tpu.utils.depth import inv2depth
    from mindtheedge_tpu.ops.pallas.nms_kernel import (
        non_max_suppression_fast as nms)

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    H, W = 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    model = PackNetSAN(version='1A')
    small = jnp.zeros((1, 64, 128, 3), dtype)
    small_d = jnp.zeros((1, 64, 128, 1), dtype)
    v = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(
        key, small, small_d)
    v = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)
    v = prepare_kernel_cache(model, v, jnp.zeros((1, H, W, 3), dtype),
                             jnp.zeros((1, H, W, 1), dtype))

    def bare(v_, r, d):
        out = model.apply(v_, r, d, train=False)
        return out['inv_depths'][0].astype(jnp.float32).mean()

    def with_tail(v_, r, d):
        out = model.apply(v_, r, d, train=False)
        inv_depth = out['inv_depths'][0][..., 0].astype(jnp.float32)
        depth = inv2depth(inv_depth)
        prob = jnp.clip(inv_depth / 2.0, 0.0, 1.0)
        edges = nms(prob)
        return depth.mean() + edges.sum()

    def timeit(fn, B):
        rgb = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(dtype)
        lid = rng.rand(B, H, W, 1).astype(np.float32) * 80.0
        lid[rng.rand(B, H, W, 1) < 0.95] = 0.0
        lid = jnp.asarray(lid).astype(dtype)

        def looped(v_, r, d):
            def body(i, acc):
                ri = r + (i.astype(r.dtype) * jnp.asarray(1e-3, r.dtype))
                # lidar perturbed too or XLA hoists the SAN ladder out of
                # the loop (round-5 finding, see bench.py)
                di = d + (i.astype(d.dtype) * jnp.asarray(1e-3, d.dtype)) \
                    * (d > 0).astype(d.dtype)
                return acc + fn(v_, ri, di)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(looped)
        try:
            float(f(v, rgb, lid))
        except Exception as e:
            if 'RESOURCE_EXHAUSTED' in str(e) or 'memory' in str(e).lower():
                return None
            raise
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(f(v, rgb, lid))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s), s
        return (min(times) - 0.020) / K

    for B in (8, 16, 32):
        tb = timeit(bare, B)
        tt = timeit(with_tail, B)
        if tb is None or tt is None:
            print(f'b{B}: OOM')
            continue
        print(f'b{B}: bare {tb * 1e3:7.1f} ms ({B / tb:6.1f} img/s, '
              f'{tb / B * 1e3:5.2f} ms/img) | +nms/tail {tt * 1e3:7.1f} ms '
              f'({B / tt:6.1f} img/s) | tail cost {(tt - tb) * 1e3:5.1f} ms')


if __name__ == '__main__':
    main()
