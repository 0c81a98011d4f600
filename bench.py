"""Benchmark: batched depth+edge inference throughput at 384x1280.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.md): the reference runs an unbatched per-image Python
loop (infer_edges.py:115-120) with host cv2/PIL preprocessing on one CUDA
GPU; no number is published.  ``vs_baseline`` is measured img/s divided by a
10 img/s reference estimate (PackNet-SAN at 384x1280 forward+host post ~0.1
s/img on the reference's single-GPU setup); the estimate is recorded here so
the ratio is auditable.
"""

import json
import time

import numpy as np

REFERENCE_EST_IMG_PER_S = 10.0
H, W = 384, 1280
WARMUP = 2
ITERS = 10


def _setup_cache():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def _bench(batch, dtype_name):
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.models.packnet import PackNetSAN
    from mindtheedge_tpu.utils.depth import inv2depth
    from mindtheedge_tpu.ops.pallas.nms_kernel import non_max_suppression_fast as non_max_suppression

    dtype = jnp.bfloat16 if dtype_name == 'bf16' else jnp.float32
    model = PackNetSAN(version='1A')
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(batch, H, W, 3).astype(np.float32)).astype(dtype)
    lidar = rng.rand(batch, H, W, 1).astype(np.float32) * 80.0
    lidar[rng.rand(batch, H, W, 1) < 0.95] = 0.0
    lidar = jnp.asarray(lidar).astype(dtype)

    small = jnp.zeros((1, 64, 128, 3), dtype)
    small_d = jnp.zeros((1, 64, 128, 1), dtype)
    variables = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(
        jax.random.PRNGKey(0), small, small_d)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    @jax.jit
    def forward(variables, rgb, lidar):
        out = model.apply(variables, rgb, lidar, train=False)
        inv_depth = out['inv_depths'][0][..., 0].astype(jnp.float32)
        depth = inv2depth(inv_depth)
        prob = jnp.clip(inv_depth / 2.0, 0.0, 1.0)
        edges = non_max_suppression(prob)
        return depth.mean() + edges.sum()

    # Pipelined throughput: dispatch all iterations asynchronously with
    # DISTINCT inputs (the remote relay memoizes identical (program, args)
    # executions!), then sync on the sum of every checksum.  The ~17 ms
    # relay dispatch latency overlaps device compute, like a real serving
    # loop; a dependency-chained loop would serialize latency+compute.
    rgbs = [rgb + jnp.asarray(i, rgb.dtype) * 1e-3 for i in range(ITERS)]
    for i in range(WARMUP):
        float(forward(variables, rgbs[i % ITERS], lidar))
    t0 = time.perf_counter()
    checksums = [forward(variables, rgbs[i], lidar) for i in range(ITERS)]
    total = float(sum(checksums))
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    return batch * ITERS / dt


def main():
    _setup_cache()
    ips = None
    for batch in (8, 4, 2, 1):
        try:
            ips = _bench(batch, 'bf16')
            break
        except Exception as e:  # HBM OOM at this batch -> halve
            if 'RESOURCE_EXHAUSTED' not in str(e) and 'memory' not in str(e).lower():
                raise
    print(json.dumps({
        'metric': 'depth_edge_inference_images_per_sec_384x1280',
        'value': round(ips, 3),
        'unit': 'img/s',
        'vs_baseline': round(ips / REFERENCE_EST_IMG_PER_S, 3),
    }))


if __name__ == '__main__':
    main()
