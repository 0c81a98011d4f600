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
BATCH = 8
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.models.packnet import PackNetSAN
    from mindtheedge_tpu.utils.depth import inv2depth
    from mindtheedge_tpu.ops.edge_ops import non_max_suppression

    model = PackNetSAN(version='1A')
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32))
    lidar = rng.rand(BATCH, H, W, 1).astype(np.float32) * 80.0
    lidar[rng.rand(BATCH, H, W, 1) < 0.95] = 0.0
    lidar = jnp.asarray(lidar)

    variables = jax.jit(lambda k, r, d: model.init(k, r, d, train=False))(
        jax.random.PRNGKey(0), rgb, lidar)

    @jax.jit
    def forward(variables, rgb, lidar):
        out = model.apply(variables, rgb, lidar, train=False)
        inv_depth = out['inv_depths'][0][..., 0]
        depth = inv2depth(inv_depth)
        prob = jnp.clip(inv_depth / 2.0, 0.0, 1.0)
        edges = non_max_suppression(prob)
        return depth, edges

    for _ in range(WARMUP):
        jax.block_until_ready(forward(variables, rgb, lidar))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(variables, rgb, lidar)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt

    print(json.dumps({
        'metric': 'depth_edge_inference_images_per_sec_384x1280',
        'value': round(ips, 3),
        'unit': 'img/s',
        'vs_baseline': round(ips / REFERENCE_EST_IMG_PER_S, 3),
    }))


if __name__ == '__main__':
    main()
