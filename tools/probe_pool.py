"""Probe: C=1 full-res masked max-pool formulations.

The profile (tools/profile_segments.py) shows the SAN level-0 pool at
[8,384,1280,1] costs ~25 ms alone: C=1 puts one value in a 128-wide lane
vector, so the 13 strided-slice ops of the max chain each run at ~1% lane
efficiency.  Candidates measured here:

  chain      — current implementation (masked_max_pool_3x3_s2)
  phase      — squeeze C, split H/W phases via reshape, elementwise maxima
  reduce_win — lax.reduce_window max on the squeezed [B,H,W]

All are semantically identical for this network's inputs (values >= 0,
inactive sites exactly 0 — see masked_max_pool_3x3_s2 docstring).
Run on the real TPU: ``python tools/probe_pool.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def phase_pool_c1(x, mask):
    """[B,H,W,1] plain-max 3x3/2 pool + 2x2-cell mask, lane-friendly."""
    import jax.numpy as jnp
    b, h, w, _ = x.shape
    xm = (x * mask)[..., 0]                              # [B,H,W], >= 0
    xr = xm.reshape(b, h // 2, 2, w)
    E, O = xr[:, :, 0], xr[:, :, 1]                      # rows 2i / 2i+1
    Oup = jnp.pad(O, ((0, 0), (1, 0), (0, 0)))[:, :-1]   # row 2i-1
    R = jnp.maximum(jnp.maximum(E, O), Oup)              # [B,H/2,W]
    Rr = R.reshape(b, h // 2, w // 2, 2)
    RE, RO = Rr[..., 0], Rr[..., 1]                      # cols 2j / 2j+1
    ROl = jnp.pad(RO, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]  # col 2j-1
    pooled = jnp.maximum(jnp.maximum(RE, RO), ROl)       # [B,H/2,W/2]
    mr = mask[..., 0].reshape(b, h // 2, 2, w)
    cm = jnp.maximum(mr[:, :, 0], mr[:, :, 1])
    cmr = cm.reshape(b, h // 2, w // 2, 2)
    new_mask = (jnp.maximum(cmr[..., 0], cmr[..., 1]) > 0).astype(x.dtype)
    pooled = (pooled * new_mask).astype(x.dtype)
    return pooled[..., None], new_mask[..., None]


def reduce_win_pool_c1(x, mask):
    import jax
    import jax.numpy as jnp
    b, h, w, _ = x.shape
    xm = (x * mask)[..., 0]
    pooled = jax.lax.reduce_window(
        xm, jnp.asarray(0., xm.dtype), jax.lax.max,
        (1, 3, 3), (1, 2, 2), [(0, 0), (1, 0), (1, 0)])
    cell = jax.lax.reduce_window(
        mask[..., 0], jnp.asarray(0., x.dtype), jax.lax.max,
        (1, 2, 2), (1, 2, 2), [(0, 0), (0, 0), (0, 0)])
    new_mask = (cell > 0).astype(x.dtype)
    pooled = (pooled * new_mask).astype(x.dtype)
    return pooled[..., None], new_mask[..., None]


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.sparse import masked_max_pool_3x3_s2

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W = 8, 384, 1280
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    xs, ms = [], []
    for i in range(4):
        d = rng.rand(B, H, W, 1).astype(np.float32) * 80.0
        d[rng.rand(B, H, W, 1) < 0.95] = 0.0
        xs.append(jnp.asarray(d).astype(dtype))
        ms.append((xs[-1] > 0).astype(dtype))

    variants = {
        'chain': masked_max_pool_3x3_s2,
        'phase': phase_pool_c1,
        'reduce_win': reduce_win_pool_c1,
    }
    K = 50  # in-program iterations: one ~20 ms relay dispatch, K executions
    ref = None
    for name, fn in variants.items():
        g = jax.jit(fn)
        # correctness vs the chain
        p0, m0 = [np.asarray(t, np.float32) for t in g(xs[0], ms[0])]
        if ref is None:
            ref = (p0, m0)
        else:
            np.testing.assert_array_equal(m0, ref[1], err_msg=f'{name} mask')
            np.testing.assert_allclose(p0, ref[0], rtol=0, atol=0,
                                       err_msg=f'{name} pooled')

        def looped(x, fn=fn):
            def body(i, acc):
                xi = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
                p, m = fn(xi, (xi > 0).astype(xi.dtype))
                return acc + p.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(looped)
        float(f(xs[0]))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            s = float(f(xs[i % 4]))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s)
        print(f'  {name:12s} {(min(times) - 0.020) / K * 1e3:7.3f} ms/iter')


if __name__ == '__main__':
    main()
