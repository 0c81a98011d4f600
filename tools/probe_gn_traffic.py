"""Probe: what does XLA:TPU already fuse around a ConvBlock?

Answers, with measured ms + XLA cost-analysis bytes at pre_calc scale
(b8 x 384x1280 x 32ch bf16):

  (a) conv only                      — baseline traffic (in + out)
  (b) conv + GroupNorm               — does the stats reduce fuse into the conv?
  (c) conv + GroupNorm + ELU         — the full ConvBlock epilogue
  (d) concat(a, b) + conv            — does the concat materialize?
  (e) conv(a, Ka) + conv(b, Kb)      — the split-kernel alternative to (d)

Run on the real TPU (single-tenant — nothing else may use the chip):
``python tools/probe_gn_traffic.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.blocks import GroupNorm

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B, H, W, C = 8, 384, 1280, 32
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    unit = B * H * W * C * 2 / 1e9  # GB per [B,H,W,32] bf16 tensor

    xs = [jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(dtype)
          for _ in range(4)]
    ys = [jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(dtype)
          for _ in range(4)]
    k1 = jnp.asarray(rng.randn(5, 5, C, C).astype(np.float32) * 0.05).astype(dtype)
    k2 = jnp.asarray(rng.randn(5, 5, 2 * C, C).astype(np.float32) * 0.05).astype(dtype)

    gn = GroupNorm(num_groups=16)
    gv = gn.init(jax.random.PRNGKey(0), xs[0])
    dn = ('NHWC', 'HWIO', 'NHWC')

    def conv(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), [(2, 2), (2, 2)],
                                            dimension_numbers=dn)

    variants = {
        'a_conv': lambda x, y: conv(x, k1),
        'b_conv_gn': lambda x, y: gn.apply(gv, conv(x, k1)),
        'c_conv_gn_elu': lambda x, y: jax.nn.elu(gn.apply(gv, conv(x, k1))),
        'd_concat_conv': lambda x, y: conv(jnp.concatenate([x, y], -1), k2),
        'e_split_conv': lambda x, y: conv(x, k2[:, :, :C]) + conv(y, k2[:, :, C:]),
    }

    print(f'unit = one [{B},{H},{W},{C}] bf16 tensor = {unit:.3f} GB')
    KI = 20  # in-program iterations: one ~20 ms relay dispatch, KI executions
    for name, fn in variants.items():
        fl = by = 0
        try:
            an = jax.jit(fn).lower(xs[0], ys[0]).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            fl, by = an.get('flops', 0), an.get('bytes accessed', 0)
        except Exception:
            pass

        def looped(x, y, fn=fn):
            def body(i, acc):
                xi = x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
                return acc + fn(xi, y).astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, KI, body, jnp.float32(0.0))

        f = jax.jit(looped)
        float(f(xs[0], ys[0]))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            s = float(f(xs[i % 4], ys[i % 4]))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s)
        dt = (min(times) - 0.020) / KI
        print(f'  {name:16s} {dt * 1e3:7.2f} ms   {by / 1e9:6.2f} GB accessed '
              f'({by / 1e9 / unit:4.1f} units)   {fl / 1e12:5.2f} TFLOP')


if __name__ == '__main__':
    main()
