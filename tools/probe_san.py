"""Micro-probe: where do SAN mconv0 (20.4 ms) and encoder conv2 (14.1 ms)
actually spend their time?  Times each constituent op at its real shape
(b8 384x1280 bf16 pipeline) plus W-lane-packed variants of the narrow convs,
so the packing win is measured BEFORE being built into the modules.
In-program fori_loop timing (see tools/profile_segments.py).
Run serially on the TPU: ``python tools/probe_san.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 10


def bench(scalar_fn, args, iters=3):
    import jax
    import jax.numpy as jnp

    def looped(*a):
        x = a[0]

        def body(i, acc):
            xi = x + (i.astype(x.dtype) * jnp.asarray(1e-3, x.dtype))
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
    import flax.linen as nn
    from mindtheedge_tpu.ops.blocks import (
        ConvBlock, ResidualConv, ResidualBlock, GroupNorm)
    from mindtheedge_tpu.ops.sparse import (
        MinkConvBlock, MaskedBatchNorm, masked_max_pool_3x3_s2)
    from mindtheedge_tpu.ops.phase_conv import expand_kernel_phase, unpack_w

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    B = 8
    h, w = 192, 640          # post-pool level-0 resolution
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def mk(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(dtype)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, v)

    mask = (mk((B, h, w, 1)) > 0.7).astype(dtype)   # ~30% active post-pool
    res = {}

    # ---- SAN mconv0 constituents -----------------------------------------
    lid_full = mk((B, 384, 1280, 1)) * 80
    mask_full = (mk((B, 384, 1280, 1)) > 0.95).astype(dtype)
    res['pool0 C=1 @384x1280'] = bench(
        lambda x: sum(o.astype(jnp.float32).sum()
                      for o in masked_max_pool_3x3_s2(x * mask_full, mask_full)),
        (lid_full,))

    def conv_masked(cin, cout, k, pack_rw=1):
        kern = mk((k, k, cin, cout))
        x = mk((B, h, w, cin))

        if pack_rw == 1:
            def f(x_, kern_, mask_):
                y = jax.lax.conv_general_dilated(
                    x_ * mask_, kern_, (1, 1),
                    [(k // 2,) * 2, (k // 2,) * 2],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC')) * mask_
                return y.astype(jnp.float32).mean()
        else:
            kp = expand_kernel_phase(kern, 1, pack_rw)

            def f(x_, kern_, mask_):
                y = jax.lax.conv_general_dilated(
                    x_ * mask_, kern_, (1, pack_rw),
                    [(k // 2,) * 2, (k // 2,) * 2],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                mp = mask_[..., 0].reshape(B, h, w // pack_rw, pack_rw)
                y = y * jnp.tile(mp, (1, 1, 1, cout))
                return y.astype(jnp.float32).mean()
            kern = kp
        return bench(f, (x, kern, mask))

    res['conv 5x5 1->160 (fused L0)'] = conv_masked(1, 160, 5)
    res['conv 5x5 64->32'] = conv_masked(64, 32, 5)
    res['conv 5x5 64->32 packed rw4'] = conv_masked(64, 32, 5, 4)
    res['conv 5x5 64->64'] = conv_masked(64, 64, 5)
    res['conv 5x5 64->64 packed rw2'] = conv_masked(64, 64, 5, 2)

    bn = MaskedBatchNorm()
    xb = mk((B, h, w, 64))
    vb = cast(jax.jit(lambda k_, x_, m_: bn.init(k_, x_, m_, True))(
        key, xb[:1], mask[:1]))
    res['maskedBN train C=64'] = bench(
        lambda x_, v_, m_: bn.apply(v_, x_, m_, True, mutable=['batch_stats']
                                    )[0].astype(jnp.float32).mean(),
        (xb, vb, mask))
    res['maskedBN eval C=64'] = bench(
        lambda x_, v_, m_: bn.apply(v_, x_, m_, False)
        .astype(jnp.float32).mean(), (xb, vb, mask))
    res['relu*mask C=64'] = bench(
        lambda x_, m_: (nn.relu(x_) * m_).astype(jnp.float32).mean(),
        (xb, mask))

    mod = MinkConvBlock(32, 5)
    vm = cast(jax.jit(lambda k_, x_, m_: mod.init(k_, x_, m_, False))(
        key, lid_full[:1], mask_full[:1]))
    res['mconv0 full (known ~20)'] = bench(
        lambda x_, v_, m_: mod.apply(v_, x_, m_, False)[0]
        .astype(jnp.float32).mean(), (lid_full, vm, mask_full))

    # ---- encoder conv2 constituents --------------------------------------
    x32 = mk((B, h, w, 32))
    x64 = mk((B, h, w, 64))

    for name, mod2, xin in (
            ('ConvBlock 3x3 32->64', ConvBlock(64, 3, 1), x32),
            ('ConvBlock 3x3 64->64', ConvBlock(64, 3, 1), x64),
            ('ConvBlock 3x3 64->64 nopack',
             ConvBlock(64, 3, 1, auto_lane_pack=False), x64),
            ('ResidualConv 32->64', ResidualConv(64), x32),
            ('ResidualBlock x2 (known ~14)', ResidualBlock(64, 2), x32)):
        if isinstance(mod2, (ResidualConv, ResidualBlock)):
            v = cast(jax.jit(lambda k_, x_: mod2.init(k_, x_, False))(
                key, xin[:1]))
            res[name] = bench(lambda x_, v_: mod2.apply(v_, x_, False)
                              .astype(jnp.float32).mean(), (xin, v))
        else:
            v = cast(jax.jit(lambda k_, x_: mod2.init(k_, x_))(key, xin[:1]))
            res[name] = bench(lambda x_, v_: mod2.apply(v_, x_)
                              .astype(jnp.float32).mean(), (xin, v))

    sc = nn.Conv(64, (1, 1), use_bias=True)
    vsc = cast(jax.jit(lambda k_, x_: sc.init(k_, x_))(key, x32[:1]))
    res['shortcut 1x1 32->64'] = bench(
        lambda x_, v_: sc.apply(v_, x_).astype(jnp.float32).mean(), (x32, vsc))

    gn = GroupNorm(num_groups=16)
    vgn = cast(jax.jit(lambda k_, x_: gn.init(k_, x_))(key, x64[:1]))
    res['GN(16)+elu C=64'] = bench(
        lambda x_, v_: nn.elu(gn.apply(v_, x_)).astype(jnp.float32).mean(),
        (x64, vgn))

    print(f'b{B} shapes around level-0 (post-pool {h}x{w}) bf16, ms:')
    for k_, dt in res.items():
        print(f'  {k_:34s} {dt * 1e3:7.2f} ms')


if __name__ == '__main__':
    main()
