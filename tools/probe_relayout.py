"""Cost of the packing relayouts (unpack_w / pack_w / pack2d / unpack2d).

The stem bisect showed a [8,384,1280,32] unpack_w costing ~5.7 ms — ~20x
its 0.6 ms byte roofline (lane-dimension transposes).  This probe times the
relayouts standalone at the shapes the network uses.  Run serially."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

K = 30


def main():
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.ops.phase_conv import pack_w, unpack_w
    from mindtheedge_tpu.ops.packing import pack2d, unpack2d

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    rng = np.random.RandomState(0)

    def timeit(fn, x, label):
        def looped(x_):
            def body(i, acc):
                xi = x_ + (i.astype(x_.dtype) * jnp.asarray(1e-3, x_.dtype))
                return acc + fn(xi).astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        f = jax.jit(looped)
        float(f(x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(f(x))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s), s
        mb = x.size * x.dtype.itemsize / 1e6
        dt = (min(times) - 0.020) / K
        print(f'{label:44s} {dt * 1e3:6.2f} ms  ({mb:5.0f} MB, '
              f'{2 * mb / 1e3 / dt:5.0f} GB/s eff)', flush=True)

    def mk(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(jnp.bfloat16)

    timeit(lambda x: unpack_w(x, 4), mk((8, 384, 320, 128)),
           'unpack_w r4 @ [8,384,320,128]->[...,32]')
    timeit(lambda x: pack_w(x, 4), mk((8, 384, 1280, 32)),
           'pack_w r4 @ [8,384,1280,32]')
    timeit(lambda x: unpack_w(x, 4), mk((8, 192, 160, 256)),
           'unpack_w r4 @ [8,192,160,256]->[...,64]')
    timeit(lambda x: pack2d(x, 2), mk((8, 192, 640, 64)),
           'pack2d @ [8,192,640,64]')
    timeit(lambda x: unpack2d(x, 2), mk((8, 96, 320, 256)),
           'unpack2d @ [8,96,320,256]')
    timeit(lambda x: x + 1.0, mk((8, 384, 320, 128)),
           'elementwise baseline @ same bytes')


if __name__ == '__main__':
    main()
