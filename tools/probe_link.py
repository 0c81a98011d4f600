"""Measure the host<->device relay link: upload / download / duplex rates.

The serving loop's e2e throughput is link-bound (NOTES.md); this probe
measures the honest ceiling for the exact transfer sizes bench.py uses
(batch-8 384x1280: 11.8 MB uplink u8 rgb, 8.3 MB downlink u16 depth +
bit-packed edges) — each direction alone, then both concurrently — so the
overlap efficiency of the 3-stage pipeline can be judged against hardware
rather than guesses.  Run: ``python tools/probe_link.py``.
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

B, H, W = 8, 384, 1280
N = 6


def main():
    import jax
    import jax.numpy as jnp

    up_mb = B * H * W * 3 / 1e6          # uint8 rgb
    down_mb = (B * H * W * 2 + B * H * W // 8) / 1e6  # u16 depth + packed edges

    rng = np.random.RandomState(0)
    host_batches = [rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8)
                    for _ in range(N)]

    # device-resident tensors to download (distinct contents, pre-built)
    mk_d = jax.jit(lambda s: (jnp.full((B, H, W, 1), s, jnp.uint16),
                              jnp.full((B, H, W // 8), s, jnp.uint8)))
    dev_batches = [jax.block_until_ready(mk_d(i)) for i in range(N)]

    def up_once(i):
        x = jnp.asarray(host_batches[i])
        x.block_until_ready()
        return x

    def down_once(i):
        d, e = dev_batches[i]
        return np.asarray(d), np.asarray(e)

    # warm both paths
    up_once(0); down_once(0)

    t0 = time.perf_counter()
    for i in range(N):
        up_once(i)
    t_up = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(N):
        down_once(i)
    t_down = time.perf_counter() - t0

    # duplex: one upload thread + one download thread
    def up_loop():
        for i in range(N):
            up_once(i)

    def down_loop():
        for i in range(N):
            down_once(i)

    t0 = time.perf_counter()
    th = threading.Thread(target=down_loop)
    th.start()
    up_loop()
    th.join()
    t_duplex = time.perf_counter() - t0

    print(f'uplink  : {N} x {up_mb:5.1f} MB in {t_up:6.2f}s '
          f'= {N * up_mb / t_up:6.1f} MB/s')
    print(f'downlink: {N} x {down_mb:5.1f} MB in {t_down:6.2f}s '
          f'= {N * down_mb / t_down:6.1f} MB/s')
    print(f'duplex  : both concurrently in {t_duplex:6.2f}s '
          f'(serial would be {t_up + t_down:6.2f}s; '
          f'overlap {(t_up + t_down) / t_duplex:4.2f}x)')
    print(f'e2e ceiling at these rates: '
          f'{B * N / max(t_up, t_down):5.1f} img/s (perfect overlap), '
          f'{B * N / t_duplex:5.1f} img/s (measured duplex)')


if __name__ == '__main__':
    main()
