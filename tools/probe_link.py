"""Measure the host<->device relay link: upload / download / duplex rates.

The serving loop's e2e throughput is link-bound (NOTES.md); this probe
measures the honest ceiling for the exact transfer sizes bench.py uses
(batch-8 384x1280: 11.8 MB uplink u8 rgb, 8.3 MB downlink u16 depth +
bit-packed edges) — each direction alone, then both concurrently — so the
overlap efficiency of the 3-stage pipeline can be judged against hardware
rather than guesses.  Run: ``python tools/probe_link.py``.

Measurement hygiene (round-4 advisor fixes):
* every download phase (warm / timed / duplex) uses its OWN freshly-built
  device arrays — ``jax.Array`` caches the host copy (``_npy_value``) after
  the first ``np.asarray``, so re-downloading the same array transfers zero
  bytes and would make the phase a no-op;
* uplink timing cannot trust ``block_until_ready`` (a no-op on this relay):
  each timed upload loop ends with a jitted reduction over one element of
  every uploaded array whose scalar is fetched — the fetch cannot complete
  until the uploads have, so the timer bounds real transfer completion
  (one ~35 ms relay round-trip amortized over the N uploads).
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

    # device-resident tensors to download: a fresh, distinct set per phase
    # (warm / timed downlink / duplex) so no phase hits another's _npy_value
    # host-copy cache and every np.asarray below is a real transfer
    mk_d = jax.jit(lambda s: (jnp.full((B, H, W, 1), s, jnp.uint16),
                              jnp.full((B, H, W // 8), s, jnp.uint8)),
                   static_argnums=0)

    def fresh_dev_batches(phase):
        return [jax.block_until_ready(mk_d(phase * N + i)) for i in range(N)]

    # one uploaded element per array, summed: the scalar fetch is the sync
    sync_sum = jax.jit(lambda xs: sum(x[0, 0, 0, 0].astype(jnp.int32)
                                      for x in xs))

    def up_once(i):
        return jnp.asarray(host_batches[i])

    def up_loop():
        ups = [up_once(i) for i in range(N)]
        s = int(sync_sum(ups))          # forces completion of all N uploads
        assert s >= 0

    def down_loop(batches):
        for d, e in batches:
            np.asarray(d), np.asarray(e)

    # warm both paths on throwaway arrays not reused by any timed phase
    warm = fresh_dev_batches(0)
    up_loop()
    down_loop(warm[:1])
    del warm

    t0 = time.perf_counter()
    up_loop()
    t_up = time.perf_counter() - t0

    down_batches = fresh_dev_batches(1)
    t0 = time.perf_counter()
    down_loop(down_batches)
    t_down = time.perf_counter() - t0
    del down_batches

    # duplex: one upload thread + one download thread, fresh download set
    duplex_batches = fresh_dev_batches(2)
    t0 = time.perf_counter()
    th = threading.Thread(target=down_loop, args=(duplex_batches,))
    th.start()
    up_loop()
    th.join()
    t_duplex = time.perf_counter() - t0

    print(f'uplink  : {N} x {up_mb:5.1f} MB in {t_up:6.2f}s '
          f'= {N * up_mb / t_up:6.1f} MB/s (incl. one sync round-trip)')
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
