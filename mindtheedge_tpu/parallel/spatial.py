"""Spatial (H-axis) sharding with halo exchange — the HBM escape hatch.

The reference has no distributed story beyond Horovod batch-DP; its answer to
high resolution is "process the full image" (``transforms.py:75-82`` rounds
to x32 and hopes it fits).  SURVEY §5 maps the long-context axis of this
codebase to image resolution (DDAD eval at ~1216x1936): when one core's HBM
can't hold the full-res activations, shard H across the mesh and exchange
k//2-row halos at every conv.

Design (TPU-native):

* ``shard_map`` over a 1-D ``Mesh`` axis (composable with the batch/DP axis:
  a 2-D ``Mesh((dp, space))`` shards batch and height independently).
* Every SAME conv becomes: ``halo_exchange_h`` (one ``lax.ppermute`` pair
  riding ICI) + VALID-in-H conv.  ``ppermute`` zero-fills at the mesh edges,
  which IS the global zero padding — boundary semantics are preserved
  bit-for-bit.
* GroupNorm statistics are global over (H, W): each shard computes local
  per-channel moments and a single ``lax.pmean`` over the space axis
  reconstructs the exact global statistic (shards are equal-height, so the
  unweighted mean of means is exact).
* pack2d / unpack2d / nearest-upsample move pixels only within an r x r cell
  (r=2): with even local heights they are shard-local — no communication.

The modules themselves carry an optional ``spatial_axis`` name
(``ops/blocks.py``); this file provides the halo-exchange primitive and the
jit-ready ``shard_map`` runner.  Parameter trees are identical to the
unsharded model, so any checkpoint loads unchanged.

Height constraints: every pack level halves H, so the deepest feature height
H/32 must still divide the mesh (and stay even through pack levels).  384 ->
12 at H/32 supports ``n_space`` in {2, 4}; DDAD 1216 -> 38 supports {2}.
``max_space_devices`` computes the largest legal mesh for a given H.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def axis_size(axis_name):
    """Static size of a named mesh axis (inside shard_map)."""
    return jax.lax.psum(1, axis_name)


def halo_exchange_h(x, p, axis_name):
    """Exchange p boundary rows with mesh neighbours along the H axis.

    x: local shard [B, h, W, C] -> [B, h + 2p, W, C].  ``ppermute`` leaves
    non-received slots zero, so the first/last shard get zero rows — exactly
    the global SAME-conv zero padding.
    """
    if p == 0 or axis_name is None:
        return x
    n = axis_size(axis_name)
    assert x.shape[1] >= p, \
        f'halo {p} exceeds local shard height {x.shape[1]}'
    if n == 1:
        return jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    top = jax.lax.ppermute(x[:, -p:], axis_name,
                           [(i, i + 1) for i in range(n - 1)])
    bot = jax.lax.ppermute(x[:, :p], axis_name,
                           [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([top, x, bot], axis=1)


def max_space_devices(height, n_levels=5, limit=8):
    """Largest mesh size that keeps every pack level shard-local: the local
    height at each of the ``n_levels`` stride-2 levels must stay even."""
    best = 1
    n = 2
    while n <= limit:
        h = height
        ok = h % n == 0
        h //= n
        for _ in range(n_levels):
            if h % 2 != 0:
                ok = False
                break
            h //= 2
        if ok:
            best = n
        n *= 2
    return best


def make_space_mesh(n_space, devices=None, axis_name='space'):
    devices = jax.devices() if devices is None else devices
    assert len(devices) >= n_space, \
        f'need {n_space} devices, have {len(devices)}'
    return Mesh(np.asarray(devices[:n_space]), (axis_name,))


def make_spatial_infer(model, mesh, axis_name='space', with_depth=False):
    """jit-compiled spatially-sharded forward.

    ``model`` must be constructed with ``spatial_axis=axis_name``.  Returns
    ``fn(variables, rgb[, input_depth]) -> inv_depths`` where rgb enters
    H-sharded over the mesh and the inverse-depth pyramid comes back
    H-sharded (fetch or ``device_put`` to replicated as needed).
    """
    def fwd(variables, *inputs):
        out = model.apply(variables, *inputs, train=False)
        return out['inv_depths']

    n_in = 2 if with_depth else 1
    act = P(None, axis_name)
    sharded = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(),) + (act,) * n_in,
        out_specs=[act] * 4,
        check_vma=False)
    return jax.jit(sharded)


def shard_spatial(x, mesh, axis_name='space'):
    """Place [B,H,W,C] with H sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
