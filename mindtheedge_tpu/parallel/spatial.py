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


def spec_hw(spatial_axis):
    """Normalize a module ``spatial_axis`` into ``(h_axis, w_axis)``.

    Accepted forms: ``None`` (unsharded), a string (H-sharded over that axis
    — the original 1-D form, back-compatible), or a 2-tuple
    ``(h_axis_or_None, w_axis_or_None)`` for W-only / HxW sharding.
    """
    if spatial_axis is None:
        return (None, None)
    if isinstance(spatial_axis, str):
        return (spatial_axis, None)
    h_ax, w_ax = spatial_axis
    return (h_ax, w_ax)


def spec_axes(spatial_axis):
    """The non-None mesh axis names of a spatial spec (for pmean/psum)."""
    return tuple(a for a in spec_hw(spatial_axis) if a)


def _halo_exchange_dim(x, p, axis_name, dim):
    """Exchange p boundary slices with mesh neighbours along tensor dim
    ``dim`` (1 = H, 2 = W).  ``ppermute`` leaves non-received slots zero, so
    the first/last shard get zero slices — exactly the global SAME-conv zero
    padding."""
    n = axis_size(axis_name)
    assert x.shape[dim] >= p, \
        f'halo {p} exceeds local shard extent {x.shape[dim]} (dim {dim})'
    pad = [(0, 0)] * x.ndim
    if n == 1:
        pad[dim] = (p, p)
        return jnp.pad(x, pad)
    idx_lo = [slice(None)] * x.ndim
    idx_lo[dim] = slice(0, p)
    idx_hi = [slice(None)] * x.ndim
    idx_hi[dim] = slice(x.shape[dim] - p, x.shape[dim])
    top = jax.lax.ppermute(x[tuple(idx_hi)], axis_name,
                           [(i, i + 1) for i in range(n - 1)])
    bot = jax.lax.ppermute(x[tuple(idx_lo)], axis_name,
                           [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([top, x, bot], axis=dim)


def halo_exchange_h(x, p, spatial_axis):
    """Halo-exchange p rows/cols per the spatial spec.

    x: local shard [B, h, W, C].  For an H-axis spec returns
    [B, h + 2p, W, C]; for an HxW spec the W exchange runs on the H-extended
    tensor, so each shard also receives the diagonal-neighbour corner blocks
    exactly (sequential-exchange corner completion).  Name kept from the
    original H-only helper — every conv call site routes through here.
    """
    if p == 0 or spatial_axis is None:
        return x
    h_ax, w_ax = spec_hw(spatial_axis)
    if h_ax is not None:
        x = _halo_exchange_dim(x, p, h_ax, 1)
    if w_ax is not None:
        x = _halo_exchange_dim(x, p, w_ax, 2)
    return x


def legal_space_sizes(height, n_levels=5, limit=8):
    """All mesh sizes n for which H-sharding ``height`` keeps every pack
    level shard-local: H % n == 0 and the local height survives ``n_levels``
    stride-2 halvings staying even (i.e. H/n divisible by 2**n_levels)."""
    div = 2 ** n_levels
    return [n for n in range(1, limit + 1)
            if height % n == 0 and (height // n) % div == 0]


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


def legal_space_grids(height, width, n_levels=5, limit=8):
    """All (n_h, n_w) grids for which HxW sharding keeps every pack level
    shard-local in both dims (each dim divisible by its mesh extent, local
    extent surviving ``n_levels`` stride-2 halvings).  Includes 1-D grids
    (n_w=1 = classic H sharding, n_h=1 = W-only)."""
    hs = legal_space_sizes(height, n_levels, limit)
    ws = legal_space_sizes(width, n_levels, limit)
    return [(nh, nw) for nh in hs for nw in ws if nh * nw <= limit]


def make_space_mesh_hw(n_h, n_w, devices=None,
                       h_axis='space', w_axis='space_w'):
    """2-D spatial mesh: H over ``h_axis`` (major), W over ``w_axis`` (minor,
    so W halo ppermutes ride nearest-neighbour links)."""
    devices = jax.devices() if devices is None else devices
    n = n_h * n_w
    assert len(devices) >= n, f'need {n} devices, have {len(devices)}'
    return Mesh(np.asarray(devices[:n]).reshape(n_h, n_w), (h_axis, w_axis))


def make_dp_space_mesh(n_data, n_space, devices=None,
                       data_axis='data', axis_name='space'):
    """2-D (data x space) mesh: batch DP over ``data``, H-sharding over
    ``space``.  Space is the minor (fastest-varying) axis so halo ppermutes
    ride nearest-neighbour ICI links within each data replica group."""
    devices = jax.devices() if devices is None else devices
    n = n_data * n_space
    assert len(devices) >= n, f'need {n} devices, have {len(devices)}'
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_space),
                (data_axis, axis_name))


def make_spatial_infer(model, mesh, axis_name='space', with_depth=False,
                       w_axis_name=None):
    """jit-compiled spatially-sharded forward.

    ``model`` must be constructed with a matching ``spatial_axis`` —
    ``axis_name`` for H-only, ``(axis_name, w_axis_name)`` for HxW, or
    ``(None, w_axis_name)`` for W-only (pass ``axis_name=None``).  Returns
    ``fn(variables, rgb[, input_depth]) -> inv_depths`` where rgb enters
    spatially sharded over the mesh and the inverse-depth pyramid comes back
    sharded the same way (fetch or ``device_put`` to replicated as needed).
    """
    def fwd(variables, *inputs):
        out = model.apply(variables, *inputs, train=False)
        return out['inv_depths']

    n_in = 2 if with_depth else 1
    act = P(None, axis_name, w_axis_name)
    sharded = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(),) + (act,) * n_in,
        out_specs=[act] * 4,
        check_vma=False)
    return jax.jit(sharded)


def shard_spatial(x, mesh, axis_name='space', w_axis_name=None):
    """Place [B,H,W,C] spatially sharded over the mesh."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, axis_name, w_axis_name)))


def make_spatial_train_step(task, optimizer, mesh, axis_name='space'):
    """Spatially-sharded training: full-res frames whose activations overflow
    one chip's HBM train across the mesh, bit-identical to the single-chip
    step.

    Design (gather-the-pyramid): the depth net — where all the activation
    memory lives — runs H-sharded with halo exchange; its outputs (the
    4-scale inverse-depth pyramid + feature-consistency scalar, KBs not GBs)
    are all_gathered/pmean'd via the task's ``output_hook``, so the ENTIRE
    loss stack (supervised, class-balanced edge BCE, attention, Sobel
    GradLoss) runs unmodified on full tensors and every device computes the
    same loss.  Autodiff splits gradients back through the gather to the
    local shards; the per-device partial parameter grads are pmean'd
    (``grad_transform``) before the (replicated) optimizer update.  pmean,
    not psum: the replicated loss gives every device the SAME cotangent, and
    the transpose of a tiled ``all_gather`` psum-scatters those n identical
    cotangents — each device's shard gradient already carries a factor n, so
    the mean over devices (not the sum) reconstructs the exact full-batch
    gradient; gradients of replicated compute (pose net, pmean'd aux losses)
    are likewise already full and survive a mean unchanged.  RNG is
    identical on every device, so dropout (whole-channel) and the lr-flip
    draw the same decisions — the step matches the unsharded one to float
    tolerance (tests/test_spatial_sharding.py).

    Composes with batch DP: on a 2-D ``make_dp_space_mesh`` mesh the batch
    dim additionally shards over ``data`` (net inputs ``P(data, space)``,
    loss targets ``P(data)``), per-data-replica losses stay local, and the
    final grad pmean runs over BOTH axes — the space mean reconstructs each
    replica's full gradient, the data mean is ordinary DP averaging.  The
    whole-batch lr-flip draw (one bernoulli per step, ``SfmModel.py:58``)
    uses the same rng on every device, so sharded and unsharded steps flip
    identically.

    Returns ``step(state, batch, rng, progress=0.0)``; net-input batch keys
    (``task.input_keys``) enter H-sharded, loss targets replicated.
    """
    import copy
    from mindtheedge_tpu.training.train_step import make_train_step

    task = copy.copy(task)
    assert hasattr(task.depth_net, 'spatial_axis'), \
        f'{type(task.depth_net).__name__} has no spatial support'
    if task.supervised_loss_weight < 1.0 and task.pose_net is not None:
        # Self-sup / semi-sup spatial design (VERDICT r3 #6): depth-net
        # compute stays H-sharded; the pose net (7 stride-2 convs to a 6-DoF
        # vector — KBs of activations) runs REPLICATED on the all_gathered
        # full-H rgb; the photometric warp then consumes the gathered full-H
        # pyramid (output_hook below) + space-replicated context originals,
        # so the whole loss is replicated and matches the unsharded step.
        # Pose grads come out full and identical on every device, so the
        # grad pmean over space leaves them unchanged (see pmean note below).
        task.pose_input_transform = lambda rgb, ctx: (
            jax.lax.all_gather(rgb, axis_name, axis=1, tiled=True), ctx)
    task.depth_net = task.depth_net.clone(spatial_axis=axis_name)
    # Only 4-D image inputs consumed EXCLUSIVELY by the depth net enter
    # H-sharded.  rgb_edge is also reused by the edge loss as seg_mask
    # against the all_gathered full-H pyramid, and intrinsics is [B,3,3]:
    # both stay space-replicated; rgb_edge is sliced to the local shard at
    # the net boundary below (ADVICE r2, spatial.py:217).
    shard_keys = {'rgb', 'input_depth'}
    data_axis = next((a for a in mesh.axis_names if a != axis_name), None)
    grad_axes = (axis_name,) if data_axis is None else (axis_name, data_axis)

    def slice_local_h(kwargs):
        out = {}
        for k, v in kwargs.items():
            if k not in shard_keys and hasattr(v, 'ndim') and v.ndim == 4:
                n = axis_size(axis_name)
                h_local = v.shape[1] // n
                out[k] = jax.lax.dynamic_slice_in_dim(
                    v, jax.lax.axis_index(axis_name) * h_local, h_local, 1)
            else:
                out[k] = v
        return out

    task.net_input_transform = slice_local_h

    def gather_outputs(out):
        out = dict(out)
        for k in ('inv_depths', 'inv_depths_rgbd'):
            if k in out:
                out[k] = [jax.lax.all_gather(d, axis_name, axis=1, tiled=True)
                          for d in out[k]]
        if 'depth_loss' in out:
            out['depth_loss'] = jax.lax.pmean(out['depth_loss'], axis_name)
        return out

    task.output_hook = gather_outputs
    inner_step = make_train_step(
        task, optimizer,
        grad_transform=lambda g: jax.lax.pmean(g, grad_axes))

    def base_step(state, batch, rng, progress):
        new_state, metrics = inner_step(state, batch, rng, progress)
        if data_axis is not None:
            # per-replica losses/metrics -> global batch mean (grad_norm is
            # already of the pmean'd full-batch gradient, identical on all
            # devices; the mean is a no-op for it).  BN running stats (SAN
            # masked BN) also differ per data replica: pmean = sync-BN, and
            # keeps the replicated-output contract honest.
            metrics = jax.lax.pmean(metrics, data_axis)
            if new_state.batch_stats:
                new_state = new_state.replace(
                    batch_stats=jax.tree_util.tree_map(
                        lambda x: jax.lax.pmean(x, data_axis),
                        new_state.batch_stats))
        return new_state, metrics

    _cache = {}

    def step(state, batch, rng, progress=0.0):
        specs = {k: (P(data_axis, axis_name) if k in shard_keys
                     else P(data_axis))
                 for k in batch}
        sig = tuple(sorted(batch))
        if sig not in _cache:
            _cache[sig] = jax.jit(jax.shard_map(
                base_step, mesh=mesh,
                in_specs=(P(), specs, P(), P()),
                out_specs=(P(), P()), check_vma=False))
        batch = {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
                 for k, v in batch.items()}
        state = jax.device_put(state, NamedSharding(mesh, P()))
        return _cache[sig](state, batch, rng, jnp.asarray(progress))

    return step
