"""Generic (ray-surface) camera: learned per-pixel ray directions.

Reference: ``geometry/camera_generic.py`` (TRI "Neural Ray Surfaces").
``reconstruct``: P(x,y) = d(x,y) * r(x,y).  ``project``: soft-argmax over a
local patch of ray directions with temperature annealed by training progress
(``camera_generic.py:85-207``).

TPU adaptations: the patch gather/softmax is expressed as a batched gather +
einsum (no Python loops, static shapes); the default patch radius matches the
reference (20 at half resolution).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mindtheedge_tpu.geometry.pose import identity_pose, invert_pose, transform_points
from mindtheedge_tpu.utils.image import resize_bilinear


def reconstruct_generic(depth, ray_surface, Tcw=None, frame='w'):
    """depth [B,H,W,1], ray_surface [B,H,W,3] -> points [B,H,W,3]."""
    Xc = ray_surface * depth
    if frame == 'c':
        return Xc
    b = depth.shape[0]
    Tcw = identity_pose(b, depth.dtype) if Tcw is None else Tcw
    return transform_points(invert_pose(Tcw), Xc)


def _patch_coords(h, w, radius):
    """[H*W, K, 2] integer patch coordinates, shifted inside bounds
    (``camera_generic.py:132-149``)."""
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    grid = np.stack([gy, gx], -1).reshape(-1, 1, 2)
    py, px = np.meshgrid(np.arange(-radius, radius + 1),
                         np.arange(-radius, radius + 1), indexing='ij')
    patch = np.stack([py, px], -1).reshape(1, -1, 2)
    coords = grid + patch
    # shift whole patches inside image bounds (preserves patch structure)
    for d, size in ((0, h), (1, w)):
        under = coords[:, 0, d] < 0
        coords[under, :, d] -= coords[under, 0, d][:, None]
        over = coords[:, -1, d] > size - 1
        coords[over, :, d] -= (coords[over, -1, d] - (size - 1))[:, None]
    return coords


def project_generic(X, ray_surface, progress=0.0, Tcw=None, frame='c',
                    patch_radius=20, downsample=True,
                    min_temp=1e-8, start_temp=1e-4, constant=0.1):
    """Soft-argmax ray-surface projection -> normalized grid coords [B,H,W,2].

    Output convention matches the reference's return
    (``camera_generic.py:207``): last dim is (x_norm, y_norm) for grid
    sampling.
    """
    b, H, W, _ = X.shape
    if frame == 'w' and Tcw is not None:
        X = transform_points(Tcw, X)

    rs = ray_surface
    if downsample:
        h, w = H // 2, W // 2
        rs = resize_bilinear(rs, (h, w), align_corners=True)
        X = resize_bilinear(X, (h, w), align_corners=True)
    else:
        h, w = H, W

    coords = jnp.asarray(_patch_coords(h, w, patch_radius))      # [N,K,2]
    flat_idx = coords[..., 0] * w + coords[..., 1]               # [N,K]

    rs_flat = rs.reshape(b, h * w, 3)
    # gather patch rays: [B,N,K,3]
    patch_rays = jnp.take(rs_flat, flat_idx.reshape(-1), axis=1)
    patch_rays = patch_rays.reshape(b, h * w, -1, 3)

    direction = X.reshape(b, h * w, 3)
    direction = direction / jnp.clip(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12, None)

    logits = jnp.einsum('bnc,bnkc->bnk', direction, patch_rays)
    # traced-progress-safe temperature annealing (camera_generic.py:188-189)
    temperature = jnp.maximum(min_temp,
                              start_temp / jnp.exp(constant * jnp.asarray(progress)))
    weights = jax.nn.softmax(logits / temperature, axis=-1)
    expected = jnp.einsum('bnk,nkd->bnd', weights, coords.astype(jnp.float32))

    ynorm = 2 * expected[..., 0] / (h - 1) - 1.0
    xnorm = 2 * expected[..., 1] / (w - 1) - 1.0
    ynorm = ynorm.reshape(b, h, w, 1)
    xnorm = xnorm.reshape(b, h, w, 1)
    if downsample:
        ynorm = resize_bilinear(ynorm, (H, W), align_corners=True)
        xnorm = resize_bilinear(xnorm, (H, W), align_corners=True)
    return jnp.concatenate([xnorm, ynorm], axis=-1)


def view_synthesis_generic(ref_image, depth, ray_surface, ref_ray_surface,
                           pose, progress=0.0, padding_mode='zeros',
                           patch_radius=20):
    """Warp via ray-surface reconstruct/project (``camera_utils.py:65-97``)."""
    from mindtheedge_tpu.geometry.camera import grid_sample
    world_points = reconstruct_generic(depth, ray_surface, frame='c')
    world_points = transform_points(pose, world_points)
    coords = project_generic(world_points, ref_ray_surface, progress,
                             frame='c', patch_radius=patch_radius)
    return grid_sample(ref_image, coords, padding_mode=padding_mode)
