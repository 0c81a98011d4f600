"""Differentiable pinhole camera + view synthesis (NHWC, functional JAX).

Reference: ``geometry/camera.py`` (reconstruct/project), ``geometry/
camera_utils.py`` (scale_intrinsics with the +0.5 pixel-center convention,
view_synthesis with bilinear grid sampling, zeros padding, align_corners=True).
"""

import jax.numpy as jnp

from mindtheedge_tpu.geometry.pose import identity_pose, invert_pose, transform_points


def scale_intrinsics(K, x_scale, y_scale):
    """Scale [B,3,3] intrinsics (``camera_utils.py:17-23``)."""
    K = K.at[..., 0, 0].multiply(x_scale)
    K = K.at[..., 1, 1].multiply(y_scale)
    K = K.at[..., 0, 2].set((K[..., 0, 2] + 0.5) * x_scale - 0.5)
    K = K.at[..., 1, 2].set((K[..., 1, 2] + 0.5) * y_scale - 0.5)
    return K


def invert_intrinsics(K):
    """Closed-form pinhole K^-1 (``camera.py:73-81``)."""
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    Kinv = K
    Kinv = Kinv.at[:, 0, 0].set(1.0 / fx)
    Kinv = Kinv.at[:, 1, 1].set(1.0 / fy)
    Kinv = Kinv.at[:, 0, 2].set(-cx / fx)
    Kinv = Kinv.at[:, 1, 2].set(-cy / fy)
    return Kinv


def image_grid(b, h, w, dtype=jnp.float32):
    """Homogeneous pixel grid [B,H,W,3] with (x, y, 1) per pixel."""
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=-1)
    return jnp.tile(grid[None], (b, 1, 1, 1))


def reconstruct(depth, K, Tcw=None, frame='w'):
    """Depth [B,H,W,1] -> 3D points [B,H,W,3] (``camera.py:113-149``).

    ``Tcw`` is the camera->world pose [B,4,4]; world frame applies its inverse
    (Twc) as in the reference.
    """
    b, h, w, _ = depth.shape
    grid = image_grid(b, h, w, depth.dtype)
    Kinv = invert_intrinsics(K.astype(depth.dtype))
    rays = jnp.einsum('bij,bhwj->bhwi', Kinv, grid)
    Xc = rays * depth
    if frame == 'c':
        return Xc
    Tcw = identity_pose(b, depth.dtype) if Tcw is None else Tcw
    return transform_points(invert_pose(Tcw), Xc)


def project(X, K, Tcw=None, frame='w'):
    """3D points [B,H,W,3] -> normalized grid coords [B,H,W,2] in [-1,1].

    Reference ``camera.py:151-192``; normalization uses (W-1)/(H-1), matching
    torch grid_sample align_corners=True.
    """
    b, h, w, _ = X.shape
    if frame == 'w' and Tcw is not None:
        X = transform_points(Tcw, X)
    Xc = jnp.einsum('bij,bhwj->bhwi', K.astype(X.dtype), X)
    Z = jnp.clip(Xc[..., 2], 1e-5, None)
    Xn = 2 * (Xc[..., 0] / Z) / (w - 1) - 1.0
    Yn = 2 * (Xc[..., 1] / Z) / (h - 1) - 1.0
    return jnp.stack([Xn, Yn], axis=-1)


def grid_sample(image, coords, padding_mode='zeros'):
    """Bilinear grid sampling, align_corners=True, on [B,H,W,C].

    ``coords``: [B,H',W',2] normalized to [-1,1] ((x, y) order, torch
    convention).  Matches ``torch.nn.functional.grid_sample(mode='bilinear',
    align_corners=True)`` with 'zeros' or 'border' padding.
    """
    b, h, w, c = image.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx, wy = x - x0, y - y0

    def gather(yy, xx):
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat = image.reshape(b, h * w, c)
        idx = (yc * w + xc).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(b, *yy.shape[1:], c)
        if padding_mode == 'zeros':
            inside = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
            vals = vals * inside[..., None].astype(vals.dtype)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def view_synthesis(ref_image, depth, ref_K, K, pose, padding_mode='zeros'):
    """Warp ``ref_image`` into the original frame (``camera_utils.py:28-60``).

    ``pose``: original->reference transform [B,4,4] (the reference passes it
    as the ref camera's Tcw).
    """
    world_points = reconstruct(depth, K, Tcw=None, frame='w')
    ref_coords = project(world_points, ref_K, Tcw=pose, frame='w')
    return grid_sample(ref_image, ref_coords, padding_mode=padding_mode)
