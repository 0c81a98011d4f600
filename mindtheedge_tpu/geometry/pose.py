"""Pose utilities (batched [B,4,4] transforms), functional JAX.

Reference: ``geometry/pose.py`` and ``geometry/pose_utils.py``.
"""

import jax.numpy as jnp


def euler2mat(angle):
    """Euler angles [B,3] -> rotation matrix [B,3,3] (R = X @ Y @ Z).

    Reference ``pose_utils.py:9-38``.
    """
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    cosz, sinz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack([cosz, -sinz, zeros,
                      sinz, cosz, zeros,
                      zeros, zeros, ones], axis=1).reshape(-1, 3, 3)
    cosy, siny = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack([cosy, zeros, siny,
                      zeros, ones, zeros,
                      -siny, zeros, cosy], axis=1).reshape(-1, 3, 3)
    cosx, sinx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack([ones, zeros, zeros,
                      zeros, cosx, -sinx,
                      zeros, sinx, cosx], axis=1).reshape(-1, 3, 3)
    return xmat @ ymat @ zmat


def pose_vec2mat(vec, mode='euler'):
    """6-DoF vector [B,6] (tx,ty,tz,rx,ry,rz) -> [B,4,4] transform.

    Reference ``pose_utils.py:42-52`` returns [B,3,4]; we homogenize.
    """
    if mode is None:
        return vec
    trans = vec[:, :3, None]
    rot_mat = euler2mat(vec[:, 3:])
    mat34 = jnp.concatenate([rot_mat, trans], axis=2)
    bottom = jnp.tile(jnp.asarray([[[0., 0., 0., 1.]]], dtype=vec.dtype),
                      (vec.shape[0], 1, 1))
    return jnp.concatenate([mat34, bottom], axis=1)


def invert_pose(T):
    """Invert [B,4,4] rigid transforms (``pose_utils.py:56-61``)."""
    R = T[:, :3, :3]
    t = T[:, :3, 3:]
    Rt = jnp.swapaxes(R, -2, -1)
    tinv = -Rt @ t
    top = jnp.concatenate([Rt, tinv], axis=2)
    bottom = jnp.tile(jnp.asarray([[[0., 0., 0., 1.]]], dtype=T.dtype),
                      (T.shape[0], 1, 1))
    return jnp.concatenate([top, bottom], axis=1)


def identity_pose(batch, dtype=jnp.float32):
    return jnp.tile(jnp.eye(4, dtype=dtype)[None], (batch, 1, 1))


def transform_points(T, points):
    """Apply [B,4,4] to [B,H,W,3] point maps (reference Pose.__matmul__)."""
    b, h, w, _ = points.shape
    p = points.reshape(b, -1, 3)
    p = p @ jnp.swapaxes(T[:, :3, :3], -2, -1) + T[:, :3, 3][:, None, :]
    return p.reshape(b, h, w, 3)
