"""Self-supervised multi-view photometric loss (SSIM + L1 + smoothness).

Functional re-implementation of ``losses/multiview_photometric_loss.py``:
per-scale warped photometric L1+SSIM with min-reduce automasking, edge-aware
smoothness on mean-normalized inverse depth.
"""

import jax
import jax.numpy as jnp

from mindtheedge_tpu.geometry.camera import scale_intrinsics, view_synthesis
from mindtheedge_tpu.utils.image import match_scales, gradient_x, gradient_y
from mindtheedge_tpu.utils.depth import inv2depth


def _avg_pool3_reflect(x):
    """ReflectionPad(1) + AvgPool2d(3, stride=1) (``multiview_photometric_loss.py:34-38``)."""
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode='reflect')
    s = jax.lax.reduce_window(
        xp, 0., jax.lax.add,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
        padding='VALID')
    return s / 9.0


def ssim(x, y, C1=1e-4, C2=9e-4):
    """SSIM map (``multiview_photometric_loss.py:16-55``), NHWC."""
    mu_x = _avg_pool3_reflect(x)
    mu_y = _avg_pool3_reflect(y)
    mu_xy = mu_x * mu_y
    mu_x2, mu_y2 = mu_x ** 2, mu_y ** 2
    sigma_x = _avg_pool3_reflect(x ** 2) - mu_x2
    sigma_y = _avg_pool3_reflect(y ** 2) - mu_y2
    sigma_xy = _avg_pool3_reflect(x * y) - mu_xy
    v1 = 2 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2
    return ((2 * mu_xy + C1) * v1) / ((mu_x2 + mu_y2 + C1) * v2)


def calc_smoothness(inv_depths, images, num_scales):
    """Edge-aware smoothness terms (reference ``utils/depth.py:166-199``)."""
    norm = [d / jnp.clip(d.mean(axis=(1, 2), keepdims=True), 1e-6, None)
            for d in inv_depths]
    sx, sy = [], []
    for i in range(num_scales):
        dgx, dgy = gradient_x(norm[i]), gradient_y(norm[i])
        igx, igy = gradient_x(images[i]), gradient_y(images[i])
        wx = jnp.exp(-jnp.abs(igx).mean(axis=-1, keepdims=True))
        wy = jnp.exp(-jnp.abs(igy).mean(axis=-1, keepdims=True))
        sx.append(dgx * wx)
        sy.append(dgy * wy)
    return sx, sy


def multiview_photometric_loss(
        image, context, inv_depths, K, ref_K, poses,
        num_scales=4, ssim_loss_weight=0.85, smooth_loss_weight=0.001,
        C1=1e-4, C2=9e-4, photometric_reduce_op='min', clip_loss=0.0,
        padding_mode='zeros', automask_loss=True):
    """Full photometric loss (``multiview_photometric_loss.py:289-346``).

    image: [B,H,W,3]; context: list of [B,H,W,3]; inv_depths: list of
    [B,h,w,1]; poses: list of [B,4,4] original->context transforms.
    """
    n = num_scales
    W = image.shape[2]
    images = match_scales(image, inv_depths, n)
    depths = [inv2depth(inv_depths[i]) for i in range(n)]

    def photo(t_est, img):
        l1 = jnp.abs(t_est - img)
        if ssim_loss_weight > 0:
            s = jnp.clip((1.0 - ssim(t_est, img, C1, C2)) / 2.0, 0.0, 1.0)
            pl = ssim_loss_weight * s.mean(axis=-1, keepdims=True) + \
                (1 - ssim_loss_weight) * l1.mean(axis=-1, keepdims=True)
        else:
            pl = l1
        if clip_loss > 0:
            mean, std = pl.mean(), pl.std()
            pl = jnp.clip(pl, None, mean + clip_loss * std)
        return pl

    photometric_losses = [[] for _ in range(n)]
    for ref_image, pose in zip(context, poses):
        ref_images = match_scales(ref_image, inv_depths, n)
        for i in range(n):
            dw = inv_depths[i].shape[2]
            scale = dw / float(W)
            Ki = scale_intrinsics(K.astype(jnp.float32), scale, scale)
            ref_Ki = scale_intrinsics(ref_K.astype(jnp.float32), scale, scale)
            warped = view_synthesis(ref_images[i], depths[i], ref_Ki, Ki,
                                    pose, padding_mode=padding_mode)
            photometric_losses[i].append(photo(warped, images[i]))
            if automask_loss:
                photometric_losses[i].append(photo(ref_images[i], images[i]))

    def reduce_fn(losses):
        if photometric_reduce_op == 'mean':
            return sum(l.mean() for l in losses) / len(losses)
        if photometric_reduce_op == 'min':
            return jnp.concatenate(losses, axis=-1).min(axis=-1).mean()
        raise NotImplementedError(photometric_reduce_op)

    loss = sum(reduce_fn(photometric_losses[i]) for i in range(n)) / n
    metrics = {'photometric_loss': loss}

    if smooth_loss_weight > 0:
        sx, sy = calc_smoothness(inv_depths, images, n)
        smooth = sum((jnp.abs(sx[i]).mean() + jnp.abs(sy[i]).mean()) / 2 ** i
                     for i in range(n)) / n
        smooth = smooth_loss_weight * smooth
        metrics['smoothness_loss'] = smooth
        loss = loss + smooth

    return loss, metrics
