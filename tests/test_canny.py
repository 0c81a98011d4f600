import numpy as np
import jax.numpy as jnp

from mindtheedge_tpu.ops.canny import canny, canny_sweep


def synthetic_depth_image(h=80, w=120):
    """Smooth ramp with two sharp steps — unambiguous edges."""
    img = np.tile(np.linspace(40, 90, w), (h, 1))
    img[20:60, 30:80] += 80
    img[40:70, 90:110] -= 60
    return np.clip(img, 0, 255).astype(np.uint8)


def test_canny_close_to_cv2():
    import cv2
    img = synthetic_depth_image()
    ref = (cv2.Canny(img, 20, 40) > 0).astype(np.float32)
    ours = np.asarray(canny(jnp.asarray(img.astype(np.float32)), 20.0, 40.0))
    # identical step edges; tolerate small NMS tie-break differences
    agree = (ours == ref).mean()
    assert agree > 0.97, f'only {agree:.3f} pixel agreement with cv2'
    # both must actually find the edges
    assert ref.sum() > 50 and ours.sum() > 50


def test_canny_sweep_monotonic():
    img = jnp.asarray(synthetic_depth_image().astype(np.float32))
    maps = np.asarray(canny_sweep(img, list(range(20, 241, 20))))
    assert maps.shape[0] == 12
    counts = maps.reshape(12, -1).sum(axis=1)
    # higher thresholds can only lose edge pixels
    assert (np.diff(counts) <= 1e-6).all()
