import numpy as np
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.ops import edge_ops


def _loop_nms(img):
    """Straightforward per-pixel reference implementation of the documented
    NMS semantics (direction-quantized 8-neighbor compare, >= keeps ties,
    borders zeroed) for parity checking the vectorized op."""
    import cv2
    sx = cv2.Sobel(img, cv2.CV_64F, 1, 0, ksize=5)
    sy = cv2.Sobel(img, cv2.CV_64F, 0, 1, ksize=5)
    angle = np.rad2deg(np.arctan2(sy, sx))
    angle[angle < 0] += 180
    H, W = img.shape
    out = np.zeros((H, W))
    for i in range(1, H - 1):
        for j in range(1, W - 1):
            a = angle[i, j]
            if 22.5 <= a < 67.5:
                q, r = img[i - 1, j - 1], img[i + 1, j + 1]
            elif 67.5 <= a < 112.5:
                q, r = img[i + 1, j], img[i - 1, j]
            elif 112.5 <= a < 157.5:
                q, r = img[i + 1, j - 1], img[i - 1, j + 1]
            else:
                q, r = img[i, j + 1], img[i, j - 1]
            out[i, j] = img[i, j] if (img[i, j] >= q and img[i, j] >= r) else 0.0
    return out


def test_sobel5_matches_cv2():
    import cv2
    rng = np.random.RandomState(0)
    img = rng.rand(40, 56).astype(np.float64)
    ours_x = np.asarray(edge_ops.sobel5_x(jnp.asarray(img)))
    ours_y = np.asarray(edge_ops.sobel5_y(jnp.asarray(img)))
    ref_x = cv2.Sobel(img, cv2.CV_64F, 1, 0, ksize=5)
    ref_y = cv2.Sobel(img, cv2.CV_64F, 0, 1, ksize=5)
    np.testing.assert_allclose(ours_x, ref_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours_y, ref_y, rtol=1e-4, atol=1e-4)


def test_nms_matches_loop_reference():
    rng = np.random.RandomState(1)
    img = rng.rand(24, 32).astype(np.float64)
    ours = np.asarray(edge_ops.non_max_suppression(jnp.asarray(img)))
    ref = _loop_nms(img)
    # angle==bucket-boundary pixels can flip buckets under fp reordering;
    # allow a tiny number of disagreements
    mismatch = np.sum(~np.isclose(ours, ref, atol=1e-5))
    assert mismatch <= 2, f'{mismatch} mismatched pixels'


def test_hysteresis_matches_loop_reference():
    rng = np.random.RandomState(2)
    img = rng.rand(20, 26).astype(np.float64)

    # loop implementation of the documented semantics
    t_low, t_high = 0.3, 0.7
    temp = img.copy()
    H, W = img.shape
    for i in range(1, H - 1):
        for j in range(1, W - 1):
            if img[i, j] > t_high:
                temp[i, j] = 2
            elif img[i, j] < t_low:
                temp[i, j] = 0
            else:
                temp[i, j] = 1
    changed = True
    while changed:
        changed = False
        for i in range(1, H - 1):
            for j in range(1, W - 1):
                if temp[i, j] == 1 and temp[i - 1:i + 2, j - 1:j + 2].max() == 2:
                    temp[i, j] = 2
                    changed = True
    for i in range(1, H - 1):
        for j in range(1, W - 1):
            if temp[i, j] == 1:
                temp[i, j] = 0
    expected = img * (temp / temp.max())

    ours = np.asarray(edge_ops.hysteresis(jnp.asarray(img), t_low, t_high))
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)


def test_normals_angle_encode_decode():
    rng = np.random.RandomState(3)
    img = rng.rand(16, 20).astype(np.float64)
    enc = np.asarray(edge_ops.normals_angle_255(jnp.asarray(img)))
    assert enc.min() >= 0 and enc.max() <= 255
    dec = edge_ops.decode_normal_png(enc)
    assert np.abs(dec).max() <= np.pi + 1e-6


def test_remove_isolated_edges():
    img = np.zeros((10, 10), np.float32)
    img[2, 2] = 1                      # isolated
    img[5, 5] = img[5, 6] = 1          # connected pair
    out = np.asarray(edge_ops.remove_isolated_edges(jnp.asarray(img)))
    assert out[2, 2] == 0
    assert out[5, 5] == 1 and out[5, 6] == 1
