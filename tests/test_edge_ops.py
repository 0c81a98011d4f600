"""Edge-op parity vs the ACTUAL reference implementation.

These tests import ``packnet_code.packnet_sfm.utils.tools`` from
/root/reference (pure numpy+cv2 — no torch/Minkowski needed) and compare the
vectorized in-graph ops against it directly, so a transcription error shared
by op and a test-local re-implementation cannot hide (VERDICT r1 weak #3).
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.ops import edge_ops

REFERENCE = '/root/reference'


@pytest.fixture(scope='module')
def ref_tools():
    if not os.path.isdir(REFERENCE):
        pytest.skip('reference repo not mounted')
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib
    return importlib.import_module('packnet_code.packnet_sfm.utils.tools')


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


def test_nms_matches_reference(ref_tools):
    rng = np.random.RandomState(1)
    img = rng.rand(24, 32).astype(np.float64)
    ours = np.asarray(edge_ops.non_max_suppression(jnp.asarray(img)))
    ref = ref_tools.non_max_suppression(img)
    # angle==bucket-boundary pixels can flip buckets under fp reordering;
    # allow a tiny number of disagreements
    mismatch = np.sum(~np.isclose(ours, ref, atol=1e-5))
    assert mismatch <= 2, f'{mismatch} mismatched pixels'


def test_nms_matches_reference_edge_like(ref_tools):
    """Sparse edge-probability-like input (mostly zeros + a few ridges)."""
    rng = np.random.RandomState(7)
    img = np.zeros((32, 48))
    img[10, 5:40] = rng.rand(35) * 0.5 + 0.5          # horizontal ridge
    img[5:28, 20] = rng.rand(23) * 0.5 + 0.5          # vertical ridge
    ii = np.arange(25)
    img[ii + 3, ii + 15] = 0.9                        # diagonal
    img += rng.rand(32, 48) * 1e-3
    ours = np.asarray(edge_ops.non_max_suppression(jnp.asarray(img)))
    ref = ref_tools.non_max_suppression(img)
    mismatch = np.sum(~np.isclose(ours, ref, atol=1e-5))
    assert mismatch <= 3, f'{mismatch} mismatched pixels'


def test_hysteresis_matches_reference(ref_tools):
    rng = np.random.RandomState(2)
    img = rng.rand(20, 26).astype(np.float64)
    expected = ref_tools.hysteresis(img.copy(), 0.3, 0.7)
    ours = np.asarray(edge_ops.hysteresis(jnp.asarray(img), 0.3, 0.7))
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)


def test_hysteresis_long_snake_chain(ref_tools):
    """A weak chain much longer than the old 512-iteration cap must fully
    propagate (cap removed; fixpoint like the reference DFS)."""
    H, W = 20, 64                           # boustrophedon path len ~ 1100
    img = np.full((H, W), 0.01)
    path = []
    for r in range(1, H - 1):
        cols = range(1, W - 1) if r % 2 else range(W - 2, 0, -1)
        path.extend((r, c) for c in cols)
    for (r, c) in path:
        img[r, c] = 0.5                     # intermediate strip
    r0, c0 = path[0]
    img[r0, c0] = 0.9                       # single strong seed at one end
    expected = ref_tools.hysteresis(img.copy(), 0.3, 0.7)
    ours = np.asarray(edge_ops.hysteresis(jnp.asarray(img), 0.3, 0.7))
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)
    # and the chain really did propagate to the far end
    rl, cl = path[-1]
    assert ours[rl, cl] > 0


def test_remove_isolated_edges_matches_reference(ref_tools):
    rng = np.random.RandomState(4)
    img = (rng.rand(30, 40) > 0.8).astype(np.float32)
    expected = ref_tools.remove_isolated_edges(img.copy())
    ours = np.asarray(edge_ops.remove_isolated_edges(jnp.asarray(img)))
    np.testing.assert_allclose(ours, expected)


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
