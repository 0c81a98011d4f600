"""Pallas NMS kernel tests.

The exact-parity check vs the XLA implementation ran on real TPU hardware
(99.9% pixel agreement at 8x384x1280; disagreements are fp boundary ties).
On CPU the public wrapper must fall back to the XLA path transparently.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.ops.edge_ops import non_max_suppression
from mindtheedge_tpu.ops.pallas.nms_kernel import (
    non_max_suppression_fast, non_max_suppression_pallas)


def test_fast_wrapper_falls_back_on_cpu():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 48, 64).astype(np.float32))
    a = np.asarray(non_max_suppression(img))
    b = np.asarray(non_max_suppression_fast(img))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != 'tpu', reason='TPU-only kernel')
def test_pallas_kernel_matches_xla_on_tpu():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(2, 128, 256).astype(np.float32))
    a = np.asarray(jax.jit(non_max_suppression)(img))
    b = np.asarray(non_max_suppression_pallas(img))
    agree = np.isclose(a, b, atol=1e-4).mean()
    assert agree > 0.998


@pytest.mark.skipif(jax.default_backend() != 'tpu', reason='TPU-only kernel')
def test_pallas_kernel_full_res_exact():
    """Exact agreement at the production resolution (384x1280).

    History: the two paths diverged on up to 2% of pixels.  Diagnosis
    (2026-08, on TPU) showed the cause was NOT the tan-vs-atan2 bucket
    formulas — it was the XLA path's Sobel conv running on the MXU at
    default precision, which truncates inputs to bf16 and shifts gradient
    responses enough to flip direction buckets.  With
    ``Precision.HIGHEST`` on the Sobel convs (edge_ops.conv2_single — the
    parity-correct choice: the reference computes in cv2 CV_64F) the Pallas
    kernel and the XLA path agree EXACTLY on both uniform noise and smooth
    depth-like inputs.  Regression-pinned here.
    """
    rng = np.random.RandomState(2)
    noise = jnp.asarray(rng.rand(1, 384, 1280).astype(np.float32))
    import cv2
    smooth = cv2.GaussianBlur(np.asarray(noise[0]), (31, 31), 8.0)
    smooth = jnp.asarray(smooth[None] * 4.0)
    for img in (noise, smooth):
        a = np.asarray(jax.jit(non_max_suppression)(img))
        b = np.asarray(non_max_suppression_pallas(img))
        mismatched = (~np.isclose(a, b, atol=1e-4)).mean()
        assert mismatched == 0.0, f'{mismatched:.2e} pixels diverge'
