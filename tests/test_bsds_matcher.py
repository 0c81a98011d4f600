import numpy as np
import pytest

from mindtheedge_tpu.evaluation import bsds_matcher as bm


def random_map(rng, h=60, w=80, density=0.05):
    return (rng.rand(h, w) < density).astype(np.uint8)


def test_identical_maps_fully_match():
    rng = np.random.RandomState(0)
    m = random_map(rng)
    match1, match2, n, _ = bm.correspond_pixels(m, m, max_dist=0.002)
    assert n == m.sum()
    np.testing.assert_array_equal(match1.astype(bool), m.astype(bool))
    np.testing.assert_array_equal(match2.astype(bool), m.astype(bool))


def test_disjoint_maps_no_match():
    h, w = 40, 200
    pred = np.zeros((h, w), np.uint8)
    gt = np.zeros((h, w), np.uint8)
    pred[5, 10] = 1
    gt[35, 190] = 1
    match1, match2, n, _ = bm.correspond_pixels(pred, gt, max_dist=0.002)
    assert n == 0
    assert match1.sum() == 0 and match2.sum() == 0


def test_within_tolerance_matches():
    h, w = 300, 400   # diag = 500; max_dist=0.01 -> r = 5 px
    pred = np.zeros((h, w), np.uint8)
    gt = np.zeros((h, w), np.uint8)
    pred[100, 100] = 1
    gt[103, 100] = 1        # 3 px away < 5
    _, _, n, _ = bm.correspond_pixels(pred, gt, max_dist=0.01)
    assert n == 1
    gt2 = np.zeros((h, w), np.uint8)
    gt2[106, 100] = 1       # 6 px away > 5
    _, _, n2, _ = bm.correspond_pixels(pred, gt2, max_dist=0.01)
    assert n2 == 0


def test_native_matches_scipy_counts():
    if bm._get_lib() is None:
        pytest.skip('no native matcher')
    rng = np.random.RandomState(3)
    for _ in range(5):
        pred, gt = random_map(rng, density=0.08), random_map(rng, density=0.08)
        m1n, m2n, nn, _ = bm.correspond_pixels(pred, gt, max_dist=0.01)
        m1s, m2s, ns, _ = bm._correspond_pixels_scipy(pred, gt, 0.01)
        # max-cardinality counts agree even if the matching differs
        assert nn == ns
        assert m1n.sum() == m1s.sum() and m2n.sum() == m2s.sum()


def _min_cost_match_count(pred, gt, max_dist):
    """Independent oracle: min-cost assignment with outlier option, via
    scipy.optimize.linear_sum_assignment.  With unit match cost and an
    outlier fallback, the minimum-cost solution maximizes the number of
    within-radius matches, so its match COUNT equals the max-cardinality
    matching the BSDS ``correspond_pixels`` computes."""
    from scipy.optimize import linear_sum_assignment
    h, w = pred.shape
    r = max_dist * np.hypot(h, w)
    py, px = np.nonzero(pred)
    gy, gx = np.nonzero(gt)
    if len(py) == 0 or len(gy) == 0:
        return 0
    d2 = (py[:, None] - gy[None, :]) ** 2 + (px[:, None] - gx[None, :]) ** 2
    adj = d2 <= r * r
    cost = 1.0 - adj.astype(np.float64)   # 0 if matchable, 1 (outlier) if not
    ri, ci = linear_sum_assignment(cost)
    return int(adj[ri, ci].sum())


def test_match_counts_vs_min_cost_assignment_random():
    rng = np.random.RandomState(11)
    for density in (0.03, 0.08, 0.15):
        pred, gt = random_map(rng, 40, 50, density), random_map(rng, 40, 50, density)
        _, _, n, _ = bm.correspond_pixels(pred, gt, max_dist=0.01)
        assert int(n) == _min_cost_match_count(pred, gt, 0.01)


def test_match_counts_vs_min_cost_assignment_fixture():
    """Real KITTI-DE GT edge maps (cropped windows) through both matchers."""
    import os
    import cv2
    gt_dir = '/root/reference/data/kitti_de/gt'
    if not os.path.isdir(gt_dir):
        pytest.skip('KITTI-DE fixtures not mounted')
    files = sorted(os.listdir(gt_dir))[:2]
    maps = [(cv2.imread(os.path.join(gt_dir, f))[:, :, 0] > 127).astype(np.uint8)
            for f in files]
    pred = maps[0][150:230, 300:500]
    gt = maps[1][150:230, 300:500]
    assert pred.sum() > 0 and gt.sum() > 0
    _, _, n, _ = bm.correspond_pixels(pred, gt, max_dist=0.002)
    assert int(n) == _min_cost_match_count(pred, gt, 0.002)
    # and self-match sanity at the protocol tolerance
    _, _, n_self, _ = bm.correspond_pixels(pred, pred, max_dist=0.002)
    assert int(n_self) == int(pred.sum())


def test_binary_thin_reduces_to_lines():
    if bm._get_lib() is None:
        pytest.skip('no native matcher')
    img = np.zeros((20, 20), np.uint8)
    img[8:12, 2:18] = 1     # 4-px-thick bar
    thinned = bm.binary_thin(img)
    assert thinned.sum() < img.sum()
    assert thinned.sum() >= 10          # still a line (ZS shortens endpoints)
    # thinning an already-thin line is (nearly) idempotent
    again = bm.binary_thin(thinned)
    assert abs(int(again.sum()) - int(thinned.sum())) <= 2
