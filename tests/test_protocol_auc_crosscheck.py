"""Protocol-level AUC cross-check WITHOUT a checkpoint (VERDICT r2 #6).

The reference's own ``eval_depth_edges.py`` is importable; its missing C++
``bsds_metric`` dependency is injected from this repo's (oracle-verified)
matcher via a ``sys.modules`` shim.  Both PR pipelines — the reference
``pr_evaluation`` and ``evaluation/edge_auc`` — then run on IDENTICAL
synthetic depth predictions + the checked-in KITTI-DE GT.  Equal PR vectors
isolate any transcription error in the threshold sweep / crop / JPEG
round-trip / Canny-from-depth / interpolation — every protocol stage except
the already-cross-checked matcher itself.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF_ROOT = '/root/reference'
GT_DIR = os.path.join(REF_ROOT, 'data', 'kitti_de', 'gt')


def _import_reference_eval():
    """Import the reference eval_depth_edges with our matcher shimmed in."""
    from mindtheedge_tpu.evaluation import bsds_matcher

    thin_mod = types.ModuleType('bsds_metric.bsds.thin')
    thin_mod.binary_thin = bsds_matcher.binary_thin
    cp_mod = types.ModuleType('bsds_metric.bsds.correspond_pixels')
    cp_mod.correspond_pixels = bsds_matcher.correspond_pixels
    bsds_mod = types.ModuleType('bsds_metric.bsds')
    bsds_mod.thin = thin_mod
    bsds_mod.correspond_pixels = cp_mod
    pkg = types.ModuleType('bsds_metric')
    pkg.bsds = bsds_mod
    sys.modules.update({
        'bsds_metric': pkg,
        'bsds_metric.bsds': bsds_mod,
        'bsds_metric.bsds.thin': thin_mod,
        'bsds_metric.bsds.correspond_pixels': cp_mod,
    })
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)   # for `from edge import edge_from_depth`
    import eval_depth_edges as ref_eval
    return ref_eval


@pytest.mark.skipif(not os.path.isdir(GT_DIR), reason='KITTI-DE GT absent')
def test_reference_pr_pipeline_matches_ours(tmp_path):
    import cv2
    ref_eval = _import_reference_eval()
    from mindtheedge_tpu.evaluation import edge_auc as ours

    gt_paths = sorted(os.path.join(GT_DIR, f) for f in os.listdir(GT_DIR)
                      if f.endswith('.png'))[:3]
    assert len(gt_paths) == 3

    # synthetic blocky depth at each GT's resolution -> sharp Canny edges
    rng = np.random.RandomState(0)
    pred_paths = []
    for i, gp in enumerate(gt_paths):
        gt_im = cv2.imread(gp)[:, :, 0]
        h, w = gt_im.shape
        depth = np.full((h, w), 40.0, np.float32)
        for _ in range(12):
            y0, x0 = rng.randint(0, h - 32), rng.randint(0, w - 64)
            hh, ww = rng.randint(16, h // 2), rng.randint(32, w // 2)
            depth[y0:y0 + hh, x0:x0 + ww] = rng.uniform(2, 75)
        depth += rng.randn(h, w).astype(np.float32) * 0.5
        p = str(tmp_path / f'pred_{i:03d}.npy')
        np.save(p, depth)
        pred_paths.append(p)

    thresholds = [20, 60, 120, 200]

    prec_ref, rec_ref = ref_eval.pr_evaluation(
        list(gt_paths), list(pred_paths), edge_thresh_range=thresholds,
        save_folder=str(tmp_path / 'ref_out'), num_workers=2)

    prec_ours, rec_ours = ours.pr_evaluation(
        list(gt_paths), list(pred_paths), edge_thresh_range=thresholds,
        save_folder=str(tmp_path / 'ours_out'), num_workers=2)

    np.testing.assert_allclose(prec_ours, prec_ref, rtol=0, atol=1e-12)
    np.testing.assert_allclose(rec_ours, rec_ref, rtol=0, atol=1e-12)

    # AUC reduction parity too (eval_depth_edges.py:365-375)
    pr = np.vstack((prec_ref, rec_ref)).T
    auc_ref = ref_eval.mean_recall_at_precision_range(pr, 0.12, 0.65)
    auc_ours = ours.mean_recall_at_precision_range(pr, 0.12, 0.65)
    assert auc_ours == pytest.approx(float(auc_ref), abs=1e-12)
