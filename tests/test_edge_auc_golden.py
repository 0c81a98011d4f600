"""Golden edge-AUC regression on the checked-in KITTI-DE ground truth.

Deterministic synthetic depth predictions (ramp + per-column-magnitude steps
on the GT edges + sparse false positives) are pushed through the FULL AUC
protocol — resize, clip [0,80], x255/80 uint8, Canny sweep 20..240, JPEG
round-trip, crop [44,1197,153,371], max-cardinality matching at
max_dist=0.002, mean-recall interpolation — and the resulting AUC numbers are
pinned.  Any drift in the matcher, the Canny-from-depth path, or the PR
interpolation becomes a test failure (VERDICT r1 missing #5).

Reference protocol: ``eval_depth_edges.py:232-348,365-375``.
"""

import os
import tempfile

import numpy as np
import pytest

GT_DIR = '/root/reference/data/kitti_de/gt'

pytestmark = pytest.mark.skipif(not os.path.isdir(GT_DIR),
                                reason='KITTI-DE fixtures not mounted')

# pinned on 2026-08-16 (cv2 in-image); tolerance covers fp reordering only
GOLDEN_FULL = 0.744238
GOLDEN_PARTIAL = 0.852772
GOLDEN_RECALL_FIRST = 0.9908     # threshold 20
GOLDEN_RECALL_LAST = 0.4954      # threshold 240


def _make_synthetic_preds(gt_list, tmp):
    import cv2
    pred_list = []
    for i, gp in enumerate(gt_list):
        gt = (cv2.imread(gp)[:, :, 0] > 127).astype(np.float64)
        h, w = gt.shape
        yy, xx = np.mgrid[0:h, 0:w]
        depth = 5.0 + 40.0 * yy / h + 10.0 * xx / w
        dil = cv2.dilate(gt.astype(np.uint8),
                         np.ones((3, 3), np.uint8)).astype(np.float64)
        # step magnitude ramps 1..25 m across columns so different Canny
        # thresholds recover different subsets of the GT edges
        mag = 1.0 + 24.0 * xx / w
        depth = depth + mag * dil
        # deterministic false positives on a sparse grid (lowers precision)
        fp = ((yy % 37 == 0) & (xx % 23 == 0)).astype(np.uint8)
        fp = cv2.dilate(fp, np.ones((2, 2), np.uint8)).astype(np.float64)
        depth = depth + 12.0 * fp * (1.0 - dil)
        p = os.path.join(tmp, f'{i:08d}_regular.npy')
        np.save(p, depth)
        pred_list.append(p)
    return pred_list


def test_golden_auc_regression():
    from mindtheedge_tpu.evaluation.edge_auc import edge_auc
    gt_list = [os.path.join(GT_DIR, f) for f in sorted(os.listdir(GT_DIR))[:3]]
    with tempfile.TemporaryDirectory() as tmp:
        pred_list = _make_synthetic_preds(gt_list, tmp)
        res = edge_auc(gt_list, pred_list, prec_range=(0.12, 0.65),
                       gt_crop=(44, 1197, 153, 371),
                       min_depth=0.0, max_depth=80.0,
                       save_folder=os.path.join(tmp, 't'), num_workers=1)
    assert res['auc_full'] == pytest.approx(GOLDEN_FULL, abs=1e-3)
    assert res['auc_partial'] == pytest.approx(GOLDEN_PARTIAL, abs=1e-3)
    assert res['recall'][0] == pytest.approx(GOLDEN_RECALL_FIRST, abs=1e-3)
    assert res['recall'][-1] == pytest.approx(GOLDEN_RECALL_LAST, abs=1e-3)
    # the sweep must be threshold-sensitive (guards a degenerate pipeline)
    assert res['recall'][0] - res['recall'][-1] > 0.3


def test_eval_depth_edges_cli_main(tmp_path, capsys):
    """The standalone CLI (reference root ``eval_depth_edges.py:377-416``):
    list plumbing + pr_evaluation + both AUC prints, on 2 KITTI-DE frames."""
    from mindtheedge_tpu.cli.eval_depth_edges import main

    gt_names = sorted(os.listdir(GT_DIR))[:2]
    pred_dir = tmp_path / 'preds'
    pred_dir.mkdir()
    pred_list = _make_synthetic_preds(
        [os.path.join(GT_DIR, n) for n in gt_names], str(pred_dir))
    (tmp_path / 'pred_list.txt').write_text(
        '\n'.join(os.path.basename(p) for p in pred_list) + '\n')
    (tmp_path / 'gt_list.txt').write_text('\n'.join(gt_names) + '\n')

    main(['--depth_pred_list_path', str(tmp_path / 'pred_list.txt'),
          '--depth_pred_dir_path', str(pred_dir),
          '--depth_edge_gt_list_path', str(tmp_path / 'gt_list.txt'),
          '--depth_edge_gt_dir_path', GT_DIR,
          '--temp_save_path', str(tmp_path / 'tmp_out'),
          '--num_workers', '2'])
    out = capsys.readouterr().out
    full = float(out.split('AUC over all range: ')[1].split('\n')[0])
    partial = float(out.split('AUC over partial range: ')[1].split('\n')[0])
    assert 0.0 < full < 1.0 and 0.0 < partial <= 1.0
    assert partial >= full - 1e-9   # partial range can only raise mean recall
