"""Depth metric analyzer (reference root ``eval_depth.py``): the
``DepthEvalLoader`` + ``DensePredictionAnalyzer`` library and the
``cli/eval_depth.py`` main, driven end-to-end on synthetic data.

Pins the metric semantics: pred == gt gives zero relative errors and
accuracy 1; a known multiplicative bias gives the analytic abs_rel; the
gt_crop mask confines evaluation; median scaling recovers a global scale.
"""

import os

import numpy as np
import pytest


def _write_case(tmp_path, h=40, w=60, n=2, bias=1.0):
    import cv2
    rng = np.random.RandomState(0)
    img_l, gt_l, pred_l = [], [], []
    for i in range(n):
        img = str(tmp_path / f'im{i}.png')
        cv2.imwrite(img, rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        gt = (rng.rand(h, w) * 50 + 1).astype(np.float32)
        gt_p = str(tmp_path / f'gt{i}.npy')
        np.save(gt_p, gt)
        pred_p = str(tmp_path / f'pred{i}.npy')
        np.save(pred_p, (gt * bias).astype(np.float32))
        img_l.append(img)
        gt_l.append(gt_p)
        pred_l.append(pred_p)
    for name, items in (('images.txt', img_l), ('gts.txt', gt_l),
                        ('preds.txt', pred_l)):
        (tmp_path / name).write_text('\n'.join(items) + '\n')
    return h, w


def test_analyzer_exact_pred_is_perfect(tmp_path):
    from mindtheedge_tpu.config.node import ConfigNode
    from mindtheedge_tpu.evaluation.depth_analyzer import (
        DepthEvalLoader, DensePredictionAnalyzer)

    h, w = _write_case(tmp_path)
    loader = DepthEvalLoader(str(tmp_path / 'images.txt'),
                             str(tmp_path / 'gts.txt'),
                             str(tmp_path / 'preds.txt'))
    assert len(loader) == 2
    cfg = ConfigNode({'min_depth': 0.01, 'max_depth': 80.0,
                      'gt_crop': [5, w - 5, 5, h - 5],
                      'median_scaling': 'none',
                      'eval_mask_image_list': ''})
    analyzer = DensePredictionAnalyzer(cfg)
    for i in range(len(loader)):
        _, gt, d = loader[i]
        analyzer.eval_frame(i, gt, d)
    m = analyzer.get_frm_metrics_df().mean()
    assert abs(float(m['abs_rel_err'])) < 1e-6
    assert float(m['accuracy_1p1']) == 1.0


def test_analyzer_known_bias(tmp_path):
    from mindtheedge_tpu.config.node import ConfigNode
    from mindtheedge_tpu.evaluation.depth_analyzer import (
        DepthEvalLoader, DensePredictionAnalyzer)

    h, w = _write_case(tmp_path, bias=1.2)
    loader = DepthEvalLoader(str(tmp_path / 'images.txt'),
                             str(tmp_path / 'gts.txt'),
                             str(tmp_path / 'preds.txt'))
    cfg = ConfigNode({'min_depth': 0.01, 'max_depth': 80.0,
                      'gt_crop': [0, w, 0, h], 'median_scaling': 'none',
                      'eval_mask_image_list': ''})
    analyzer = DensePredictionAnalyzer(cfg)
    for i in range(len(loader)):
        _, gt, d = loader[i]
        analyzer.eval_frame(i, gt, d)
    m = analyzer.get_frm_metrics_df().mean()
    np.testing.assert_allclose(float(m['abs_rel_err']), 0.2, rtol=1e-4)
    assert float(m['accuracy_1p1']) < 0.5      # 20% off > 10% threshold
    assert float(m['accuracy_1p25']) == 1.0    # but within 25%


def test_eval_depth_cli_writes_csv(tmp_path):
    _write_case(tmp_path)
    out = tmp_path / 'analysis'
    from mindtheedge_tpu.cli.eval_depth import main
    main(['--image_list', str(tmp_path / 'images.txt'),
          '--gt_list', str(tmp_path / 'gts.txt'),
          '--pred_list', str(tmp_path / 'preds.txt'),
          '--gt_crop', '5', '55', '5', '35',
          '--out_dir', str(out)])
    assert (out / 'mean_frames_depth_metrics.csv').exists()
    assert (out / 'analyzer_data.pkl').exists()
    import csv
    rows = dict((r[0], r[1]) for r in
                csv.reader(open(out / 'mean_frames_depth_metrics.csv'))
                if len(r) == 2 and r[0])
    assert abs(float(rows['abs_rel_err'])) < 1e-6
