"""Depth metric analyzer (reference root ``eval_depth.py``).

Per-frame metrics (mean/std rel err, abs_rel, accuracy@1.1/1.25, median scale
factor) with min/max-depth + crop masking, pickle + CSV outputs.
"""

import os
import pickle

import numpy as np

from mindtheedge_tpu.data.augmentations import resize_depth_preserve
from mindtheedge_tpu.data.readers import read_png_depth, depth_read_bin

EPS = np.finfo(float).eps

COLUMNS = ['frm_idx', 'mean_rel_err', 'std_rel_err', 'abs_rel_err',
           'accuracy_1p1', 'accuracy_1p25', 'median_scale_factor']


def rel_err(d, d_gt):
    m = (d - d_gt) / (d_gt + EPS)
    m[d_gt == -1] = np.nan
    return m


def abs_rel_err(d, d_gt):
    m = np.abs((d - d_gt) / (d_gt + EPS))
    m[d_gt == -1] = np.nan
    return m


def sq_rel_err(d, d_gt):
    m = ((d - d_gt) ** 2) / (d_gt + EPS)
    m[d_gt == -1] = np.nan
    return m


def accuracy(d, d_gt, thresh):
    dev_max = np.maximum(np.abs(d / (d_gt + EPS)), np.abs(d_gt / (d + EPS)))
    out = (dev_max < thresh).astype('float32')
    out[d_gt == -1] = np.nan
    return out


class DepthEvalLoader:
    """Lists of (image, gt, pred) paths (reference ``eval_depth.py:138-220``)."""

    def __init__(self, image_list_path, gt_list_path, depth_pred_list_path):
        read = lambda p: open(p).read().splitlines()
        self.images = read(image_list_path)
        self.gts = read(gt_list_path)
        self.preds = read(depth_pred_list_path)
        assert len(self.images) == len(self.gts) == len(self.preds)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        import cv2
        im = cv2.imread(self.images[i])
        gt_path, pred_path = self.gts[i], self.preds[i]
        if gt_path.endswith('.npy'):
            gt = np.load(gt_path)
        elif gt_path.endswith('.png'):
            gt = read_png_depth(gt_path)
        elif gt_path.endswith('.bin'):
            gt = depth_read_bin(gt_path)
        else:
            raise ValueError('Depth GT must be .png/.npy/.bin')
        if pred_path.endswith('.npy'):
            d = np.load(pred_path)
        elif pred_path.endswith('.txt'):
            d = np.genfromtxt(pred_path, delimiter=',')
        else:
            raise ValueError('Prediction must be .npy or .txt')
        if d.shape != gt.shape:
            gt = resize_depth_preserve(gt, d.shape[:2])[:, :, 0]
        return im, gt, d


class DensePredictionAnalyzer:
    """Per-frame dense depth analyzer (reference ``eval_depth.py:333-413``)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.per_frm_res = []
        self.eval_mask_list = None
        if getattr(cfg, 'eval_mask_image_list', ''):
            with open(cfg.eval_mask_image_list) as f:
                self.eval_mask_list = f.read().splitlines()

    def _mask_gt(self, gt, gt_crop_im=None):
        mask = (gt > self.cfg.min_depth) & (gt < self.cfg.max_depth)
        gt_crop = self.cfg.gt_crop
        if gt_crop_im is None:
            if gt_crop and len(gt_crop) == 4:
                crop_mask = np.zeros(mask.shape)
                crop_mask[int(gt_crop[2]):int(gt_crop[3]),
                          int(gt_crop[0]):int(gt_crop[1])] = 1
            else:
                crop_mask = np.ones(mask.shape)
        else:
            crop_mask = gt_crop_im > 0
        mask = mask & (crop_mask > 0)
        out = gt.copy()
        out[~mask] = -1
        return out

    def eval_frame(self, frm_idx, gt, d, gt_crop_im=None):
        gt = self._mask_gt(gt, gt_crop_im)
        scale_factor = 1.0
        if getattr(self.cfg, 'median_scaling', 'none') not in ('none', '', None):
            valid = gt != -1
            if valid.any():
                scale_factor = float(np.median(gt[valid]) /
                                     max(np.median(d[valid]), EPS))
                d = d * scale_factor
        vals = {
            'abs_rel_err': np.nanmean(abs_rel_err(d, gt)),
            'accuracy_1p1': np.nanmean(accuracy(d, gt, 1.1)),
            'accuracy_1p25': np.nanmean(accuracy(d, gt, 1.25)),
            'median_scale_factor': scale_factor,
            'mean_rel_err': np.nanmean(rel_err(d, gt)),
            'std_rel_err': np.nanstd(rel_err(d, gt)),
        }
        self.per_frm_res.append([frm_idx] + [vals[c] for c in COLUMNS[1:]])
        return {'vals': vals}

    def get_frm_metrics_df(self):
        import pandas as pd
        return pd.DataFrame(self.per_frm_res, columns=COLUMNS)

    def save_results(self, output_dir, out_file_name, verbose=True):
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, out_file_name)
        with open(path, 'wb') as f:
            pickle.dump({'columns': COLUMNS,
                         'per_frm_res': np.array(self.per_frm_res),
                         'analysis_cfg': dict(self.cfg)}, f)
        if verbose:
            print(f'Saved analyzer data to {path}')


def run_analysis(data_loader, analyzer, cfg, verbose=True):
    """Analyze frames and dump a pickle (reference ``eval_depth.py:489-514``)."""
    import cv2
    start = cfg.analysis.start_frm_idx
    end = cfg.analysis.end_frm_idx
    if end == -1:
        end = len(data_loader)
    for i in range(start, end):
        if verbose:
            print('Processing frame:', i)
        _, d_gt, d = data_loader[i]
        mask = None
        if analyzer.eval_mask_list is not None:
            mask = cv2.imread(analyzer.eval_mask_list[i])[:, :, 0]
        analyzer.eval_frame(i, d_gt, d, mask)
    out_name = cfg.analysis.out_file_name
    if isinstance(out_name, (list, tuple)):
        out_name = out_name[0]
    analyzer.save_results(os.path.join(cfg.save.folder, 'sfm_analysis'), out_name)
    return analyzer.get_frm_metrics_df()
