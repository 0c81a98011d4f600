"""cli/infer_edge_estimation.py end-to-end: the DEE pseudo-label annotation
pipeline (reference root ``infer_edge_estimation.py``) driven through its
real main() on a tiny synthetic split in random-init smoke mode.

Pins the artifact contract the training pipeline consumes
(``infer_edge_estimation.py:108-117,186-259``): per-scale edge PNG+NPY,
normal-angle PNGs, and the 8-column ``rgb_lidar_edges_split.txt`` whose
format GTADataset parses (``gta_dataset.py:184-211``).
"""

import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow


def test_annotation_cli_writes_reference_artifacts(tmp_path):
    import cv2
    import yaml

    h, w, n = 64, 96, 2
    rng = np.random.RandomState(0)
    rgb_dir = tmp_path / 'rgb'
    lidar_dir = tmp_path / 'lidar'
    rgb_dir.mkdir()
    lidar_dir.mkdir()
    lines = []
    for i in range(n):
        rp = str(rgb_dir / f'{i:06d}.png')
        cv2.imwrite(rp, rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        depth = (rng.rand(h, w) * 60 * (rng.rand(h, w) > 0.9))
        lp = str(lidar_dir / f'{i:06d}.png')
        cv2.imwrite(lp, (depth * 256).astype(np.uint16))
        lines.append(f'{rp} None None {lp} None None None None\n')
    split = tmp_path / 'split.txt'
    split.write_text(''.join(lines))
    out_dir = tmp_path / 'edges'

    cfg = {
        'model': {
            'name': 'EdgeEstimationLIDARModel',
            'depth_net': {'name': 'PackNetSAN01', 'version': '1A'},
            'params': {'crop': '', 'min_depth': 0.0, 'max_depth': 80.0},
        },
        'datasets': {
            'augmentation': {'image_shape': (h, w)},
            'test': {'dataset': ['GTA'], 'path': [''], 'split': [str(split)],
                     'input_depth_type': ['lidar'],
                     'depth_type': ['groundtruth'],
                     'is_infer_lidar': True, 'is_infer_rgb': False,
                     'normals': True},
        },
        'save': {'folder': str(out_dir), 'depth': {'multiscale': True}},
        'checkpoint': {'filepath': str(tmp_path / 'missing.ckpt')},
    }
    run_cfg = tmp_path / 'cfg.yaml'
    run_cfg.write_text(yaml.safe_dump(cfg))

    from mindtheedge_tpu.cli.infer_edge_estimation import main
    main(['--config', str(run_cfg), '--batch', '1'])

    # per-scale edge maps (scale 0 named _000, coarser _001.._003)
    for i in range(n):
        for s in range(4):
            png = out_dir / f'{i:08d}_lidar_{s:03d}.png'
            assert png.exists(), png
            img = cv2.imread(str(png), cv2.IMREAD_UNCHANGED)
            assert img is not None and img.ndim == 2
            assert img.shape == (h >> s, w >> s)
            # hysteresis output is max-normalized grayscale x255
            # (reference infer_edge_estimation.py:253-257), uint8 range
            assert img.dtype == np.uint8
        assert (out_dir / f'{i:08d}_lidar_000.npy').exists()
        npy = np.load(out_dir / f'{i:08d}_lidar_000.npy')
        assert npy.shape == (h, w)
        norm = out_dir / 'normals' / f'{i:08d}_lidar_000.png'
        assert norm.exists()

    # the 8-column split GTADataset consumes
    split_out = out_dir / 'rgb_lidar_edges_split.txt'
    assert split_out.exists()
    rows = [ln.split(' ') for ln in
            split_out.read_text().strip().splitlines()]
    assert len(rows) == n and all(len(r) == 8 for r in rows)
    for i, r in enumerate(rows):
        assert r[0].endswith(f'{i:06d}.png')        # rgb
        assert r[2].endswith(f'{i:08d}_lidar_000.png')   # edge
        assert r[7].endswith(f'{i:08d}_lidar_000.png')   # normal
