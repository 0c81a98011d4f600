"""cli/infer_edges.py --spatial: H-sharded serving equals the unsharded run.

Drives the real CLI twice on a tiny synthetic split (random-init smoke mode,
metrics off) — once unsharded, once H-sharded over the largest legal mesh —
and compares the written depth .npy artifacts.  This pins the CLI wiring
(task clone, shard_map specs, batch device_put), not just the module math.
"""

import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_infer_cli_spatial_matches_unsharded(tmp_path):
    import cv2
    import yaml

    h, w, n = 128, 96, 2
    rng = np.random.RandomState(0)
    rgb_dir = tmp_path / 'rgb'
    rgb_dir.mkdir()
    lines = []
    for i in range(n):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        p = str(rgb_dir / f'{i:06d}.png')
        cv2.imwrite(p, img)
        lines.append(f'{p} None None None None None None None\n')
    split = tmp_path / 'split.txt'
    split.write_text(''.join(lines))

    cfg = {
        'model': {
            'name': 'SemiSupEdgeModel',
            'depth_net': {'name': 'PackNetSAN01', 'version': '1A'},
            'params': {'crop': '', 'min_depth': 0.0, 'max_depth': 80.0},
        },
        'datasets': {
            'augmentation': {'image_shape': ()},
            'test': {'dataset': ['GTA'], 'path': [''],
                     'split': [str(split)],
                     'input_depth_type': [''], 'depth_type': ['groundtruth']},
        },
        'save': {'folder': ''},
        'checkpoint': {'filepath': str(tmp_path / 'missing.ckpt')},
        'analysis': {'run_metrics': False, 'run_heavy_edge_metrics': False},
    }

    from mindtheedge_tpu.cli.infer_edges import main

    outs = {}
    for mode, flag in (('plain', '0'), ('spatial', '-1')):
        cfg['save']['folder'] = str(tmp_path / f'out_{mode}')
        run_cfg = tmp_path / f'cfg_{mode}.yaml'
        run_cfg.write_text(yaml.safe_dump(cfg))
        # --wire f32: this test pins spatial-vs-plain MATH parity; the u16
        # wire rounds to 1/256 m and a last-ulp float diff at a rounding
        # boundary flips a full step, swamping the rtol compare
        main(['--config', str(run_cfg), '--batch', '1', '--spatial', flag,
              '--wire', 'f32'])
        outs[mode] = sorted((tmp_path / f'out_{mode}').glob('*_regular.npy'))
        assert len(outs[mode]) == n

    for a, b in zip(outs['plain'], outs['spatial']):
        da, db = np.load(a), np.load(b)
        assert da.shape == (h, w)
        np.testing.assert_allclose(db, da, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_infer_cli_spatial_hw_grid_matches_unsharded(tmp_path):
    """--spatial 2x2 (2-D HxW grid) through the real CLI == unsharded."""
    import cv2
    import yaml

    h, w, n = 64, 128, 2
    rng = np.random.RandomState(1)
    rgb_dir = tmp_path / 'rgb'
    rgb_dir.mkdir()
    lines = []
    for i in range(n):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        p = str(rgb_dir / f'{i:06d}.png')
        cv2.imwrite(p, img)
        lines.append(f'{p} None None None None None None None\n')
    split = tmp_path / 'split.txt'
    split.write_text(''.join(lines))

    cfg = {
        'model': {
            'name': 'SemiSupEdgeModel',
            'depth_net': {'name': 'PackNetSAN01', 'version': '1A'},
            'params': {'crop': '', 'min_depth': 0.0, 'max_depth': 80.0},
        },
        'datasets': {
            'augmentation': {'image_shape': ()},
            'test': {'dataset': ['GTA'], 'path': [''],
                     'split': [str(split)],
                     'input_depth_type': [''], 'depth_type': ['groundtruth']},
        },
        'save': {'folder': ''},
        'checkpoint': {'filepath': str(tmp_path / 'missing.ckpt')},
        'analysis': {'run_metrics': False, 'run_heavy_edge_metrics': False},
    }

    from mindtheedge_tpu.cli.infer_edges import main

    outs = {}
    for mode, flag in (('plain', '0'), ('hw', '2x2')):
        cfg['save']['folder'] = str(tmp_path / f'out_{mode}')
        run_cfg = tmp_path / f'cfg_{mode}.yaml'
        run_cfg.write_text(yaml.safe_dump(cfg))
        main(['--config', str(run_cfg), '--batch', '1', '--spatial', flag,
              '--wire', 'f32'])
        outs[mode] = sorted((tmp_path / f'out_{mode}').glob('*_regular.npy'))
        assert len(outs[mode]) == n

    for a, b in zip(outs['plain'], outs['hw']):
        da, db = np.load(a), np.load(b)
        assert da.shape == (h, w)
        np.testing.assert_allclose(db, da, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_infer_cli_spatial_illegal_grid_errors(tmp_path):
    """An illegal --spatial NxM exits with the legal-grid message."""
    import cv2
    import yaml

    rng = np.random.RandomState(2)
    p = str(tmp_path / 'x.png')
    cv2.imwrite(p, rng.randint(0, 255, (64, 96, 3), dtype=np.uint8))
    split = tmp_path / 'split.txt'
    split.write_text(f'{p} None None None None None None None\n')
    cfg = {
        'model': {'name': 'SemiSupEdgeModel',
                  'depth_net': {'name': 'PackNetSAN01', 'version': '1A'},
                  'params': {'crop': '', 'min_depth': 0.0, 'max_depth': 80.0}},
        'datasets': {'augmentation': {'image_shape': ()},
                     'test': {'dataset': ['GTA'], 'path': [''],
                              'split': [str(split)],
                              'input_depth_type': [''],
                              'depth_type': ['groundtruth']}},
        'save': {'folder': str(tmp_path / 'out')},
        'checkpoint': {'filepath': str(tmp_path / 'missing.ckpt')},
        'analysis': {'run_metrics': False, 'run_heavy_edge_metrics': False},
    }
    run_cfg = tmp_path / 'cfg.yaml'
    run_cfg.write_text(yaml.safe_dump(cfg))
    from mindtheedge_tpu.cli.infer_edges import main
    with pytest.raises(SystemExit, match='Legal grids'):
        # W=96 is not divisible by 32 after one shard -> 2x2 illegal at 64x96
        main(['--config', str(run_cfg), '--batch', '1', '--spatial', '2x2'])
