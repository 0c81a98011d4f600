"""cli/infer_edges.py wire formats: the byte-lean serving path (sparse u16
lidar uplink + u16 depth downlink) matches the lossless f32 path to within
the documented 1/512 m downlink quantization — and is bit-exact on the
lidar input itself for KITTI-format u16/256 png lidar."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _write_fixtures(tmp_path, h, w, n):
    import cv2
    rng = np.random.RandomState(0)
    rgb_dir = tmp_path / 'rgb'
    lidar_dir = tmp_path / 'lidar'
    rgb_dir.mkdir()
    lidar_dir.mkdir()
    lines = []
    for i in range(n):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        rp = str(rgb_dir / f'{i:06d}.png')
        cv2.imwrite(rp, img)
        # KITTI-convention u16/256 sparse depth png, ~5% density
        d = (rng.rand(h, w) * 80.0 * 256.0).astype(np.uint16)
        d[rng.rand(h, w) < 0.95] = 0
        lp = str(lidar_dir / f'{i:06d}.png')
        cv2.imwrite(lp, d)
        lines.append(f'{rp} None None {lp} None None None None\n')
    split = tmp_path / 'split.txt'
    split.write_text(''.join(lines))
    return split


def test_infer_cli_u16_wire_matches_f32(tmp_path):
    import yaml

    h, w, n = 128, 96, 2
    split = _write_fixtures(tmp_path, h, w, n)
    cfg = {
        'model': {
            'name': 'SemiSupEdgeModel',
            'depth_net': {'name': 'PackNetSAN01', 'version': '1A'},
            'params': {'crop': '', 'min_depth': 0.0, 'max_depth': 80.0},
        },
        'datasets': {
            'augmentation': {'image_shape': (h, w)},
            'test': {'dataset': ['GTA'], 'path': [''],
                     'split': [str(split)],
                     'input_depth_type': ['lidar'],
                     'depth_type': ['groundtruth']},
        },
        'save': {'folder': ''},
        'checkpoint': {'filepath': str(tmp_path / 'missing.ckpt')},
        'analysis': {'run_metrics': False, 'run_heavy_edge_metrics': False},
    }

    from mindtheedge_tpu.cli.infer_edges import main

    outs = {}
    for mode in ('u16', 'f32'):
        cfg['save']['folder'] = str(tmp_path / f'out_{mode}')
        run_cfg = tmp_path / f'cfg_{mode}.yaml'
        run_cfg.write_text(yaml.safe_dump(cfg))
        main(['--config', str(run_cfg), '--batch', '2', '--wire', mode])
        outs[mode] = sorted((tmp_path / f'out_{mode}').glob('*_regular.npy'))
        assert len(outs[mode]) == n

    for a, b in zip(outs['u16'], outs['f32']):
        da, db = np.load(a), np.load(b)
        assert da.shape == (h, w)
        # sparse-u16 lidar uplink is bit-exact for png lidar, so the ONLY
        # divergence is the u16 depth downlink quantization: half a step
        assert np.abs(da - db).max() <= 0.5 / 256.0 + 1e-6
        # and the u16 artifact is exactly the quantization of the f32 one
        np.testing.assert_array_equal(
            da, np.round(np.clip(db * 256.0, 0, 65535)).astype(np.float32) / 256.0)
