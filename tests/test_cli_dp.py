"""cli/infer_edges.py --dp: batch-DP sharded serving equals the
single-device run (VERDICT r2 #4).

Per-sample inference programs are independent, so sharding the batch over a
data mesh must not change the artifacts beyond last-ulp float noise: XLA
compiles a DIFFERENT program for sharded inputs (GSPMD partitioning changes
fusion decisions), so true byte-for-byte equality is not achievable across
partitionings — the compare runs on the lossless f32 wire at 1e-5, which
catches any real wiring bug (wrong shard order, dropped samples, halo
mistakes) while tolerating fusion-order ulps.  Drives the real CLI
(random-init smoke mode) — pinning the mesh construction, batch device_put
specs, and wire decode, not just the module math.
"""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 virtual devices')
def test_infer_cli_dp_matches_single_device(tmp_path):
    import cv2
    import yaml

    h, w, n = 64, 96, 4
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
            'depth_net': {'name': 'PackNetSAN01', 'version': '1A',
                          'channels': [16, 16, 16, 16, 16, 16]},
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
    for mode, dp in (('single', '1'), ('dp', '4')):
        cfg['save']['folder'] = str(tmp_path / f'out_{mode}')
        run_cfg = tmp_path / f'cfg_{mode}.yaml'
        run_cfg.write_text(yaml.safe_dump(cfg))
        main(['--config', str(run_cfg), '--batch', '4', '--dp', dp,
              '--wire', 'f32'])
        outs[mode] = sorted((tmp_path / f'out_{mode}').glob('*_regular.npy'))
        assert len(outs[mode]) == n

    for a, b in zip(outs['single'], outs['dp']):
        da, db = np.load(a), np.load(b)
        assert da.shape == (h, w)
        np.testing.assert_allclose(db, da, rtol=1e-5, atol=1e-5)
