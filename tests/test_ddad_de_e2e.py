"""DDAD-DE cross-dataset end-to-end: the shipped ``configs/eval_ddad_de.yaml``
driven through ``cli/infer_edges.py`` against the real DDAD-DE GT edge
annotations (reference ``README.md:73-83``, BASELINE config #5).

The reference dataset ships only the GT edge maps (384x640 uint8 pngs +
coordinate txts) — no RGB — so RGB inputs are synthesized at the GT
resolution; the protocol (depth .npy -> Canny sweep -> BSDS match -> AUC)
only needs predicted depth + GT edges.  Checkpoint absent -> random-init
smoke mode: this validates the full cross-dataset plumbing (native-res
inference, pred_list, AUC vs 384x640 GT with empty gt_crop), not the paper
number.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DDAD_GT = '/root/reference/data/ddad_de/gt'


@pytest.mark.skipif(not os.path.isdir(DDAD_GT), reason='DDAD-DE GT not found')
def test_ddad_de_config_end_to_end(tmp_path):
    import cv2
    import yaml

    gt_files = sorted(f for f in os.listdir(DDAD_GT) if f.endswith('.png'))[:2]
    assert gt_files, 'no DDAD GT edge maps'
    h, w = cv2.imread(os.path.join(DDAD_GT, gt_files[0]), -1).shape[:2]
    assert (h, w) == (384, 640)

    # synthetic RGB at DDAD native res (blocky scene -> strong depth edges)
    rng = np.random.RandomState(0)
    rgb_dir = tmp_path / 'rgb'
    rgb_dir.mkdir()
    lines = []
    for name in gt_files:
        img = np.full((h, w, 3), 90, np.uint8)
        for _ in range(4):
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            img[y0:y0 + rng.randint(40, h // 2),
                x0:x0 + rng.randint(40, w // 2)] = rng.randint(0, 255, 3)
        p = str(rgb_dir / name)
        cv2.imwrite(p, img)
        lines.append(f'{p} None None None None None None None\n')
    split = tmp_path / 'ddad_split.txt'
    split.write_text(''.join(lines))
    gt_list = tmp_path / 'ddad_gt_list.txt'
    gt_list.write_text(''.join(os.path.join(DDAD_GT, n) + '\n'
                               for n in gt_files))

    # derive the run config from the SHIPPED yaml — only paths change
    with open('configs/eval_ddad_de.yaml') as f:
        cfg = yaml.safe_load(f)
    cfg['datasets']['test']['split'] = [str(split)]
    cfg['save']['folder'] = str(tmp_path / 'out')
    cfg['analysis']['edge_image_list'] = str(gt_list)
    run_cfg = tmp_path / 'eval_ddad_de.yaml'
    run_cfg.write_text(yaml.safe_dump(cfg))

    from mindtheedge_tpu.cli.infer_edges import main
    main(['--config', str(run_cfg), '--batch', '1'])

    out = tmp_path / 'out'
    preds = sorted(out.glob('*_regular.npy'))
    assert len(preds) == len(gt_files)
    d = np.load(preds[0])
    assert d.shape == (h, w) and np.isfinite(d).all() and (d > 0).all()

    auc_txt = (out / 'edge_AUC.txt').read_text()
    aucs = [float(ln.rsplit(' ', 1)[1]) for ln in auc_txt.strip().splitlines()]
    assert len(aucs) == 2 and all(np.isfinite(a) and 0 <= a <= 1 for a in aucs)
    assert (out / 'pred_list.txt').exists()
