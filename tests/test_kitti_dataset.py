"""KITTIDataset behavior pinned on a synthetic KITTI-raw tree.

Covers the semantics the reference defines (``datasets/kitti_dataset.py``):
split filtering by depth availability, the KITTI-depth path layout, context
frame selection with strides, calib intrinsics per drive, and the oxts pose
chain — so the loader can be restructured freely without drift.
"""

import os

import numpy as np
import pytest
from PIL import Image

from mindtheedge_tpu.data.kitti_dataset import KITTIDataset

DRIVE = '2011_09_26_drive_0001_sync'
DATE = '2011_09_26'
N_FRAMES = 6


def _write_png16(path, value):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((8, 16), value, np.int32)
    Image.fromarray(arr).save(path)


def _write_rgb(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((8, 16, 3), np.uint8)).save(path)


@pytest.fixture(scope='module')
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti')
    date_dir = root / DATE
    img_dir = date_dir / DRIVE / 'image_02' / 'data'
    oxts_dir = date_dir / DRIVE / 'oxts' / 'data'
    depth_root = root / 'KITTI_depth'

    for i in range(N_FRAMES):
        _write_rgb(str(img_dir / f'{i:010d}.png'))
        os.makedirs(oxts_dir, exist_ok=True)
        # lat lon alt roll pitch yaw + padding to 30 fields
        vals = [49.0 + i * 1e-5, 8.4 + i * 1e-5, 110.0, 0.01, -0.02,
                0.5 + i * 0.01] + [0.0] * 24
        (oxts_dir / f'{i:010d}.txt').write_text(' '.join(map(str, vals)))
        if i != 4:   # frame 4 has no groundtruth depth -> filtered out
            _write_png16(str(depth_root / 'train' / DRIVE / 'proj_depth' /
                             'groundtruth' / 'image_02' / f'{i:010d}.png'),
                         256 * (i + 1))
        _write_png16(str(depth_root / 'data_depth_velodyne' / 'train' / DRIVE /
                         'proj_depth' / 'velodyne_raw' / 'image_02' /
                         f'{i:010d}.png'), 512)

    P = ' '.join(map(str, [700.0, 0, 8.0, 44.0, 0, 700.0, 4.0, 0.1,
                           0, 0, 1.0, 0.01]))
    R9 = ' '.join(map(str, np.eye(3).ravel()))
    (date_dir / 'calib_cam_to_cam.txt').write_text(
        f'P_rect_02: {P}\nP_rect_03: {P}\nR_rect_00: {R9}\n')
    (date_dir / 'calib_velo_to_cam.txt').write_text(
        f'R: {R9}\nT: 0.1 0.2 0.3\n')
    (date_dir / 'calib_imu_to_velo.txt').write_text(
        f'R: {R9}\nT: 0.0 0.0 0.0\n')

    split = root / 'split.txt'
    split.write_text('\n'.join(
        f'{DATE}/{DRIVE}/image_02/data/{i:010d}.png'
        for i in range(N_FRAMES)) + '\n')
    return root, split, depth_root


def test_split_filtered_by_depth_availability(kitti_tree):
    root, split, depth_root = kitti_tree
    ds = KITTIDataset(str(root), str(split), depth_type='groundtruth',
                      depth_root=str(depth_root))
    # frame 4 has no gt depth
    assert len(ds) == N_FRAMES - 1
    assert all('0000000004' not in p for p in ds.paths)

    ds_all = KITTIDataset(str(root), str(split), depth_root=str(depth_root))
    assert len(ds_all) == N_FRAMES


def test_sample_contents_and_depth_layout(kitti_tree):
    root, split, depth_root = kitti_tree
    ds = KITTIDataset(str(root), str(split), depth_type='groundtruth',
                      input_depth_type='velodyne',
                      depth_root=str(depth_root))
    s = ds[2]   # frame index 2 in the filtered list is frame 2
    assert s['filename'] == 'split_%010d' % 2
    assert np.asarray(s['rgb']).shape == (8, 16, 3)
    np.testing.assert_allclose(
        s['intrinsics'], [[700.0, 0, 8.0], [0, 700.0, 4.0], [0, 0, 1.0]])
    # png16 value 256*(i+1) -> depth (i+1).0 after /256
    assert s['depth'].shape == (8, 16, 1)
    np.testing.assert_allclose(s['depth'], 3.0)
    np.testing.assert_allclose(s['input_depth'], 2.0)


def test_context_selection_and_pose_chain(kitti_tree):
    root, split, depth_root = kitti_tree
    ds = KITTIDataset(str(root), str(split), with_pose=True,
                      back_context=1, forward_context=1,
                      depth_root=str(depth_root))
    # first and last frames have no full context
    assert len(ds) == N_FRAMES - 2
    s = ds[0]   # center frame 1: context frames 0 and 2
    assert len(s['rgb_context']) == 2
    assert s['pose'].shape == (4, 4)
    assert len(s['pose_context']) == 2
    for pc in s['pose_context']:
        assert pc.shape == (4, 4) and np.isfinite(pc).all()
    # pose_context = inv(ctx_pose) @ pose maps center into ctx frame;
    # identical-rotation small-translation oxts -> near-identity rotation
    np.testing.assert_allclose(s['pose_context'][0][:3, :3], np.eye(3),
                               atol=1e-2)


def test_context_stride_2(kitti_tree):
    root, split, depth_root = kitti_tree
    ds = KITTIDataset(str(root), str(split), back_context=1,
                      forward_context=1, strides=(2,),
                      depth_root=str(depth_root))
    # need i-2 >= 0 and i+2 < 6 -> centers 2,3
    assert len(ds) == 2
    s = ds[0]
    assert len(s['rgb_context']) == 2
