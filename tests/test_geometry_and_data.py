import numpy as np
import jax.numpy as jnp
import pytest

from mindtheedge_tpu.geometry.camera import (
    reconstruct, project, scale_intrinsics, grid_sample)
from mindtheedge_tpu.geometry.pose import (
    euler2mat, pose_vec2mat, invert_pose, transform_points)
from mindtheedge_tpu.data.augmentations import resize_depth_preserve


def _K(b=1):
    K = np.array([[500., 0, 320.], [0, 500., 240.], [0, 0, 1.]], np.float32)
    return jnp.asarray(np.tile(K[None], (b, 1, 1)))


def test_reconstruct_project_roundtrip():
    rng = np.random.RandomState(0)
    depth = jnp.asarray(rng.rand(1, 24, 32, 1).astype(np.float32) * 10 + 1)
    K = _K()
    pts = reconstruct(depth, K, frame='w')
    coords = project(pts, K, frame='w')
    # normalized coords must map back onto the pixel grid (align_corners)
    h, w = 24, 32
    x = (np.asarray(coords[..., 0]) + 1) / 2 * (w - 1)
    y = (np.asarray(coords[..., 1]) + 1) / 2 * (h - 1)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_allclose(x[0], gx, atol=1e-2)
    np.testing.assert_allclose(y[0], gy, atol=1e-2)


def test_pose_invert_roundtrip():
    rng = np.random.RandomState(1)
    vec = jnp.asarray(rng.randn(2, 6).astype(np.float32) * 0.1)
    T = pose_vec2mat(vec)
    TT = invert_pose(invert_pose(T))
    np.testing.assert_allclose(np.asarray(TT), np.asarray(T), atol=1e-5)
    I = np.asarray(invert_pose(T) @ T)
    np.testing.assert_allclose(I, np.tile(np.eye(4), (2, 1, 1)), atol=1e-5)


def test_grid_sample_identity():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(1, 8, 10, 3).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, 10), np.linspace(-1, 1, 8))
    coords = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))
    out = grid_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    img = rng.rand(2, 9, 11, 2).astype(np.float32)
    coords = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.4 - 1.2)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    theirs = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                           torch.from_numpy(coords), mode='bilinear',
                           padding_mode='zeros', align_corners=True)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_depth_preserve_conserves_points():
    rng = np.random.RandomState(4)
    depth = np.zeros((40, 60))
    ys, xs = rng.randint(0, 40, 25), rng.randint(0, 60, 25)
    depth[ys, xs] = rng.rand(25) * 50 + 1
    out = resize_depth_preserve(depth, (20, 30))
    # every output valid pixel's value must exist in the input's valid set
    out_vals = out[out > 0]
    in_vals = depth[depth > 0]
    for v in out_vals:
        assert np.any(np.isclose(in_vals, v))
    # no interpolation: downsampling cannot create more points than input
    assert (out > 0).sum() <= (depth > 0).sum()


def test_scale_intrinsics_pixel_center_convention():
    K = _K()
    K2 = scale_intrinsics(K, 0.5, 0.5)
    np.testing.assert_allclose(float(K2[0, 0, 0]), 250.0)
    np.testing.assert_allclose(float(K2[0, 0, 2]), (320 + 0.5) * 0.5 - 0.5)


def test_config_yaml_roundtrip(tmp_path):
    from mindtheedge_tpu.config import get_cfg_defaults, prepare_config
    cfg = get_cfg_defaults()
    cfg.merge_from_file(
        '/root/reference/packnet_code/configs/train_packnet_san_kitti_with_edges.yaml')
    cfg = prepare_config(cfg)
    assert cfg.model.name == 'SemiSupEdgeModel'
    assert cfg.datasets.augmentation.image_shape == (384, 1280)
    assert cfg.model.loss.supervised_method == 'sparse-silog'
    assert cfg.edges.depth_edges_loss_weight == 10.0
    # dump + re-merge must be stable
    p = tmp_path / 'cfg.yaml'
    cfg.save_yaml(str(p))
    cfg2 = get_cfg_defaults()
    cfg2.merge_from_file(str(p))
    assert cfg2.model.name == cfg.model.name
