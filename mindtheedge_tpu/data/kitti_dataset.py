"""KITTI raw dataset (reference ``datasets/kitti_dataset.py:52-437``).

Split file of image paths; depth paths derived from the KITTI depth layout;
calib intrinsics per drive folder; oxts-chain poses for context supervision.

Divergence (documented): the reference hard-codes the cluster prefix
``/mnt/algo-datasets/DB/KITTI_depth`` (``kitti_dataset.py:188-191``); here it
is the ``depth_root`` parameter with the same layout convention.
"""

import glob
import os

import numpy as np

from mindtheedge_tpu.data.kitti_utils import (
    read_calib_file, transform_from_rot_trans, pose_from_oxts_packet,
    invert_pose_numpy)
from mindtheedge_tpu.data.readers import load_image

IMAGE_FOLDER = {'left': 'image_02', 'right': 'image_03'}
CALIB_FILE = {'cam2cam': 'calib_cam_to_cam.txt',
              'velo2cam': 'calib_velo_to_cam.txt',
              'imu2velo': 'calib_imu_to_velo.txt'}
OXTS_POSE_DATA = 'oxts'


def read_npz_depth(file, depth_type):
    depth = np.load(file)[depth_type + '_depth'].astype(np.float32)
    return np.expand_dims(depth, axis=2)


def read_png_depth(file):
    depth_png = np.array(load_image(file), dtype=int)
    assert np.max(depth_png) > 255, 'Wrong .png depth file'
    depth = depth_png.astype(np.float32) / 256.0
    depth[depth_png == 0] = -1.0
    return np.expand_dims(depth, axis=2)


class KITTIDataset:
    def __init__(self, root_dir, file_list, train=True, data_transform=None,
                 depth_type=None, input_depth_type=None, with_pose=False,
                 back_context=0, forward_context=0, strides=(1,),
                 depth_root=None):
        assert back_context >= 0 and forward_context >= 0
        self.backward_context = back_context
        self.forward_context = forward_context
        self.with_context = back_context != 0 or forward_context != 0
        self.backward_context_paths = []
        self.forward_context_paths = []
        self.split = file_list.split('/')[-1].split('.')[0]
        self.train = train
        self.root_dir = root_dir
        self.data_transform = data_transform
        self.depth_type = depth_type
        self.with_depth = bool(depth_type)
        self.input_depth_type = input_depth_type
        self.with_input_depth = bool(input_depth_type)
        self.with_pose = with_pose
        self.depth_root = depth_root or os.path.join(root_dir or '', 'KITTI_depth')

        self._cache = {}
        self.pose_cache = {}
        self.oxts_cache = {}
        self.calibration_cache = {}
        self.imu2velo_calib_cache = {}

        with open(file_list, 'r') as f:
            data = f.readlines()

        self.paths = []
        for fname in data:
            if not fname.strip():
                continue
            path = os.path.join(self.root_dir, fname.split()[0]) \
                if self.root_dir else fname.split()[0]
            ok = True
            for dt, flag in ((self.input_depth_type, self.with_input_depth),
                             (self.depth_type, self.with_depth)):
                if ok and flag:
                    depth = self._get_depth_file(path, dt)
                    ok = depth is not None and os.path.exists(depth)
            if ok:
                self.paths.append(path)

        if self.with_context:
            paths_with_context = []
            for stride in strides:
                for idx, file in enumerate(self.paths):
                    back, fwd = self._get_sample_context(
                        file, back_context, forward_context, stride)
                    if back is not None and fwd is not None:
                        paths_with_context.append(self.paths[idx])
                        self.forward_context_paths.append(fwd)
                        self.backward_context_paths.append(back[::-1])
            self.paths = paths_with_context

    # -- path helpers -------------------------------------------------------------
    @staticmethod
    def _get_next_file(idx, file):
        base, ext = os.path.splitext(os.path.basename(file))
        return os.path.join(os.path.dirname(file),
                            str(idx).zfill(len(base)) + ext)

    @staticmethod
    def _get_parent_folder(image_file):
        return os.path.abspath(os.path.join(image_file, '../../../..'))

    @staticmethod
    def _get_intrinsics(image_file, calib_data):
        for cam in ('left', 'right'):
            if IMAGE_FOLDER[cam] in image_file:
                return np.reshape(
                    calib_data[IMAGE_FOLDER[cam].replace('image', 'P_rect')],
                    (3, 4))[:, :3]

    def _get_depth_file(self, image_file, depth_type):
        """KITTI depth layout: <depth_root>/<mode>/<drive>_sync/proj_depth/
        <word>/<image_0X>/<frame>.png."""
        if depth_type == 'groundtruth':
            prefix = os.path.join(self.depth_root, 'train')
            word = 'groundtruth'
        elif depth_type == 'velodyne':
            prefix = os.path.join(self.depth_root, 'data_depth_velodyne', 'train')
            word = 'velodyne_raw'
        else:
            return None
        for cam in ('left', 'right'):
            if IMAGE_FOLDER[cam] in image_file:
                folder = '/'.join(
                    image_file.split('sync')[0].split('/')[-1::]) + 'sync'
                return os.path.join(prefix, folder, 'proj_depth', word,
                                    IMAGE_FOLDER[cam],
                                    image_file.split('/')[-1].strip())
        return None

    def _read_depth(self, depth_file):
        if depth_file.endswith('.npz'):
            return read_npz_depth(depth_file, 'velodyne')
        if depth_file.endswith('.png'):
            return read_png_depth(depth_file)
        raise NotImplementedError(f'Depth type {self.depth_type}')

    def _get_sample_context(self, sample_name, backward, forward, stride=1):
        base, ext = os.path.splitext(os.path.basename(sample_name))
        parent_folder = os.path.dirname(sample_name)
        f_idx = int(base)
        if parent_folder in self._cache:
            max_num_files = self._cache[parent_folder]
        else:
            max_num_files = len(glob.glob(os.path.join(parent_folder, '*' + ext)))
            self._cache[parent_folder] = max_num_files
        if (f_idx - backward * stride) < 0 or (f_idx + forward * stride) >= max_num_files:
            return None, None
        c_idx, back_idxs = f_idx, []
        while len(back_idxs) < backward and c_idx > 0:
            c_idx -= stride
            if os.path.exists(self._get_next_file(c_idx, sample_name)):
                back_idxs.append(c_idx)
        if c_idx < 0:
            return None, None
        c_idx, fwd_idxs = f_idx, []
        while len(fwd_idxs) < forward and c_idx < max_num_files:
            c_idx += stride
            if os.path.exists(self._get_next_file(c_idx, sample_name)):
                fwd_idxs.append(c_idx)
        if c_idx >= max_num_files:
            return None, None
        return back_idxs, fwd_idxs

    # -- pose ------------------------------------------------------------------------
    def _get_imu2cam_transform(self, image_file):
        parent = self._get_parent_folder(image_file)
        if image_file in self.imu2velo_calib_cache:
            return self.imu2velo_calib_cache[image_file]
        cam2cam = read_calib_file(os.path.join(parent, CALIB_FILE['cam2cam']))
        imu2velo = read_calib_file(os.path.join(parent, CALIB_FILE['imu2velo']))
        velo2cam = read_calib_file(os.path.join(parent, CALIB_FILE['velo2cam']))
        velo2cam_mat = transform_from_rot_trans(velo2cam['R'], velo2cam['T'])
        imu2velo_mat = transform_from_rot_trans(imu2velo['R'], imu2velo['T'])
        cam_2rect = transform_from_rot_trans(cam2cam['R_rect_00'], np.zeros(3))
        imu2cam = cam_2rect @ velo2cam_mat @ imu2velo_mat
        self.imu2velo_calib_cache[image_file] = imu2cam
        return imu2cam

    @staticmethod
    def _get_oxts_file(image_file):
        for cam in ('left', 'right'):
            if IMAGE_FOLDER[cam] in image_file:
                return image_file.replace(IMAGE_FOLDER[cam],
                                          OXTS_POSE_DATA).replace('.png', '.txt')
        raise ValueError('Invalid KITTI path for pose supervision.')

    def _get_oxts_data(self, image_file):
        oxts_file = self._get_oxts_file(image_file)
        if oxts_file not in self.oxts_cache:
            self.oxts_cache[oxts_file] = np.loadtxt(oxts_file, delimiter=' ')
        return self.oxts_cache[oxts_file]

    def _get_pose(self, image_file):
        if image_file in self.pose_cache:
            return self.pose_cache[image_file]
        base, ext = os.path.splitext(os.path.basename(image_file))
        origin_frame = os.path.join(os.path.dirname(image_file),
                                    str(0).zfill(len(base)) + ext)
        origin_oxts = self._get_oxts_data(origin_frame)
        scale = np.cos(origin_oxts[0] * np.pi / 180.0)
        origin_pose = transform_from_rot_trans(
            *pose_from_oxts_packet(origin_oxts, scale))
        oxts = self._get_oxts_data(image_file)
        pose = transform_from_rot_trans(*pose_from_oxts_packet(oxts, scale))
        imu2cam = self._get_imu2cam_transform(image_file)
        odo_pose = (imu2cam @ np.linalg.inv(origin_pose) @
                    pose @ np.linalg.inv(imu2cam)).astype(np.float32)
        self.pose_cache[image_file] = odo_pose
        return odo_pose

    # -- items --------------------------------------------------------------------
    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        sample = {
            'idx': idx,
            'filename': '%s_%010d' % (self.split, idx),
            'rgb': load_image(self.paths[idx]),
        }
        parent = self._get_parent_folder(self.paths[idx])
        if parent not in self.calibration_cache:
            self.calibration_cache[parent] = read_calib_file(
                os.path.join(parent, CALIB_FILE['cam2cam']))
        sample['intrinsics'] = self._get_intrinsics(
            self.paths[idx], self.calibration_cache[parent])

        if self.with_pose:
            sample['pose'] = self._get_pose(self.paths[idx])
        if self.with_depth:
            sample['depth'] = self._read_depth(
                self._get_depth_file(self.paths[idx], self.depth_type))
        if self.with_input_depth:
            sample['input_depth'] = self._read_depth(
                self._get_depth_file(self.paths[idx], self.input_depth_type))

        if self.with_context:
            idxs = self.backward_context_paths[idx] + self.forward_context_paths[idx]
            files = [self._get_next_file(i, self.paths[idx]) for i in idxs]
            sample['rgb_context'] = [load_image(f) for f in files]
            if self.with_pose:
                first_pose = sample['pose']
                ctx_poses = [self._get_pose(f) for f in files]
                sample['pose_context'] = [
                    invert_pose_numpy(p) @ first_pose for p in ctx_poses]

        if self.data_transform:
            sample = self.data_transform(sample)
        return sample
