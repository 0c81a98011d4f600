"""Generate a tiny synthetic GTA-format dataset for end-to-end tests.

Produces RGB pngs, uint16 depth pngs, edge pngs (with multiscale _000.._003
side files), normal pngs, sparse lidar pngs, and the 8-column split file the
GTADataset reads (``gta_dataset.py:184-211``).
"""

import os

import numpy as np


def make_dataset(root, n=4, h=64, w=96, seed=0):
    import cv2
    rng = np.random.RandomState(seed)
    dirs = {k: os.path.join(root, k)
            for k in ('rgb', 'depth', 'edges', 'lidar', 'normals')}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    lines = []
    for i in range(n):
        # blocky scene -> sharp depth edges
        depth = np.full((h, w), 30.0)
        for _ in range(3):
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            hh, ww = rng.randint(8, h // 2), rng.randint(8, w // 2)
            depth[y0:y0 + hh, x0:x0 + ww] = rng.uniform(5, 25)
        rgb = np.stack([np.clip(depth * 3 + rng.randn(h, w) * 5, 0, 255)] * 3,
                       -1).astype(np.uint8)
        rgb_path = os.path.join(dirs['rgb'], f'{i:06d}.png')
        cv2.imwrite(rgb_path, rgb)

        depth_path = os.path.join(dirs['depth'], f'{i:06d}.png')
        cv2.imwrite(depth_path, (depth * 256).astype(np.uint16))

        vis = (np.clip(depth, 0, 80) * 255 / 80).astype(np.uint8)
        edge = cv2.Canny(vis, 20, 40)
        edge_path = os.path.join(dirs['edges'], f'{i:06d}_000.png')
        cv2.imwrite(edge_path, edge)
        for s in range(1, 4):
            es = cv2.resize(edge, (w >> s, h >> s),
                            interpolation=cv2.INTER_NEAREST)
            cv2.imwrite(os.path.join(dirs['edges'], f'{i:06d}_00{s}.png'), es)

        sx = cv2.Sobel(depth, cv2.CV_64F, 1, 0, ksize=5)
        sy = cv2.Sobel(depth, cv2.CV_64F, 0, 1, ksize=5)
        ang = (((np.arctan2(-sy, sx) * 180 / np.pi) + 180) / 360 * 255).astype(np.uint8)
        normal_path = os.path.join(dirs['normals'], f'{i:06d}_000.png')
        cv2.imwrite(normal_path, ang)
        for s in range(1, 4):
            ans = cv2.resize(ang, (w >> s, h >> s))
            cv2.imwrite(os.path.join(dirs['normals'], f'{i:06d}_00{s}.png'), ans)

        lidar = np.where(rng.rand(h, w) < 0.05, depth, 0.0)
        lidar_path = os.path.join(dirs['lidar'], f'{i:06d}.png')
        cv2.imwrite(lidar_path, (lidar * 256).astype(np.uint16))

        lines.append(f'{rgb_path} {depth_path} {edge_path} {lidar_path} '
                     f'None None None {normal_path}\n')

    split_path = os.path.join(root, 'split.txt')
    with open(split_path, 'w') as f:
        f.writelines(lines)
    return split_path


if __name__ == '__main__':
    import sys
    print(make_dataset(sys.argv[1] if len(sys.argv) > 1 else '/tmp/mte_synth'))
