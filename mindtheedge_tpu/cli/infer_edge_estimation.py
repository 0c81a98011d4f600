"""DEE annotation pipeline: depth-edge + normal pseudo-labels.

TPU-native port of reference root ``infer_edge_estimation.py``.  The
reference's per-scale host post-processing — Sobel normals (cv2), NMS and
hysteresis as pure-Python O(H*W) loops (``utils/tools.py:9-92``, the single
biggest hot loop in the annotation path) — is fused into ONE jit-compiled
XLA program per image batch here.

Outputs (reference-compatible, ``infer_edge_estimation.py:108-117,186-259``):
``{idx:08d}_lidar[_00s].png/.npy`` edge maps, ``normals/..._lidar_00s.png``
angle maps, and ``rgb_lidar_edges_split.txt`` (8-column training split).
"""

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description='DEE pseudo-label annotation')
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--batch', type=int, default=4)
    return parser.parse_args(argv)


def save_split_list(rgb_files, lidar_files, save_folder_edges,
                    save_folder_normals):
    """Write the 8-column training split (``infer_edge_estimation.py:108-117``)."""
    filenames = [str(a).zfill(8) + '_lidar_000.png'
                 for a in range(len(rgb_files))]
    lines = [
        f'{rgb} {lidar} {save_folder_edges}/{fn} {lidar} None None None '
        f'{save_folder_normals}/{fn}\n'
        for rgb, lidar, fn in zip(rgb_files, lidar_files, filenames)]
    with open(os.path.join(save_folder_edges, 'rgb_lidar_edges_split.txt'), 'w') as f:
        f.writelines(lines)


def main(argv=None):
    args = parse_args(argv)
    from mindtheedge_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()
    import cv2
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.config import get_cfg_defaults, prepare_config, parse_test_file
    from mindtheedge_tpu.models.tasks import build_task
    from mindtheedge_tpu.training.checkpoint import restore_params
    from mindtheedge_tpu.training.state import split_variables
    from mindtheedge_tpu.data.readers import (
        load_image, read_png_depth, read_lidar, process_lidar, GTA_K)
    from mindtheedge_tpu.data.augmentations import resize_image, resize_depth_preserve
    from mindtheedge_tpu.ops.edge_ops import hysteresis, normals_angle_255
    from mindtheedge_tpu.ops.pallas.nms_kernel import non_max_suppression_fast as non_max_suppression

    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/mte_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.config)
    cfg = prepare_config(cfg)
    ckpt = None
    if cfg.checkpoint.filepath and os.path.isfile(cfg.checkpoint.filepath):
        cfg, ckpt = parse_test_file(cfg.checkpoint.filepath, args.config)
    else:
        print(f'WARNING: checkpoint {cfg.checkpoint.filepath!r} not found — '
              'random init (smoke mode)')

    image_shape = tuple(cfg.datasets.augmentation.image_shape)
    task = build_task(cfg)
    test_cfg = cfg.datasets.test

    with open(test_cfg.split[0]) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    files = [ln.split(' ')[0] for ln in lines]
    lidar_files = [ln.split(' ')[3] for ln in lines]

    out_dir = cfg.save.folder
    os.makedirs(out_dir, exist_ok=True)
    normals_dir = os.path.join(out_dir, 'normals')
    if test_cfg.normals:
        os.makedirs(normals_dir, exist_ok=True)

    scales = 4 if cfg.save.depth.multiscale else 1

    def read_pair(rgb_path, lidar_path):
        image = load_image(rgb_path)
        if image.size != (image_shape[1], image_shape[0]):
            image = resize_image(image, image_shape)
        rgb = np.asarray(image, dtype=np.float32) / 255.0
        lidar = None
        if test_cfg.is_infer_lidar and lidar_path not in ('', 'None'):
            ext = lidar_path.rsplit('.', 1)[-1]
            if ext == 'png':
                lidar = read_png_depth(lidar_path)
                lidar[lidar < 0] = 0.0
            elif ext == 'bin':
                lidar = process_lidar(read_lidar(lidar_path), GTA_K)
            elif ext == 'npy':
                lidar = np.load(lidar_path)
            lidar = lidar / 200.0   # infer_edge_estimation.py:223
            if lidar.shape[:2] != tuple(image_shape):
                lidar = resize_depth_preserve(lidar, image_shape)
            lidar = lidar.reshape(image_shape[0], image_shape[1], 1).astype(np.float32)
        return rgb, lidar

    # init params
    r0, l0 = read_pair(files[0], lidar_files[0])
    sample = {'rgb': jnp.asarray(r0)[None]}
    if l0 is not None:
        sample['input_depth'] = jnp.asarray(l0)[None]
    variables = jax.jit(task.init)(jax.random.PRNGKey(cfg.arch.seed), sample)
    if ckpt is not None:
        params, batch_stats = split_variables(variables)
        params, n, total = restore_params(ckpt['state_dict'], params)
        print(f'Restored {n}/{total} params')
        if ckpt.get('batch_stats'):
            batch_stats, _, _ = restore_params(ckpt['batch_stats'], batch_stats)
        variables = {net: {'params': params[net],
                           **({'batch_stats': batch_stats[net]}
                              if net in batch_stats else {})}
                     for net in params}

    use_nms = bool(test_cfg.nms)
    use_hyst = bool(test_cfg.hysteresis)
    use_normals = bool(test_cfg.normals)

    @jax.jit
    def annotate(variables, batch):
        """Forward + per-scale fused post-processing (Sobel normals, NMS,
        hysteresis all in ONE compiled program; the reference runs these as
        per-pixel Python loops per scale).  read_pair already applied the
        /200 lidar normalization; every scale is halved into [0,1] edge
        probability (infer_edge_estimation.py:191,242)."""
        out = task.run_depth(variables, batch, train=False)[0]
        results = []
        for s in range(scales):
            prob = out['inv_depths'][s][..., 0] / 2.0
            normals = normals_angle_255(prob) if use_normals else None
            edge = prob
            if use_nms:
                edge = non_max_suppression(edge)
            if use_hyst:
                edge = hysteresis(edge)
            results.append((edge, normals))
        return results

    @jax.jit
    def annotate_rgb(variables, batch):
        """RGB-only path (is_infer_rgb, infer_edge_estimation.py:183-207)."""
        out = task.run_depth(variables, {'rgb': batch['rgb']}, train=False)[0]
        results = []
        for s in range(scales):
            prob = out['inv_depths'][s][..., 0] / 2.0
            normals = normals_angle_255(prob) if use_normals else None
            edge = prob
            if use_nms:
                edge = non_max_suppression(edge)
            if use_hyst:
                edge = hysteresis(edge)
            results.append((edge, normals))
        return results

    counter = 0
    for i in range(0, len(files), args.batch):
        chunk = list(zip(files[i:i + args.batch], lidar_files[i:i + args.batch]))
        rgbs, lidars = [], []
        for rgb_path, lidar_path in chunk:
            r, l = read_pair(rgb_path, lidar_path)
            rgbs.append(r)
            lidars.append(l)
        batch = {'rgb': jnp.asarray(np.stack(rgbs))}
        if lidars[0] is not None:
            batch['input_depth'] = jnp.asarray(np.stack(lidars))

        def write(results, tag):
            results = [(np.asarray(e), None if n is None else np.asarray(n))
                       for e, n in results]
            for b in range(len(chunk)):
                base = os.path.join(out_dir, str(counter + b).zfill(8))
                for s in range(scales):
                    end = f'_{tag}' if scales == 1 else f'_{tag}_{s:03d}'
                    edge, normals = results[s]
                    cv2.imwrite(base + end + '.png',
                                np.clip(edge[b] * 255, 0, 255).astype(np.uint8))
                    if cfg.save.depth.npz:
                        np.save(base + end + '.npy', edge[b])
                    if normals is not None:
                        npath = os.path.join(
                            normals_dir, str(counter + b).zfill(8) + end + '.png')
                        cv2.imwrite(npath, normals[b].astype(np.uint8))

        if test_cfg.is_infer_rgb:
            # RGB-only edge maps, '_regular' suffix (ref :186-190)
            write(annotate_rgb(variables, batch), 'regular')
        if test_cfg.is_infer_lidar and 'input_depth' in batch:
            write(annotate(variables, batch), 'lidar')
        counter += len(chunk)
        print(f'Processed image {counter}')

    save_split_list(files, lidar_files, out_dir, normals_dir)
    print('-> Done!')


if __name__ == '__main__':
    main()
