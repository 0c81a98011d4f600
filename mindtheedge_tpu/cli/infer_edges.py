"""Depth inference over a split file + optional depth/ordinal/edge-AUC
metrics.  TPU-native port of reference root ``infer_edges.py``.

Key redesign vs the reference's unbatched per-image Python loop
(``infer_edges.py:115-120``): images are batched and the forward+postprocess
runs as one jit-compiled program; host IO overlaps device compute via the
prefetching loader.

Outputs (reference-compatible): per image ``{idx:08d}_regular.npy`` (metric
depth), ``_regular.png`` (depth/max*255), ``_regular_color.png`` (log-depth
Spectral colormap), plus ``pred_list.txt``; optional ARE analyzer CSV, D3R,
and BSDS edge AUC.
"""

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description='PackNet-SAN TPU inference')
    parser.add_argument('--config', type=str, required=True,
                        help='Input config (.yaml)')
    parser.add_argument('--batch', type=int, default=4,
                        help='Inference batch size (device batching)')
    parser.add_argument('--spatial', type=str, default='0',
                        help='Spatially shard the network with halo exchange: '
                             'N = H-shard over N devices, NxM = 2-D HxW grid '
                             '(e.g. 2x2), 0=off, -1=largest legal H mesh. For '
                             'resolutions whose activations overflow one '
                             "chip's HBM (e.g. DDAD ~1216x1936, where H alone "
                             'caps at 2 shards but HxW grids unlock 4+).')
    parser.add_argument('--dp', type=int, default=-1,
                        help='Shard the inference batch over N devices (data '
                             'parallel; the TPU-native form of the '
                             "reference's rank-strided multi-GPU inference). "
                             '-1 = auto (largest device count dividing '
                             '--batch after --spatial takes its share), '
                             '0/1 = off. Composable with --spatial: an NxM '
                             '(data x space) mesh.')
    parser.add_argument('--wire', choices=('u16', 'u8', 'f32'), default='u16',
                        help='Depth downlink format: u16 = KITTI 1/256 m '
                             'storage format (half the bytes, 3.9 mm '
                             'quantization — finer than the AUC protocol '
                             'itself); u8 = the AUC protocol\'s own 80/255 m '
                             'grid (half again; edge-AUC-exact, eval-only); '
                             'f32 = lossless (parity debugging). '
                             'Lidar uplink ships as sparse (idx, u16) points '
                             'when density allows (ops/wire.py).')
    return parser.parse_args(argv)


def _read_inputs(line, config, image_shape):
    """Host-side preprocessing for one split line (columns like GTADataset)."""
    from mindtheedge_tpu.data.readers import (
        load_image, read_png_depth, read_npz_depth, read_lidar, process_lidar, GTA_K)
    from mindtheedge_tpu.data.augmentations import (
        resize_image, resize_depth_preserve)

    parts = line.strip().split(' ')
    rgb = load_image(parts[0])
    original_shape = rgb.size
    if image_shape:
        rgb = resize_image(rgb, image_shape)
    crop_shape = tuple(config.datasets.augmentation.crop_eval_borders or ())
    if len(crop_shape) == 2:
        # center-bottom crop (infer_edges.py:275-280)
        cw, ch = rgb.size
        sx = int((cw - crop_shape[1]) / 2)
        sy = int(ch - crop_shape[0])
        rgb = rgb.crop((sx, sy, sx + crop_shape[1], sy + crop_shape[0]))
    rgb_np = np.asarray(rgb, dtype=np.float32) / 255.0

    lidar_np = None
    if config.datasets.test.input_depth_type[0] != '' and len(parts) > 3 \
            and parts[3] not in ('', 'None'):
        lp = parts[3]
        ext = lp.rsplit('.', 1)[-1]
        if ext == 'png':
            lidar = read_png_depth(lp)
            lidar[lidar < 0] = 0.0
        elif ext == 'npz':
            lidar = read_npz_depth(lp, 'velodyne')
            lidar[lidar < 0] = 0.0
        elif ext == 'bin':
            if config.datasets.test.dataset[0] == 'KITTI':
                rows = np.fromfile(lp, dtype=np.float32).reshape(-1, 4).astype('int')
                lidar = np.zeros(original_shape)
                lidar[rows[:, 1], rows[:, 0]] = rows[:, 2]
            else:
                lidar = process_lidar(read_lidar(lp), GTA_K)
        else:
            lidar = None
        if lidar is not None:
            lidar = resize_depth_preserve(lidar, image_shape)
            lidar_np = lidar.astype(np.float32)

    rgb_edge_np = None
    if config.model.depth_net.input_channels == 4 and len(parts) > 5 \
            and parts[5] not in ('', 'None'):
        import cv2
        rp = parts[5]
        if rp.endswith('.npy'):
            rgb_edge_np = np.load(rp).astype(np.float32)
        else:
            rgb_edge_np = cv2.imread(rp)[:, :, 0].astype(np.float32) / 255.0
        if rgb_edge_np.ndim == 2:
            rgb_edge_np = rgb_edge_np[:, :, None]
    return rgb_np, lidar_np, rgb_edge_np


def save_depth_outputs(pred_depth, out_base, save_cfg):
    """Save npy/png/color outputs (reference ``infer_edges.py:349-366``)."""
    import cv2
    pred = np.asarray(pred_depth)
    cv2.imwrite(out_base + '_regular.png',
                (pred / max(pred.max(), 1e-12)) * 255)
    # always write the npy: pred_list.txt points at it and the downstream
    # ARE/D3R/edge-AUC stages load it regardless of the npz flag (which the
    # reference honors but then reads the missing file anyway,
    # infer_edges.py:349-366 vs :115)
    np.save(out_base + '_regular.npy', pred)
    # log-depth Spectral colormap
    import matplotlib.cm as cm
    import matplotlib as mpl
    from PIL import Image
    depth_log = np.log(np.clip(pred, 1e-12, None))
    depth_log = depth_log - depth_log.min()
    depth_log = depth_log / max(depth_log.max(), 1e-12)
    import matplotlib.pyplot as plt
    mapper = cm.ScalarMappable(norm=mpl.colors.Normalize(0.0, 1.0),
                               cmap=plt.get_cmap('Spectral'))
    colormapped = (mapper.to_rgba(depth_log)[:, :, :3] * 255).astype(np.uint8)
    Image.fromarray(colormapped).save(out_base + '_regular_color.png')


def main(argv=None):
    args = parse_args(argv)
    from mindtheedge_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()
    import jax
    import jax.numpy as jnp
    from mindtheedge_tpu.config import parse_test_file, get_cfg_defaults, prepare_config
    from mindtheedge_tpu.models.tasks import build_task
    from mindtheedge_tpu.training.checkpoint import load_checkpoint, restore_params
    from mindtheedge_tpu.utils.depth import inv2depth

    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/mte_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.config)
    cfg = prepare_config(cfg)
    ckpt = None
    ckpt_path = cfg.checkpoint.filepath
    if ckpt_path and os.path.isfile(ckpt_path):
        cfg, ckpt = parse_test_file(ckpt_path, args.config)
    else:
        print(f'WARNING: checkpoint {ckpt_path!r} not found — random init '
              '(smoke/benchmark mode)')

    image_shape = tuple(cfg.datasets.augmentation.image_shape) or None
    task = build_task(cfg)

    split_path = cfg.datasets.test.split[0]
    with open(split_path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]

    os.makedirs(cfg.save.folder, exist_ok=True)

    # ---- init / restore params ----------------------------------------------
    first_rgb, first_lidar, first_edge = _read_inputs(lines[0], cfg, image_shape)
    sample = {'rgb': jnp.asarray(first_rgb)[None]}
    if first_lidar is not None:
        sample['input_depth'] = jnp.asarray(first_lidar)[None]
    if first_edge is not None:
        sample['rgb_edge'] = jnp.asarray(first_edge)[None]
    variables = jax.jit(task.init)(jax.random.PRNGKey(cfg.arch.seed), sample)
    if ckpt is not None:
        from mindtheedge_tpu.training.state import split_variables
        params, batch_stats = split_variables(variables)
        params, n, total = restore_params(ckpt['state_dict'], params)
        print(f'Restored {n}/{total} params')
        if ckpt.get('batch_stats'):
            batch_stats, _, _ = restore_params(ckpt['batch_stats'], batch_stats)
        variables = {}
        for net in params:
            variables[net] = {'params': params[net]}
            if net in batch_stats:
                variables[net]['batch_stats'] = batch_stats[net]

    # serving kernel cache: precompute the parameter-derived conv kernels at
    # the serving shapes so their derivation chains (a ~64 ms batch-
    # independent fixed cost, ops/blocks.derived_kernel) leave the per-batch
    # program.  Params are fixed for the whole run, so this is exact.
    if hasattr(task.depth_net, 'spatial_axis'):
        try:
            from mindtheedge_tpu.models.packnet import prepare_kernel_cache
            kwargs1 = {k: v for k, v in sample.items() if k != 'rgb'}
            variables['depth'] = prepare_kernel_cache(
                task.depth_net, variables['depth'], sample['rgb'], **kwargs1)
        except Exception as e:   # cache is an optimization, never a blocker
            print(f'kernel-cache prepare skipped: {e}')

    # ---- serving program: decode sparse lidar in-graph, forward, emit the
    # depth map in the wire format (ops/wire.py) ------------------------------
    from mindtheedge_tpu.ops import wire
    use_u16 = args.wire in ('u16', 'u8')
    _enc = {'u16': wire.encode_depth_u16, 'u8': wire.encode_depth_u8,
            'f32': lambda d: d}[args.wire]
    _dec = {'u16': wire.decode_depth_u16, 'u8': wire.decode_depth_u8,
            'f32': np.asarray}[args.wire]

    def serve_fn(v, b):
        b = dict(b)
        if 'input_depth_idx' in b:
            h_, w_ = b['rgb'].shape[1], b['rgb'].shape[2]
            b['input_depth'] = wire.decode_lidar_sparse(
                b.pop('input_depth_idx'), b.pop('input_depth_val'), h_, w_)
        depth = inv2depth(task.infer(v, b)['inv_depths'][0][..., 0])
        return _enc(depth)

    # ---- device mesh: batch-DP x spatial (data x space) ----------------------
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mindtheedge_tpu.parallel import spatial as sputil
    n_dev = len(jax.devices())

    n_sp_h, n_sp_w = 1, 1
    sp_arg = (args.spatial or '0').strip().lower()
    if sp_arg not in ('0', '1', '1x1'):
        h_img, w_img = first_rgb.shape[0], first_rgb.shape[1]
        if 'x' in sp_arg:          # 2-D HxW grid, e.g. --spatial 2x2
            n_sp_h, n_sp_w = (int(t) for t in sp_arg.split('x'))
            grids = sputil.legal_space_grids(h_img, w_img, limit=n_dev)
            if (n_sp_h, n_sp_w) not in grids:
                raise SystemExit(
                    f'--spatial {n_sp_h}x{n_sp_w} is illegal for '
                    f'{h_img}x{w_img}: each per-shard extent must divide its '
                    'dim and stay even through 5 pack levels. Legal grids '
                    f'with {n_dev} devices: {sorted(grids)}.')
        else:
            legal = sputil.legal_space_sizes(h_img, limit=n_dev)
            n_sp_h = (sputil.max_space_devices(h_img, limit=n_dev)
                      if int(sp_arg) < 0 else int(sp_arg))
            if int(sp_arg) > 0 and n_sp_h not in legal:
                raise SystemExit(
                    f'--spatial {n_sp_h} is illegal for image height '
                    f'{h_img}: the per-shard height must divide H and stay '
                    f'even through 5 pack levels. Legal mesh sizes for '
                    f'H={h_img} with {n_dev} devices: {legal} '
                    f'(2-D grids: --spatial NxM).')
        if (n_sp_h > 1 or n_sp_w > 1) \
                and not hasattr(task.depth_net, 'spatial_axis'):
            print(f'--spatial ignored: {type(task.depth_net).__name__} '
                  'has no spatial_axis support')
            n_sp_h = n_sp_w = 1
    n_sp = n_sp_h * n_sp_w

    if args.dp < 0:
        avail = n_dev // n_sp
        n_dp = max(d for d in range(1, max(avail, 1) + 1)
                   if args.batch % d == 0)
    else:
        n_dp = max(args.dp, 1)
        if args.batch % n_dp:
            raise SystemExit(f'--dp {n_dp} must divide --batch {args.batch}')
        if n_dp * n_sp > n_dev:
            raise SystemExit(f'--dp {n_dp} x --spatial {n_sp} needs '
                             f'{n_dp * n_sp} devices, have {n_dev}')

    _shard_batch = lambda b: b
    if n_sp > 1:
        h_ax = 'space' if n_sp_h > 1 else None
        w_ax = 'space_w' if n_sp_w > 1 else None
        task.depth_net = task.depth_net.clone(
            spatial_axis=(h_ax, w_ax) if w_ax is not None else h_ax)

        def spatial_serve(v, b):
            depth = inv2depth(task.infer(v, b)['inv_depths'][0][..., 0])
            return _enc(depth)

        # mesh axes: data (if DP) x space (if H-sharded) x space_w (if W)
        import numpy as _np
        dims = [(n, name) for n, name in
                ((n_dp, 'data'), (n_sp_h, 'space'), (n_sp_w, 'space_w'))
                if n > 1]
        from jax.sharding import Mesh
        mesh = Mesh(_np.asarray(jax.devices()[:n_dp * n_sp]).reshape(
            [n for n, _ in dims]), tuple(name for _, name in dims))
        act = P('data' if n_dp > 1 else None, h_ax, w_ax)
        infer = jax.jit(jax.shard_map(
            spatial_serve, mesh=mesh,
            in_specs=(P(), act), out_specs=act, check_vma=False))
        _shard_batch = lambda b: {
            k: jax.device_put(v_, NamedSharding(mesh, act))
            for k, v_ in b.items()}
        print(f'Mesh: {n_dp} x {n_sp_h} x {n_sp_w} (data x space x space_w), '
              f'{first_rgb.shape[0]}x{first_rgb.shape[1]} halo-exchanged')
    elif n_dp > 1:
        # pure batch-DP serving: per-sample programs are independent, so a
        # jit over the batch-sharded input is SPMD with no collectives and
        # byte-identical outputs (tests/test_cli_dp.py)
        from mindtheedge_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:n_dp])
        infer = jax.jit(serve_fn)
        _shard_batch = lambda b: {
            k: jax.device_put(v_, NamedSharding(
                mesh, P('data', *[None] * (v_.ndim - 1))))
            for k, v_ in b.items()}
        print(f'Data-parallel serving over {n_dp} devices '
              f'(batch {args.batch}, {args.batch // n_dp}/device)')
    else:
        infer = jax.jit(serve_fn)

    # ---- batched, pipelined inference loop ----------------------------------
    # Dispatch is asynchronous; host conversion of batch i-LAG overlaps the
    # device running batch i (the remote relay costs ~17 ms per dispatched
    # program, so never sync per batch).
    pred_files = []
    batch_size = args.batch
    counter = 0
    LAG = 2
    in_flight = []

    # sparse lidar uplink capacity: 12.5% of pixels (KITTI lidar is ~5%);
    # static so every batch compiles to one program.  Falls back to dense if
    # the first frame overflows (e.g. near-dense completion inputs).  u16
    # point values are bit-exact for KITTI png lidar (stored as u16/256) and
    # 3.9 mm-quantized otherwise, so the sparse wire rides the --wire u16
    # opt-in; --wire f32 ships dense f32 (fully lossless).
    sparse_cap = None
    if use_u16 and n_sp == 1 and image_shape:
        sparse_cap = (image_shape[0] * image_shape[1]) // 8

    def drain(entry):
        nonlocal counter
        depth_dev, n_items = entry
        depth = _dec(depth_dev)
        for b in range(n_items):
            out_base = os.path.join(cfg.save.folder, str(counter).zfill(8))
            save_depth_outputs(depth[b], out_base, cfg.save)
            pred_files.append(out_base + '_regular.npy')
            counter += 1

    for i in range(0, len(lines), batch_size):
        chunk = lines[i:i + batch_size]
        rgbs, lidars, redges = [], [], []
        for ln in chunk:
            r, l, e = _read_inputs(ln, cfg, image_shape)
            if n_sp > 1 and r.shape[:2] != first_rgb.shape[:2]:
                raise SystemExit(
                    f'--spatial needs a uniform image shape: split line '
                    f'{ln.split(" ")[0]!r} has {r.shape[0]}x{r.shape[1]} but '
                    f'the mesh was sized for '
                    f'{first_rgb.shape[0]}x{first_rgb.shape[1]}. Set '
                    'datasets.augmentation.image_shape to resize uniformly.')
            rgbs.append(r)
            lidars.append(l)
            redges.append(e)
        # pad the tail chunk to keep one compiled program shape
        n_items = len(chunk)
        while len(rgbs) < batch_size:
            rgbs.append(rgbs[-1])
            lidars.append(lidars[-1])
            redges.append(redges[-1])
        batch = {'rgb': jnp.asarray(np.stack(rgbs))}
        if lidars[0] is not None:
            sparse = None
            if sparse_cap:
                try:
                    sparse = [wire.encode_lidar_sparse(l, sparse_cap)
                              for l in lidars]
                except ValueError:
                    sparse = None   # too dense for the wire: ship dense
            if sparse is not None:
                batch['input_depth_idx'] = jnp.asarray(
                    np.stack([s[0] for s in sparse]))
                batch['input_depth_val'] = jnp.asarray(
                    np.stack([s[1] for s in sparse]))
            else:
                batch['input_depth'] = jnp.asarray(np.stack(lidars))
        if redges[0] is not None:
            batch['rgb_edge'] = jnp.asarray(np.stack(redges))
        depth_dev = infer(variables, _shard_batch(batch))
        in_flight.append((depth_dev, n_items))
        if len(in_flight) > LAG:
            drain(in_flight.pop(0))
            print(f'Processed {counter}/{len(lines)}')
    for entry in in_flight:
        drain(entry)
    print(f'Processed {counter}/{len(lines)}')

    with open(os.path.join(cfg.save.folder, 'pred_list.txt'), 'w') as f:
        f.writelines(p + '\n' for p in pred_files)

    # ---- metrics --------------------------------------------------------------
    run_post_metrics(cfg, pred_files)
    print('-> Done!')


def run_post_metrics(cfg, pred_files):
    an = cfg.analysis
    if an.run_metrics and an.gt_image_list:
        from mindtheedge_tpu.evaluation.depth_analyzer import (
            DepthEvalLoader, DensePredictionAnalyzer, run_analysis)
        pred_list_path = os.path.join(cfg.save.folder, 'pred_list.txt')
        image_list = an.gt_image_list   # images only used for shape/debug
        loader = DepthEvalLoader(image_list, an.gt_image_list, pred_list_path)
        analyzer = DensePredictionAnalyzer(an)
        df = run_analysis(loader, analyzer, cfg)
        csv_path = os.path.join(cfg.save.folder, 'mean_frames_depth_metrics.csv')
        df.mean().to_csv(csv_path)
        print(f'Depth metrics -> {csv_path}')
        # ordinal D3R
        from mindtheedge_tpu.evaluation.d3r import d3r_metric
        scores = []
        for i in range(len(loader)):
            _, gt, d = loader[i]
            scores.append(d3r_metric(gt, d))
        print(f'D3R ordinal: {np.mean(scores):.4f}')

    if an.run_heavy_edge_metrics and an.edge_image_list:
        from mindtheedge_tpu.evaluation.edge_auc import edge_auc
        with open(an.edge_image_list) as f:
            gt_list = f.read().splitlines()
        result = edge_auc(gt_list, pred_files,
                          prec_range=(an.prec_recall_eval_range_min,
                                      an.prec_recall_eval_range_max),
                          gt_crop=an.gt_crop,
                          min_depth=an.min_depth, max_depth=an.max_depth,
                          save_folder=os.path.join(cfg.save.folder, 'temp_output'))
        auc_path = os.path.join(cfg.save.folder, 'edge_AUC.txt')
        with open(auc_path, 'w') as f:
            f.write(f"AUC over all range: {result['auc_full']}\n")
            f.write(f"AUC over partial range: {result['auc_partial']}\n")
        print(f"Edge AUC full={result['auc_full']:.4f} "
              f"partial={result['auc_partial']:.4f} -> {auc_path}")
        plot_edge_graph(result['precision'], result['recall'],
                        os.path.join(cfg.save.folder, 'edge_pr_curve.png'))


def plot_edge_graph(precision, recall, save_file_path):
    """PR-curve plot (reference ``infer_edges.py:218-234``)."""
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(15, 10))
        ax.plot(precision, recall, marker='o')
        ax.set_xlabel('precision')
        ax.set_ylabel('recall')
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.grid(True)
        fig.savefig(save_file_path)
        plt.close(fig)
    except Exception as e:
        print(f'PR plot skipped: {e}')


if __name__ == '__main__':
    main()
