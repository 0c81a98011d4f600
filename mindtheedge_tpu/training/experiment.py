"""Experiment: the orchestration hub (reference ``ModelWrapper`` +
``CommonTrainer`` collapsed into one functional runner).

Owns: task (model+losses), datasets/loaders, optimizer, train state; runs the
epoch loop with a jit/pjit-compiled train step, per-epoch validation (depth
metrics with flip post-processing + edge chamfer metrics) and checkpointing.

Reference: ``models/model_wrapper.py`` (setup factories :553-793, step fns
:197-311, evaluate_depth :328-374) and ``trainers/common_trainer.py`` (epoch
loop :42-91).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mindtheedge_tpu.models.tasks import build_task
from mindtheedge_tpu.data.datasets import DATASET_REGISTRY, ConcatDataset
from mindtheedge_tpu.data.transforms import get_transforms
from mindtheedge_tpu.data.loader import DataLoader
from mindtheedge_tpu.training.optimizer import build_optimizer
from mindtheedge_tpu.training.train_step import make_train_step, create_train_state
from mindtheedge_tpu.training.state import variables_from_state, split_variables
from mindtheedge_tpu.training.checkpoint import (
    ModelCheckpoint, load_checkpoint, restore_params, save_checkpoint)
from mindtheedge_tpu.utils.depth import (
    inv2depth, post_process_inv_depth, compute_depth_metrics, DEPTH_METRIC_NAMES)
from mindtheedge_tpu.utils.image import flip_lr


def set_random_seed(seed):
    np.random.seed(seed)
    import random
    random.seed(seed)
    return jax.random.PRNGKey(seed)


def setup_dataset(cfg, mode, **kwargs):
    """Build (possibly concatenated) datasets (``model_wrapper.py:675-752``)."""
    datasets = []
    for i in range(len(cfg.path)):
        ds_cls = DATASET_REGISTRY[cfg.dataset[i]]
        transform = get_transforms(
            mode=mode, **kwargs)
        datasets.append(ds_cls(
            root_dir=cfg.path[i],
            file_list=cfg.split[i],
            train=(mode == 'train'),
            data_transform=transform,
            depth_type=cfg.depth_type[i] if cfg.depth_type else None,
            input_depth_type=cfg.input_depth_type[i] if cfg.input_depth_type else None,
            back_context=cfg.back_context,
            forward_context=cfg.forward_context))
    if len(datasets) == 1 and (not cfg.get('repeat') or cfg.repeat[0] == 1):
        return datasets[0]
    return ConcatDataset(datasets, repeats=cfg.get('repeat'))


def setup_dataloader(dataset, cfg, mode, seed=42):
    return DataLoader(
        dataset,
        batch_size=cfg.batch_size,
        shuffle=(mode == 'train'),
        num_workers=min(cfg.num_workers, 4),
        drop_last=(mode == 'train'),
        seed=seed,
        rank=jax.process_index(),
        world_size=jax.process_count())


def batch_to_device(batch):
    """numpy batch -> jnp arrays (drop non-array fields)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jnp.asarray(v)
        elif isinstance(v, list) and v and isinstance(v[0], np.ndarray):
            out[k] = [jnp.asarray(x) for x in v]
    return out


class Experiment:
    def __init__(self, config, resume_ckpt=None, load_datasets=True):
        self.config = config
        self.rng = set_random_seed(config.arch.seed)
        self.task = build_task(config)
        self.min_depth = config.model.params.min_depth
        self.max_depth = config.model.params.max_depth
        self.crop = config.model.params.crop
        self.scale_output = config.model.params.scale_output

        self.train_loader = self.val_loader = self.test_loader = None
        if load_datasets:
            aug = config.datasets.augmentation
            kwargs = dict(image_shape=aug.image_shape,
                          jittering=aug.jittering,
                          crop_train_borders=aug.crop_train_borders,
                          crop_eval_borders=aug.crop_eval_borders,
                          lidar_scale=aug.lidar_scale,
                          lidar_add=aug.lidar_add,
                          lidar_drop_rate=aug.lidar_drop_rate)
            def has_split(c):
                return bool(c.split) and bool(c.split[0])
            if has_split(config.datasets.train):
                ds = setup_dataset(config.datasets.train, 'train', **kwargs)
                self.train_loader = setup_dataloader(
                    ds, config.datasets.train, 'train', config.arch.seed)
            if has_split(config.datasets.validation):
                ds = setup_dataset(config.datasets.validation, 'validation', **kwargs)
                self.val_loader = setup_dataloader(
                    ds, config.datasets.validation, 'validation', config.arch.seed)
            if has_split(config.datasets.test):
                ds = setup_dataset(config.datasets.test, 'test', **kwargs)
                self.test_loader = setup_dataloader(
                    ds, config.datasets.test, 'test', config.arch.seed)

        # Horovod-honest DP sizing (reference horovod_trainer.py:53-55):
        # datasets.train.batch_size is PER-DEVICE (the reference's per-GPU
        # meaning, default_config.py:176); the train loader produces the
        # scaled global batch B x n_dp.  Decided here so steps_per_epoch —
        # and with it the StepLR epoch counter (training/optimizer.py:17) —
        # see the scaled batch.
        self.n_dp = 1
        self.per_device_batch = None
        if self.train_loader is not None:
            per_dev = self.train_loader.batch_size
            n_dp = config.arch.dp_devices or len(jax.devices())
            n_dp = min(n_dp, len(jax.devices()),
                       max(1, len(self.train_loader.dataset) // max(per_dev, 1)))
            self.n_dp = n_dp
            self.per_device_batch = per_dev
            if n_dp > 1:
                self.train_loader.batch_size = per_dev * n_dp

        self.state = None
        self.resume_ckpt = resume_ckpt
        self._jit_infer = None

    # -- state/optimizer ---------------------------------------------------------
    def initialize_state(self, sample_batch):
        steps_per_epoch = len(self.train_loader) if self.train_loader else 1
        batch = batch_to_device(sample_batch)
        variables = jax.jit(self.task.init)(self.rng, batch)
        params, batch_stats = split_variables(variables)
        self.optimizer = build_optimizer(self.config, params, steps_per_epoch)

        epoch, step, resume_payload = 0, 0, None
        if self.resume_ckpt:
            resume_payload = ckpt = load_checkpoint(self.resume_ckpt)
            params, n_loaded, n_total = restore_params(ckpt['state_dict'], params)
            print(f'Restored {n_loaded}/{n_total} params from {self.resume_ckpt}')
            if ckpt.get('batch_stats'):
                batch_stats, _, _ = restore_params(ckpt['batch_stats'], batch_stats)
            # our ckpt 'epoch' is already the next-epoch index (state.epoch
            # is incremented before save), so no +1 — unlike the reference
            # (model_wrapper.py:93-94) whose ckpt stores the finished epoch.
            epoch = ckpt.get('epoch', 0)
            step = int(ckpt.get('global_step', 0))
        elif self.config.model.depth_net.checkpoint_path:
            import os
            path = self.config.model.depth_net.checkpoint_path
            if os.path.exists(path):
                ckpt = load_checkpoint(path)
                depth_params = ckpt['state_dict'].get('depth', ckpt['state_dict'])
                params['depth'], n_loaded, n_total = restore_params(
                    depth_params, params['depth'])
                print(f'Loaded depth net: {n_loaded}/{n_total} params from {path}')

        from mindtheedge_tpu.training.state import TrainState
        opt_state = self.optimizer.init(params)
        if resume_payload is not None and resume_payload.get('optimizer') is not None:
            # Adam moments + schedule counts survive the restart
            # (reference model_wrapper.py:169-173); without this the StepLR
            # position snaps back to the base LR on resume.
            from mindtheedge_tpu.training.checkpoint import restore_opt_state
            opt_state, _ = restore_opt_state(resume_payload['optimizer'], opt_state)
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=opt_state, step=step, epoch=epoch)
        return self.state

    # -- inference -----------------------------------------------------------------
    def infer_fn(self):
        if self._jit_infer is None:
            def run(variables, batch):
                return self.task.infer(variables, batch)
            self._jit_infer = jax.jit(run)
        return self._jit_infer

    def predict_depth(self, batch):
        """Single forward; returns inverse depths list."""
        variables = variables_from_state(self.state)
        return self.infer_fn()(variables, batch_to_device(batch))

    def evaluate_depth(self, batch):
        """Flipped-fusion depth eval (``model_wrapper.py:328-374``).

        Divergence from the reference bug at ``model_wrapper.py:334-343``:
        we flip input_depth/rgb_edge for the second pass and restore
        everything (the reference leaves them flipped for subsequent use).
        """
        variables = variables_from_state(self.state)
        jbatch = batch_to_device(batch)
        out = self.infer_fn()(variables, jbatch)
        inv_depth = out['inv_depths'][0][..., :1]

        flipped = dict(jbatch)
        for key in ('rgb', 'input_depth', 'rgb_edge'):
            if key in flipped:
                flipped[key] = flip_lr(flipped[key])
        out_f = self.infer_fn()(variables, flipped)
        inv_depth_flipped = out_f['inv_depths'][0][..., :1]
        inv_depth_pp = post_process_inv_depth(inv_depth, inv_depth_flipped)

        depth = inv2depth(inv_depth)
        depth_pp = inv2depth(inv_depth_pp)
        metrics = {}
        if 'depth' in jbatch:
            gt = jbatch['depth']
            for name, pred in (('depth', depth), ('depth_pp', depth_pp)):
                for gt_scale in (True, False):
                    m = compute_depth_metrics(
                        gt, pred, self.min_depth, self.max_depth,
                        self.crop, self.scale_output, use_gt_scale=gt_scale)
                    key = f'{name}{"_gt" if gt_scale else ""}'
                    metrics[key] = np.asarray(m)
        return {'inv_depth_pp': inv_depth_pp, 'depth': depth,
                'depth_pp': depth_pp, 'metrics': metrics}

    # -- training loop -----------------------------------------------------------------
    def fit(self):
        assert self.train_loader is not None, 'No training dataset configured'
        first_batch = next(iter(self.train_loader))
        if self.state is None:
            self.initialize_state(first_batch)

        from mindtheedge_tpu.losses.loss_base import ProgressiveScaling
        prog_scaling = ProgressiveScaling(
            self.config.model.loss.progressive_scaling,
            self.config.model.loss.supervised_num_scales)
        base_n = self.task.supervised_num_scales
        _step_cache = {}

        # Data-parallel mesh with HOROVOD-HONEST per-replica batch semantics
        # (sizing decided in __init__): each replica computes the loss on its
        # own per_device_batch samples, gradients are pmean'd
        # (parallel/mesh.make_dp_train_step).
        self.mesh = None
        if self.n_dp > 1:
            from mindtheedge_tpu.parallel.mesh import make_mesh, replicated
            self.mesh = make_mesh(jax.devices()[:self.n_dp])
            self.state = jax.device_put(self.state, replicated(self.mesh))
            print(f'Data-parallel over {self.n_dp} devices: global batch '
                  f'{self.train_loader.batch_size} '
                  f'({self.per_device_batch}/device)')

        def step_for(n_scales):
            # scale-count decay recompiles at most num_scales times total
            if n_scales not in _step_cache:
                self.task.supervised_num_scales = n_scales
                if self.mesh is not None:
                    from mindtheedge_tpu.parallel.mesh import make_dp_train_step
                    _step_cache[n_scales] = make_dp_train_step(
                        self.task, self.optimizer, self.mesh)
                else:
                    _step_cache[n_scales] = jax.jit(
                        make_train_step(self.task, self.optimizer))
            return _step_cache[n_scales]

        train_step = step_for(base_n)
        _shard = lambda b: b   # the DP step shards internally
        ckpt_mgr = ModelCheckpoint(
            filepath=self.config.checkpoint.filepath or 'checkpoints',
            monitor=self.config.checkpoint.monitor,
            save_top_k=self.config.checkpoint.save_top_k,
            mode=self.config.checkpoint.mode,
            save_freq=self.config.checkpoint.save_freq,
            s3_path=self.config.checkpoint.s3_path,
            s3_frequency=self.config.checkpoint.s3_frequency,
            yaml_path=self.config.config or self.config.checkpoint.yaml_path)

        from mindtheedge_tpu.utils.wandb_logger import WandbLogger
        from mindtheedge_tpu.utils.profiling import StepTimer
        logger = WandbLogger(dir=self.config.checkpoint.filepath or '.',
                             **{k: v for k, v in self.config.wandb.items()
                                if k not in ('dir', 'url')})
        logger.log_config(self.config)
        timer = StepTimer()

        max_epochs = self.config.arch.max_epochs
        key = self.rng
        while int(self.state.epoch) < max_epochs:
            epoch = int(self.state.epoch)
            self.train_loader.set_epoch(epoch)
            t0 = time.time()
            running = {}
            n_batches = 0
            progress = epoch / max_epochs
            train_step = step_for(min(prog_scaling(progress), base_n))
            # metrics stay on device until epoch end: a host sync per step
            # costs a full relay round-trip (~17 ms) on this backend
            for batch in self.train_loader:
                jbatch = _shard(batch_to_device(batch))
                with timer:
                    self.state, metrics = train_step(self.state, jbatch, key,
                                                     progress)
                n_batches += 1
                for k, v in metrics.items():
                    running.setdefault(k, []).append(v)
            means = {k: float(jnp.mean(jnp.stack(v)))
                     for k, v in running.items()}
            logger.log_metrics({f'train/{k}': v for k, v in means.items()},
                               global_step=int(self.state.step))
            dt = time.time() - t0
            ips = n_batches * self.train_loader.batch_size / max(dt, 1e-9)
            print(f'Epoch {epoch}: ' +
                  ' '.join(f'{k}={v:.4f}' for k, v in sorted(means.items())) +
                  f' ({ips:.2f} img/s)')

            val_metrics = {}
            if self.val_loader is not None:
                val_metrics = self.validate()
            if val_metrics:
                logger.log_metrics({f'val/{k}': v for k, v in val_metrics.items()},
                                   global_step=int(self.state.step))
            self.state = self.state.replace(epoch=epoch + 1)
            ckpt_mgr.check_and_save(self.config, self.state,
                                    {**means, **val_metrics})
        summary = timer.summary()
        if summary:
            print('Step timing: ' +
                  ' '.join(f'{k}={v:.4g}' for k, v in summary.items()))
        logger.finish()
        return self.state

    def validate(self):
        from mindtheedge_tpu.evaluation.edge_metrics import (
            compute_edge_metrics, EDGE_METRIC_NAMES)
        is_dee = 'EdgeEstimation' in self.config.model.name
        log_edges = self.config.edges.depth_edges_metric_log
        gt_crop = self.config.datasets.validation.gt_crop
        gt_crop0 = gt_crop[0] if gt_crop else None

        sums, count = {}, 0
        for batch in self.val_loader:
            result = self.evaluate_depth(batch)
            for key, arr in result['metrics'].items():
                for name, val in zip(DEPTH_METRIC_NAMES, arr):
                    k = f'{key}/{name}'
                    sums[k] = sums.get(k, 0.0) + float(val)
            if log_edges and 'edge' in batch:
                # chamfer edge P/R/F1 (model_wrapper.py:376-442); DEE models
                # threshold probabilities, depth models Canny the depth.
                # Every sample in the batch is scored (the reference's
                # per-sample loop sees each one); the batch mean enters the
                # same count-weighted running sum as the depth metrics.
                preds = np.asarray(result['inv_depth_pp'][..., 0] if is_dee
                                   else result['depth_pp'][..., 0])
                gts = np.asarray(batch['edge'][..., 0])
                per_sample = [compute_edge_metrics(
                    preds[i], gts[i], is_probability=is_dee, gt_crop=gt_crop0)
                    for i in range(preds.shape[0])]
                for name, val in zip(EDGE_METRIC_NAMES,
                                     np.mean(per_sample, axis=0)):
                    k = f'edges/{name}'
                    sums[k] = sums.get(k, 0.0) + float(val)
            count += 1
        if jax.process_count() > 1:
            # cross-host metric reduction (reference utils/reduce.py:33-82 /
            # horovod.py:32-50): sum the per-process sums and counts so the
            # mean is sample-weighted across the rank-strided val shards
            from mindtheedge_tpu.utils.reduce import reduce_value
            sums = {k: float(reduce_value(v, average=False))
                    for k, v in sums.items()}
            count = int(reduce_value(count, average=False))
        means = {k: v / max(count, 1) for k, v in sums.items()}
        if means:
            print('Validation: ' +
                  ' '.join(f'{k}={v:.4f}' for k, v in sorted(means.items())))
        return means
