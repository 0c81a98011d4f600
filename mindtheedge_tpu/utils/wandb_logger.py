"""Weights & Biases logger (reference ``loggers/wandb_logger.py``), gated.

wandb is not installed in all environments; the logger degrades to a local
JSONL metrics file so training runs are observable either way.
"""

import json
import os
import time


class WandbLogger:
    def __init__(self, name='', dir='', entity='', project='', tags=None,
                 dry_run=True, train_log_step=50, **kwargs):
        self.dry_run = dry_run
        self.train_log_step = train_log_step
        self._metrics = {}
        self._jsonl = None
        self._wandb = None
        # Multi-host: only process 0 opens a run / writes metrics (the
        # reference's @on_rank_0 on its logger calls, utils/horovod.py:38-44);
        # other ranks keep a fully-silent logger object.
        import jax
        self.is_writer = jax.process_index() == 0
        if not self.is_writer:
            return
        if not dry_run:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(name=name or None, dir=dir or None,
                           entity=entity or None, project=project or None,
                           tags=tags or [])
            except Exception:
                self._wandb = None
        if self._wandb is None:
            log_dir = dir or '.'
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')

    @property
    def run_url(self):
        if self._wandb is not None:
            return self._wandb.run.get_url()
        return ''

    def log_config(self, config):
        if self._wandb is not None:
            self._wandb.config.update(
                config.to_dict() if hasattr(config, 'to_dict') else config,
                allow_val_change=True)

    def log_metrics(self, metrics, global_step=None):
        """Buffer metrics; flush when a global_step arrives
        (reference ``wandb_logger.py:126-131``)."""
        if not self.is_writer:
            return
        self._metrics.update({k: float(v) for k, v in metrics.items()})
        if global_step is not None:
            self._metrics['global_step'] = int(global_step)
            self._flush()

    def _flush(self):
        if not self._metrics:
            return
        if self._wandb is not None:
            self._wandb.log(self._metrics)
        elif self._jsonl is not None:
            self._metrics['ts'] = time.time()
            self._jsonl.write(json.dumps(self._metrics) + '\n')
            self._jsonl.flush()
        self._metrics = {}

    def log_depth(self, batch, output, num_logs=5, prefix='train'):
        """Log rgb / inv-depth / gt images at intervals
        (reference ``wandb_logger.py:133-172``)."""
        if self._wandb is None:
            return
        import numpy as np
        from mindtheedge_tpu.utils.save import viz_inv_depth
        images = []
        rgb = np.asarray(batch['rgb'][0])
        images.append(self._wandb.Image(rgb, caption=f'{prefix}/rgb'))
        if 'inv_depths' in output:
            inv = np.asarray(output['inv_depths'][0][0, ..., 0])
            images.append(self._wandb.Image(viz_inv_depth(inv),
                                            caption=f'{prefix}/inv_depth'))
        self._wandb.log({f'{prefix}/images': images})

    def finish(self):
        self._flush()
        if self._wandb is not None:
            self._wandb.finish()
        if self._jsonl is not None:
            self._jsonl.close()
