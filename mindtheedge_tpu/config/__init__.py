"""Config system: yacs-compatible tree + train/test file parsing.

Reference behaviour: ``packnet_code/packnet_sfm/utils/config.py:209-510``
(yaml/ckpt parsing, ckpt-embedded config merging, dataset list broadcasting,
run naming, resume scanning).
"""

import os
from datetime import datetime

from mindtheedge_tpu.config.node import ConfigNode
from mindtheedge_tpu.config.defaults import get_cfg_defaults


def prep_dataset(cfg):
    """Broadcast per-dataset list entries to the number of datasets.

    Reference: ``utils/config.py:16-47`` (``prep_dataset``).
    """
    n = len(cfg.path)
    for key in ['dataset', 'split', 'depth_type', 'input_depth_type', 'cameras', 'repeat']:
        if key in cfg:
            val = cfg[key]
            if not isinstance(val, (list, tuple)):
                val = [val]
            if len(val) == 0:
                val = [''] if key != 'cameras' else [[]]
            if len(val) < n:
                val = list(val) + [val[-1]] * (n - len(val))
            cfg[key] = list(val)[:max(n, len(val))]
    return cfg


def prepare_config(cfg):
    """Post-process a merged config (dataset broadcasting, run name)."""
    for mode in ['train', 'validation', 'test']:
        prep_dataset(cfg.datasets[mode])
    if not cfg.name:
        cfg.name = datetime.now().strftime('%Y-%m-%d_%Hh%Mm%Ss')
    cfg.prepared = True
    return cfg


def parse_train_file(path, overrides=None):
    """Parse a training file (.yaml config or .ckpt checkpoint to resume).

    Returns ``(config, ckpt_path_or_None)``.
    Reference: ``utils/config.py:209-253`` (``parse_train_file``).
    """
    assert path.endswith(('.yaml', '.yml', '.ckpt')), \
        'Train file must be a .yaml config or a .ckpt checkpoint'
    if path.endswith('.ckpt'):
        from mindtheedge_tpu.training.checkpoint import load_checkpoint
        ckpt = load_checkpoint(path)
        cfg = get_cfg_defaults()
        cfg.merge_from_other_cfg(ckpt['config'])
        if overrides:
            cfg.merge_from_list(overrides)
        return prepare_config(cfg), path

    cfg = get_cfg_defaults()
    cfg.merge_from_file(path)
    cfg.config = path
    if overrides:
        cfg.merge_from_list(overrides)
    cfg = prepare_config(cfg)
    # Resume scan: if the checkpoint dir for this run already holds
    # checkpoints, resume from the newest (reference ``utils/config.py:277-297``
    # keys this on the LSF job id; we key it on the run's checkpoint dir).
    resume_ckpt = None
    ckpt_dir = cfg.checkpoint.filepath
    if ckpt_dir and os.path.isdir(ckpt_dir):
        ckpts = sorted(
            (f for f in os.listdir(ckpt_dir) if f.endswith('.ckpt')),
            key=lambda f: os.path.getmtime(os.path.join(ckpt_dir, f)))
        if ckpts:
            resume_ckpt = os.path.join(ckpt_dir, ckpts[-1])
    return cfg, resume_ckpt


def parse_test_file(ckpt_path, yaml_path=None, overrides=None):
    """Parse a test checkpoint (+ optional yaml override).

    The checkpoint's embedded config is recovered and merged under the yaml,
    mirroring reference ``utils/config.py:354-486``.
    Returns ``(config, state_dict)``.
    """
    assert ckpt_path.endswith('.ckpt'), 'Test file must be a .ckpt checkpoint'
    from mindtheedge_tpu.training.checkpoint import load_checkpoint
    ckpt = load_checkpoint(ckpt_path)

    cfg = get_cfg_defaults()
    if 'config' in ckpt and ckpt['config']:
        cfg.merge_from_other_cfg(ckpt['config'])
    if yaml_path is not None:
        cfg.merge_from_file(yaml_path)
        cfg.config = yaml_path
    if overrides:
        cfg.merge_from_list(overrides)
    cfg.checkpoint.filepath = ckpt_path
    cfg = prepare_config(cfg)
    return cfg, ckpt


__all__ = [
    'ConfigNode', 'get_cfg_defaults', 'prepare_config',
    'parse_train_file', 'parse_test_file', 'prep_dataset',
]
