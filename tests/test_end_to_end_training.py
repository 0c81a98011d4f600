"""End-to-end training integration: synthetic on-disk dataset -> GTADataset
-> transforms -> loader -> Experiment.fit (2 epochs) -> checkpoint -> resume.

This is the full train_edges CLI path (BASELINE config #4) at tiny scale.
"""

import os

import numpy as np
import pytest

from tests.make_synthetic_dataset import make_dataset


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth')
    make_dataset(str(root), n=4, h=64, w=96)
    return str(root)


def _train_config(split, ckpt_dir):
    from mindtheedge_tpu.config import get_cfg_defaults, prepare_config
    cfg = get_cfg_defaults()
    cfg.arch.max_epochs = 2
    cfg.model.name = 'SemiSupEdgeModel'
    cfg.model.depth_net.name = 'PackNetSAN01'
    cfg.model.depth_net.version = '1A'
    cfg.model.loss.supervised_method = 'sparse-silog'
    cfg.model.loss.supervised_num_scales = 1
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.model.loss.edges_depth_edge_loss_all_scales = True
    cfg.model.loss.upsample_depth_maps = False
    cfg.edges.train_depth_edges = True
    cfg.datasets.augmentation.image_shape = (64, 96)
    cfg.datasets.train.batch_size = 2
    cfg.datasets.train.num_workers = 2
    cfg.datasets.train.back_context = 0
    cfg.datasets.train.forward_context = 0
    cfg.datasets.train.dataset = ['GTA']
    cfg.datasets.train.path = ['']
    cfg.datasets.train.split = [split]
    cfg.datasets.train.depth_type = ['groundtruth']
    cfg.datasets.train.input_depth_type = ['velodyne']
    cfg.checkpoint.filepath = ckpt_dir
    cfg.checkpoint.save_top_k = -1
    return prepare_config(cfg)


def test_full_training_run_and_resume(synth_root, tmp_path):
    from mindtheedge_tpu.training.experiment import Experiment
    split = os.path.join(synth_root, 'split.txt')
    ckpt_dir = str(tmp_path / 'ckpts')
    cfg = _train_config(split, ckpt_dir)

    exp = Experiment(cfg)
    state = exp.fit()
    assert int(state.epoch) == 2
    assert int(state.step) == 4          # 4 samples / batch 2 * 2 epochs

    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith('.ckpt')]
    assert len(ckpts) == 2, ckpts

    # resume from the newest checkpoint: epoch continues at 2
    from mindtheedge_tpu.config import parse_train_file
    cfg_yaml = str(tmp_path / 'resume.yaml')
    cfg.save_yaml(cfg_yaml)
    cfg2, resume = parse_train_file(cfg_yaml)
    assert resume is not None and resume.endswith('.ckpt')
    cfg2.arch.max_epochs = 3
    exp2 = Experiment(cfg2, resume_ckpt=resume)
    state2 = exp2.fit()
    assert int(state2.epoch) == 3

    # the checkpoint embeds the config (test-time recovery contract)
    from mindtheedge_tpu.training.checkpoint import load_checkpoint
    ckpt = load_checkpoint(os.path.join(ckpt_dir, sorted(ckpts)[-1]))
    assert ckpt['config']['model']['name'] == 'SemiSupEdgeModel'
    assert 'state_dict' in ckpt and 'optimizer' in ckpt
