"""ModelCheckpoint top-k retention keys on the STALE checkpoint's own epoch
(reference ``model_checkpoint.py:184-191`` deletes epoch i iff
``i % save_freq != 0``), never the current epoch (VERDICT r2 #7b)."""

import glob
import os

import numpy as np

from mindtheedge_tpu.training.checkpoint import ModelCheckpoint
from mindtheedge_tpu.training.state import TrainState


def _state(epoch):
    return TrainState(params={'depth': {'w': np.zeros(2)}},
                      batch_stats={}, opt_state=(), step=epoch * 10,
                      epoch=epoch)


class _Cfg:
    def to_dict(self):
        return {}


def test_retention_keyed_on_stale_epoch(tmp_path):
    ckpt = ModelCheckpoint(str(tmp_path), monitor='loss', save_top_k=2,
                           mode='min', save_freq=5)
    # losses improve each epoch -> the oldest entries fall out of top-2
    for epoch, loss in [(4, 4.0), (5, 3.0), (6, 2.0), (7, 1.0)]:
        ckpt.check_and_save(_Cfg(), _state(epoch), {'loss': loss})

    kept = sorted(os.path.basename(p)
                  for p in glob.glob(str(tmp_path / '*.ckpt')))
    # epoch 4 fell out of top-2 and 4 % 5 != 0 -> deleted.
    # epoch 5 fell out of top-2 BUT 5 % 5 == 0 (its OWN epoch is on the
    # save_freq grid) -> retained.  Keying retention on the current epoch
    # (7 % 5 != 0) would have deleted it.
    assert not any('epoch=04' in p for p in kept)
    assert any('epoch=05' in p for p in kept)
    assert any('epoch=06' in p for p in kept)
    assert any('epoch=07' in p for p in kept)


def test_current_checkpoint_never_deleted(tmp_path):
    ckpt = ModelCheckpoint(str(tmp_path), monitor='loss', save_top_k=1,
                           mode='min', save_freq=100)
    ckpt.check_and_save(_Cfg(), _state(1), {'loss': 1.0})
    # a WORSE new checkpoint is itself out of top-1, but the just-written
    # file must survive its own save call
    path = ckpt.check_and_save(_Cfg(), _state(2), {'loss': 5.0})
    assert os.path.exists(path)
