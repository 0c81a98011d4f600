"""Multi-host write hygiene: checkpoint + wandb writes are rank-0-only.

The reference is single-process (Horovod trainer vestigial), but its logger
calls are rank-0-gated via ``@on_rank_0`` (``utils/horovod.py:38-44``).  This
repo advertises multi-host entry in every CLI, so on >1 process every host
would otherwise race ``os.replace`` on the same ckpt path and open its own
wandb run.  ``ModelCheckpoint`` and ``WandbLogger`` therefore gate at the
source on ``jax.process_index() == 0``.

Two tiers: a fast monkeypatched test of the gates, and a real 2-process
``jax.distributed`` local CPU cluster (marked slow) asserting exactly one
checkpoint writer and one metrics file across the cluster.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from mindtheedge_tpu.training.state import TrainState


def _dummy_state():
    return TrainState(params={'w': np.zeros(3, np.float32)}, batch_stats={},
                      opt_state={}, step=1, epoch=1)


def test_nonzero_rank_writes_nothing(tmp_path, monkeypatch):
    monkeypatch.setattr(jax, 'process_index', lambda: 1)
    from mindtheedge_tpu.training.checkpoint import ModelCheckpoint
    from mindtheedge_tpu.utils.wandb_logger import WandbLogger

    out = tmp_path / 'ckpts'
    mgr = ModelCheckpoint(filepath=str(out), monitor='loss', save_top_k=1)
    assert mgr.check_and_save({'a': 1}, _dummy_state(), {'loss': 0.5}) is None
    assert not out.exists()   # not even the directory / code.tar.gz

    logger = WandbLogger(dir=str(tmp_path))
    logger.log_metrics({'train/loss': 0.5}, global_step=1)
    logger.finish()
    assert not (tmp_path / 'metrics.jsonl').exists()


def test_rank_zero_still_writes(tmp_path, monkeypatch):
    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    from mindtheedge_tpu.training.checkpoint import ModelCheckpoint
    from mindtheedge_tpu.utils.wandb_logger import WandbLogger

    out = tmp_path / 'ckpts'
    mgr = ModelCheckpoint(filepath=str(out), monitor='loss', save_top_k=1)
    path = mgr.check_and_save({'a': 1}, _dummy_state(), {'loss': 0.5})
    assert path and os.path.exists(path)

    logger = WandbLogger(dir=str(tmp_path))
    logger.log_metrics({'train/loss': 0.5}, global_step=1)
    logger.finish()
    assert (tmp_path / 'metrics.jsonl').exists()


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ['JAX_PLATFORMS'] = 'cpu'
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax
    jax.distributed.initialize(f'localhost:{port}', num_processes=2,
                               process_id=pid)
    import numpy as np
    from mindtheedge_tpu.training.checkpoint import ModelCheckpoint
    from mindtheedge_tpu.training.state import TrainState
    from mindtheedge_tpu.utils.wandb_logger import WandbLogger
    state = TrainState(params={'w': np.zeros(3, np.float32)}, batch_stats={},
                       opt_state={}, step=1, epoch=1)
    mgr = ModelCheckpoint(filepath=outdir, monitor='loss', save_top_k=1)
    path = mgr.check_and_save({'a': 1}, state, {'loss': 0.5})
    logger = WandbLogger(dir=outdir)
    logger.log_metrics({'train/loss': 0.5}, global_step=1)
    logger.finish()
    print('WROTE' if path else 'SKIPPED', jax.process_index(), flush=True)
""")


@pytest.mark.slow
def test_two_process_cluster_single_writer(tmp_path):
    """Real 2-process jax.distributed local cluster: exactly one ckpt writer
    and one metrics.jsonl across the cluster."""
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER)
    out = tmp_path / 'shared'
    out.mkdir()
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH=os.path.abspath(
                   os.path.join(os.path.dirname(__file__), '..')))
    env.pop('JAX_COORDINATOR_ADDRESS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f'worker failed:\n{stdout}\n{stderr}'
        outs.append(stdout)

    joined = ''.join(outs)
    assert 'WROTE 0' in joined and 'SKIPPED 1' in joined, joined
    ckpts = [f for f in os.listdir(out) if f.endswith('.ckpt')]
    assert len(ckpts) == 1, ckpts
    jsonls = [f for f in os.listdir(out) if f == 'metrics.jsonl']
    assert len(jsonls) == 1
    lines = (out / 'metrics.jsonl').read_text().strip().splitlines()
    assert len(lines) == 1, lines
