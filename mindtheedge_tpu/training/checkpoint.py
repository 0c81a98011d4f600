"""Checkpointing with the reference's contract: config-in-ckpt, top-k,
edge-F1 filenames, periodic retention.

Reference: ``models/model_checkpoint.py`` — each ``.ckpt`` holds
``{config, epoch, state_dict, optimizer, scheduler}`` (``:71-80``); test-time
config is recovered from the checkpoint (``utils/config.py:449-486``); top-k
retention with auto min/max by metric name (``:44-55``); F1 embedded in
filenames (``:125-149``); non-save_freq epochs deleted (``:184-191``).

Format: a single ``.ckpt`` file = pickled dict with numpy pytrees (portable,
single-file, config-embedded — like the torch ``.ckpt``).  Orbax is used for
sharded in-training snapshots when training on a mesh (future work; the
single-file path is the compatibility contract).
"""

import os
import pickle

import numpy as np
import jax


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, config, state, metrics=None):
    """Write a single-file checkpoint."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    payload = {
        'config': config.to_dict() if hasattr(config, 'to_dict') else dict(config),
        'epoch': int(state.epoch),
        'global_step': int(state.step),
        'state_dict': _to_numpy(state.params),
        'batch_stats': _to_numpy(state.batch_stats),
        'optimizer': _to_numpy(state.opt_state),
        'metrics': metrics or {},
        'format_version': 1,
    }
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


def restore_params(ckpt, init_params, strict=False):
    """Prefix/shape-checked partial restore (reference ``utils/load.py:117-166``).

    Loads every leaf whose path exists in both trees with matching shape;
    reports counts.  Returns (params, num_loaded, num_total).
    """
    flat_init = {jax.tree_util.keystr(kp): v for kp, v in
                 jax.tree_util.tree_flatten_with_path(init_params)[0]}
    flat_ckpt = {jax.tree_util.keystr(kp): v for kp, v in
                 jax.tree_util.tree_flatten_with_path(ckpt)[0]}
    loaded = 0
    out = {}
    for key, init_val in flat_init.items():
        if key in flat_ckpt and tuple(flat_ckpt[key].shape) == tuple(init_val.shape):
            out[key] = np.asarray(flat_ckpt[key], dtype=np.asarray(init_val).dtype)
            loaded += 1
        else:
            if strict:
                raise KeyError(f'Missing or shape-mismatched param {key}')
            out[key] = init_val
    # Rebuild the tree
    treedef = jax.tree_util.tree_structure(init_params)
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_flatten_with_path(init_params)[0]]
    leaves = [out[p] for p in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves), loaded, len(paths)


def restore_opt_state(saved, init_opt_state):
    """Graft a checkpointed optimizer pytree onto a freshly-built one.

    The reference restores optimizer + scheduler state wholesale on resume
    (``model_wrapper.py:169-173``); here the optax state (Adam moments,
    schedule step counts) is restored leaf-for-leaf into the structure the
    current optimizer produced.  Falls back to the fresh state (with a
    warning) if the two trees disagree — e.g. resuming under a changed
    freeze mask.  Returns (opt_state, restored: bool).
    """
    import jax
    saved_leaves, saved_def = jax.tree_util.tree_flatten(saved)
    init_leaves, init_def = jax.tree_util.tree_flatten(init_opt_state)
    if len(saved_leaves) != len(init_leaves):
        print(f'WARNING: optimizer state mismatch '
              f'({len(saved_leaves)} vs {len(init_leaves)} leaves); '
              f'resuming with fresh optimizer state')
        return init_opt_state, False
    out = []
    for s, i in zip(saved_leaves, init_leaves):
        s, i = np.asarray(s), np.asarray(i)
        if s.shape != i.shape:
            print(f'WARNING: optimizer leaf shape mismatch {s.shape} vs '
                  f'{i.shape}; resuming with fresh optimizer state')
            return init_opt_state, False
        out.append(s.astype(i.dtype))
    return jax.tree_util.tree_unflatten(init_def, out), True


class ModelCheckpoint:
    """Top-k checkpoint manager (reference ``model_checkpoint.py``)."""

    def __init__(self, filepath, monitor='loss', save_top_k=5, mode='auto',
                 save_freq=5, monitor_index=0, s3_path='', s3_frequency=1,
                 yaml_path=''):
        self.dirpath = filepath
        self.monitor = monitor
        self.save_top_k = save_top_k
        self.save_freq = save_freq
        self.monitor_index = monitor_index
        self.s3_path = s3_path
        self.s3_frequency = s3_frequency
        if mode == 'auto':
            # auto min/max by metric name (model_checkpoint.py:44-55)
            mode = 'max' if any(k in monitor for k in
                                ('acc', 'a1', 'a2', 'a3', 'f1', 'precision',
                                 'recall', 'auc')) else 'min'
        self.mode = mode
        self.best = []   # list of (metric, path, epoch)
        # Multi-host: only process 0 writes (the reference is single-process;
        # this repo's multi-host entry would otherwise have every host racing
        # os.replace on the same path).  Replicated state makes the rank-0
        # checkpoint identical to what any other rank would have written.
        self.is_writer = jax.process_index() == 0
        if not self.is_writer:
            return
        os.makedirs(self.dirpath or '.', exist_ok=True)
        # copy the run yaml beside the checkpoints (model_checkpoint.py:62-64)
        if yaml_path and os.path.isfile(yaml_path):
            import shutil
            shutil.copy(yaml_path,
                        os.path.join(self.dirpath, os.path.basename(yaml_path)))
        self._snapshot_code()

    def _snapshot_code(self):
        """tar the working tree next to the checkpoints
        (model_checkpoint.py:13-22,83-97)."""
        import subprocess
        repo_root = os.path.abspath(
            os.path.join(os.path.dirname(__file__), '..', '..'))
        target = os.path.join(self.dirpath, 'code.tar.gz')
        try:
            subprocess.run(
                ['tar', 'czf', target, '-C', repo_root, 'mindtheedge_tpu',
                 'bench.py', 'pyproject.toml'],
                check=False, capture_output=True, timeout=120)
        except Exception:
            pass

    def _s3_sync(self, path, epoch):
        """Optional S3 sync (model_checkpoint.py:83-97); requires awscli."""
        if not self.s3_path or epoch % max(self.s3_frequency, 1) != 0:
            return
        import subprocess
        try:
            subprocess.run(['aws', 's3', 'cp', path, self.s3_path],
                           check=False, capture_output=True, timeout=600)
        except Exception:
            pass

    def _filename(self, epoch, metrics):
        parts = [f'epoch={epoch:02d}']
        if metrics:
            prec = [v for k, v in metrics.items() if 'precision' in k]
            rec = [v for k, v in metrics.items() if 'recall' in k]
            if prec and rec:
                # edge-F1 in filenames (model_checkpoint.py:125-149)
                p, r = float(np.mean(prec)), float(np.mean(rec))
                f1 = 2 * p * r / max(p + r, 1e-12)
                parts.append(f'f1={f1:.4f}')
            if self.monitor in metrics:
                parts.append(f'{self.monitor.replace("/", "-")}='
                             f'{float(metrics[self.monitor]):.4f}')
        base = '_'.join(parts) + '.ckpt'
        path = os.path.join(self.dirpath, base)
        while os.path.exists(path):   # collision-avoidance (ref :173-175)
            path = path[:-5] + 'b.ckpt'
        return path

    def check_and_save(self, config, state, metrics):
        if not self.is_writer:
            return None
        epoch = int(state.epoch)
        path = self._filename(epoch, metrics)
        save_checkpoint(path, config, state, metrics)
        self._s3_sync(path, epoch)
        value = float(metrics.get(self.monitor, np.nan)) if metrics else np.nan
        self.best.append((value, path, epoch))
        if self.save_top_k and self.save_top_k > 0 and not np.isnan(value):
            reverse = self.mode == 'max'
            ranked = sorted((b for b in self.best if not np.isnan(b[0])),
                            key=lambda t: t[0], reverse=reverse)
            for _, stale, stale_epoch in ranked[self.save_top_k:]:
                # Retention is keyed on the STALE checkpoint's own epoch
                # (reference model_checkpoint.py:184-191 deletes epoch i iff
                # i % save_freq != 0), never the current one.
                if os.path.exists(stale) and stale != path \
                        and (stale_epoch % max(self.save_freq, 1) != 0):
                    os.remove(stale)
                    self.best = [b for b in self.best if b[1] != stale]
        return path
