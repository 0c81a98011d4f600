"""Multi-host entry: the TPU-native replacement for ``horovod.init()``.

The reference initializes Horovod/MPI at every entry point
(``packnet_code/packnet_sfm/utils/horovod.py:22-30``, called from
``trainers/horovod_trainer.py`` and the train CLI).  On TPU pods the
equivalent is ``jax.distributed.initialize()``: it wires the cross-host
coordination service so ``jax.process_index()/process_count()`` report the
real topology, global devices become addressable for ``jax.sharding.Mesh``
construction spanning hosts, and ``multihost_utils.process_allgather`` (used
by ``utils/reduce.reduce_value``) works.

Called once, before any other JAX API touches the backend, from every CLI
entry (``cli/*.py``).  Detection is conservative — a plain single-host run
(including this repo's tests and the single-chip relay) must stay a no-op:

* explicit: ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES``,
  ``JAX_PROCESS_ID``) set by a launcher;
* automatic: recognized cluster environments (GKE/GCE TPU pod metadata,
  Slurm, Open MPI) where ``jax.distributed.initialize()`` self-configures.
  These are detected by their standard env markers rather than probing
  metadata servers, so laptops and CI never hang on a network call.

``MTE_DISTRIBUTED=0`` force-disables; ``MTE_DISTRIBUTED=1`` force-enables
auto-config (for cluster types jax can detect without env markers).
"""

import os

_initialized = False

_CLUSTER_ENV_MARKERS = (
    'SLURM_JOB_ID',               # Slurm
    'OMPI_COMM_WORLD_SIZE',       # Open MPI
    'MEGASCALE_COORDINATOR_ADDRESS',  # multislice
)


def _multi_worker_env():
    """True only when the environment names MORE THAN ONE worker.  Single-
    worker TPU runtimes (including this repo's relayed chip, which injects
    ``TPU_WORKER_HOSTNAMES=localhost``) must stay single-process."""
    hosts = os.environ.get('TPU_WORKER_HOSTNAMES', '')
    if len([h for h in hosts.split(',') if h.strip()]) > 1:
        return True
    return any(m in os.environ for m in _CLUSTER_ENV_MARKERS)


def maybe_initialize_distributed(verbose=True):
    """Initialize the JAX distributed runtime iff launched multi-host.

    Returns True if the runtime was (or already is) initialized.  Safe to
    call from every CLI: single-host runs return False without touching the
    network.
    """
    global _initialized
    if _initialized:
        return True
    flag = os.environ.get('MTE_DISTRIBUTED', '').strip().lower()
    if flag in ('0', 'false', 'off'):
        return False

    addr = os.environ.get('JAX_COORDINATOR_ADDRESS')
    auto = flag in ('1', 'true', 'on') or _multi_worker_env()
    if addr is None and not auto:
        return False

    import jax
    kwargs = {}
    if addr is not None:
        missing = [k for k in ('JAX_NUM_PROCESSES', 'JAX_PROCESS_ID')
                   if k not in os.environ]
        if missing:
            raise RuntimeError(
                'JAX_COORDINATOR_ADDRESS is set but '
                f'{" and ".join(missing)} {"is" if len(missing) == 1 else "are"}'
                ' missing. Explicit multi-host launch needs all three of '
                'JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID '
                '(or unset JAX_COORDINATOR_ADDRESS for auto-config).')
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']))
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # cluster markers present but jax could not self-configure (e.g. a
        # 1-task Slurm alloc; some jax versions raise RuntimeError): stay
        # single-process rather than crash the CLI
        if addr is not None:
            raise  # explicit launch must not silently degrade
        print(f'Distributed auto-config unavailable ({e}); '
              'running single-process')
        return False
    _initialized = True
    if verbose:
        print(f'Distributed: process {jax.process_index()}/'
              f'{jax.process_count()}, {jax.local_device_count()} local / '
              f'{jax.device_count()} global devices')
    return True


def is_main_process():
    """Rank-0 gate for logging/checkpoint writes (reference
    ``horovod.py:38-44`` ``rank() == 0``)."""
    import jax
    return jax.process_index() == 0
