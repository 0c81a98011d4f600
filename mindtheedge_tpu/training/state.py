"""Train state: parameters, SAN batch stats, optimizer state — one pytree.

Replaces the reference's stateful ``ModelWrapper`` + torch optimizer with an
explicit functional state threaded through a jit/pjit-compiled train step.
"""

from typing import Any, Optional

import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any                 # {'depth': ..., 'pose': ...(optional)}
    batch_stats: Any            # {'depth': ...} or empty dict
    opt_state: Any
    step: int
    epoch: int


def variables_from_state(state):
    """Re-assemble flax variable dicts per network from the train state."""
    variables = {}
    for net, params in state.params.items():
        v = {'params': params}
        if state.batch_stats and net in state.batch_stats:
            v['batch_stats'] = state.batch_stats[net]
        variables[net] = v
    return variables


def split_variables(variables):
    """Inverse of ``variables_from_state``: (params, batch_stats)."""
    params = {net: v['params'] for net, v in variables.items()}
    batch_stats = {net: v['batch_stats'] for net, v in variables.items()
                   if 'batch_stats' in v}
    return params, batch_stats
