"""Shared result containers for algorithm simulators.

``RunResult`` mirrors the richer return type of the reference's exact
module (exact_ftl.py:217-222) so users of the reference find the same
fields here; all simulators in this package can report through it.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RunResult:
    """Outcome of one simulated online run (or a batch of runs).

    Fields hold scalars for single runs and arrays with leading batch axes
    for batched/vmapped runs — the dataclass is a registered pytree so it
    passes transparently through jit/vmap/shard_map.
    """

    cum_loss: Any
    regret: Any
    comp_loss: Any
    x_last: Any
