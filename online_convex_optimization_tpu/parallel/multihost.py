"""Multi-host sweep worker: the pod-scale entry point.

On a real TPU pod slice each host runs this module (all with the same
arguments); ``jax.distributed.initialize`` discovers peers from the TPU
environment.  The same code path is smoke-tested without TPUs by spawning
N CPU processes with explicit coordinator arguments and gloo collectives
(tests/test_multihost.py) — exercising true cross-process psum/pmax.

Worker protocol: each process generates ITS OWN scenario shard on device
(data/device.py keys are split per process), runs the batched FTRL game
locally, and only the g(T) max and the (n, sum, sum_sq) regret statistics
cross hosts — O(1) bytes over DCN per sweep, as SURVEY.md §5 prescribes.
"""

from __future__ import annotations

import argparse
import json
from functools import partial
from typing import Optional

import numpy as np


def run_worker(T: int, per_device_batch: int, *, eta0: float,
               seed: int = 0, coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Run one host's share of a global FTRL regret sweep; returns the
    globally reduced statistics (identical on every host)."""
    import jax

    if num_processes is not None and num_processes > 1:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from online_convex_optimization_tpu.data.device import random_game_batch
    from online_convex_optimization_tpu.models.linear import simulate_linear_batch

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("data",))

    # Per-device scenario shards from independent keys (split globally so
    # every device's stream is distinct and reproducible).
    keys = jax.random.split(jax.random.key(seed), n_global)

    @partial(jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P(),
             check_vma=False)
    def sweep(key_shard):
        z, y = random_game_batch(key_shard[0], per_device_batch, T)
        res = simulate_linear_batch(z, y, 0, eta0)
        r = res.regret
        g_max = jax.lax.pmax(jnp.max(r), "data")
        stats = jax.lax.psum(
            jnp.stack([jnp.asarray(r.size, r.dtype), jnp.sum(r),
                       jnp.sum(r * r)]), "data")
        return g_max, stats

    g_max, stats = jax.jit(sweep)(keys)
    g_max = float(np.asarray(g_max))
    n, s, ss = (float(v) for v in np.asarray(stats))
    mean = s / n
    var = max(ss - n * mean * mean, 0.0) / max(n - 1.0, 1.0)
    return {
        "process_id": process_id or 0,
        "n_global_devices": n_global,
        "n_local_devices": n_local,
        "total_scenarios": int(n),
        "g_max": g_max,
        "mean_regret": mean,
        "sem": float(np.sqrt(var / n)),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="multi-host OCO sweep worker")
    p.add_argument("--t", type=int, default=256)
    p.add_argument("--per-device-batch", type=int, default=1024)
    p.add_argument("--eta0", type=float, default=float(np.sqrt(2.0)))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)
    out = run_worker(args.t, args.per_device_batch, eta0=args.eta0,
                     seed=args.seed, coordinator=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
