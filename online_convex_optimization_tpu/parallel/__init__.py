"""Device-mesh scenario parallelism (shard_map sweeps, collectives)."""
