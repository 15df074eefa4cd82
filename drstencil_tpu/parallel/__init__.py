"""Multi-chip spatial domain decomposition (shard_map + ICI halo exchange)."""
