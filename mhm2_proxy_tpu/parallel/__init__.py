from .sharded import ShardedCounter, make_shard_mesh, sharded_lookup  # noqa: F401
