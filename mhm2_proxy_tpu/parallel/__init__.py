from .sharded import ShardedCounter, make_shard_mesh, sharded_lookup  # noqa: F401
from .multihost import (  # noqa: F401
    HierarchicalCounter,
    make_host_mesh,
    init_multihost,
    check_read_id_disjointness,
    host_byte_ranges,
    min_sum_max,
    write_fasta_multihost,
)
