"""mhm2_proxy_tpu — a TPU-native metagenome short-read contigging framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the MetaHipMer2
contigging proxy (FASTQ ingest -> paired-read merging -> distributed k-mer
counting -> de Bruijn graph traversal -> contigs), built on a bulk-synchronous
sharded-array model instead of the reference's PGAS RPC model:

- k-mer counting is sort + segmented-reduce over dense arrays (deterministic,
  MXU/VPU friendly) instead of CAS hash-table probing
  (cf. reference src/kcount/kcount_cpu.cpp:205-294).
- the distributed hash table becomes per-shard sorted key arrays partitioned by
  minimizer hash (cf. reference src/kcount/kmer_dht.cpp:193-196), exchanged via
  shard_map all-to-all over a jax.sharding.Mesh.
- de Bruijn traversal becomes reciprocal-edge path decomposition with batched
  neighbor lookups + pointer jumping, converting the reference's latency-bound
  RPC walks (src/dbjg_traversal.cpp:165-239) into O(log path) bulk steps.

64-bit integer support is required (k-mer words and hashes are uint64); the
package enables jax_enable_x64 at import time.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import constants  # noqa: E402,F401
