"""Multi-process worker: one simulated host of a 2-host CPU run.

Spawned by test_multiprocess.py with argv = (pid, n_procs, port, fastq,
outdir). Exercises the full multi-host flow the reference runs across nodes:
per-host byte-range FASTQ ingest (fastq.cpp:399-455), hierarchical counting
over a ("dcn","ici") mesh (three_tier_aggr_store.hpp:289-316), sharded
traversal, and the N-hosts-one-file FASTA write (ofstream.cpp:113-202).
"""

import json
import os
import sys


def main():
    pid, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    fastq, outdir = sys.argv[4], sys.argv[5]
    # the launcher exports these in real runs; the logger keys its per-rank
    # fan-out (utils/logger.py, reference log.cpp:281-313) off them
    os.environ["MHM2_TPU_PROC_ID"] = str(pid)
    os.environ["MHM2_TPU_NUM_PROCS"] = str(n_procs)

    # small per-process device count: the CI box has 2 cores shared by all
    # simulated hosts, and XLA compile cost scales with the SPMD program size
    local_dev = int(os.environ.get("MHM2_TPU_TEST_LOCAL_DEVICES", "2"))
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_dev}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from mhm2_proxy_tpu.parallel import (
        HierarchicalCounter,
        check_read_id_disjointness,
        init_multihost,
        make_host_mesh,
        write_fasta_multihost,
    )
    from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph_sharded
    from mhm2_proxy_tpu.io.fastq import FastqReader
    from mhm2_proxy_tpu.models.assembler import Assembler, AssemblerConfig, _lists_to_block
    from mhm2_proxy_tpu.constants import QUAL_CUTOFF

    init_multihost(f"localhost:{port}", n_procs, pid)
    assert jax.process_count() == n_procs
    mesh = make_host_mesh()  # (n_procs hosts) x (local_dev devices)

    from mhm2_proxy_tpu.utils.logger import get_logger

    log = get_logger(log_file=os.path.join(outdir, "mhm2_tpu.log"))
    log.info(f"worker {pid}/{n_procs} up: mesh {mesh.devices.shape}")
    log.debug(f"worker {pid}: per-rank debug stream")

    k = 21
    qual_offset = 33
    B_loc = 64
    counter = HierarchicalCounter(k, mesh, bucket_cap=8192)

    if ":" in fastq:
        # two-file paired ingest: per-rank byte ranges aligned to a common
        # PAIR boundary (fastq.cpp:310-396 analog) + merge + read ids
        asm = Assembler(AssemblerConfig(kmer_lens=(k,), block_reads=B_loc))
        asm.load_reads([fastq], rank=pid, n_ranks=n_procs)
        # reference's cross-rank read-id disjointness check
        # (merge_reads.cpp:542-570)
        check_read_id_disjointness(asm.packed_reads.id_span())
        # agree on pad width + block count across hosts
        lw = multihost_utils.process_allgather(
            jnp.asarray([asm.packed_reads.max_read_len, len(asm.packed_reads)], jnp.int32)
        )
        lw = np.asarray(lw).reshape(-1, 2)
        L = (int(lw[:, 0].max()) + 31) // 32 * 32
        n_blocks = (int(lw[:, 1].max()) + B_loc - 1) // B_loc
        blocks = list(asm.packed_reads.blocks(B_loc, pad_len=L, min_len=k))
        for b in range(n_blocks):
            if b < len(blocks):
                codes, q, lens = blocks[b]
            else:
                codes = np.full((B_loc, L), 4, np.uint8)
                q = np.zeros((B_loc, L), np.uint8)
                lens = np.zeros((B_loc,), np.int32)
            counter.add_reads_block(codes, q >= qual_offset + QUAL_CUTOFF, lens)
    else:
        # per-host byte-range ingest with record-boundary resync
        rdr = FastqReader(fastq, rank=pid, n_ranks=n_procs)

        # agree on a common block count across hosts (read counts differ by a few)
        n_local = len(rdr.seqs)
        counts = multihost_utils.process_allgather(jnp.asarray([n_local], jnp.int32))
        n_blocks = (int(np.max(counts)) + B_loc - 1) // B_loc

        L = 96  # pad quantum covers the test read length
        for b in range(n_blocks):
            seqs = rdr.seqs[b * B_loc : (b + 1) * B_loc]
            quals = rdr.quals[b * B_loc : (b + 1) * B_loc]
            codes, q, lens = _lists_to_block(seqs, quals, 32, qual_offset, rows=B_loc)
            if codes.shape[1] < L:
                codes = np.pad(codes, ((0, 0), (0, L - codes.shape[1])), constant_values=4)
                q = np.pad(q, ((0, 0), (0, L - q.shape[1])), constant_values=qual_offset)
            qual_ok = q >= qual_offset + QUAL_CUTOFF
            counter.add_reads_block(codes, qual_ok, lens)
    assert counter.dropped == 0
    table = counter.finalize()
    contigs = traverse_debruijn_graph_sharded(table, k)
    contigs = sorted(contigs)

    # coordinated one-file output: each host renders a contiguous slice
    per = (len(contigs) + n_procs - 1) // n_procs
    mine = contigs[pid * per : (pid + 1) * per]
    payload = b"".join(
        f">Contig{pid * per + i} {d:.6f}\n{s}\n".encode() for i, (s, d) in enumerate(mine)
    )
    write_fasta_multihost(os.path.join(outdir, "final_assembly.fasta"), payload, pid, n_procs)

    with open(os.path.join(outdir, f"contigs-{pid}.json"), "w") as f:
        json.dump([[s, d] for s, d in contigs], f)
    n_reads = len(asm.packed_reads) if ":" in fastq else len(rdr.seqs)
    print(f"worker {pid} ok: {n_reads} reads, {len(contigs)} contigs", flush=True)


if __name__ == "__main__":
    main()
