"""Application driver (reference src/main.cpp + src/mhm2.py launcher roles).

Flow mirrors main() (main.cpp:64-241): option load, output-dir setup, config
save, read merge+pack, per-k contigging rounds with checkpoint files, final
assembly dump and stats. Restart semantics follow the reference
(docs/mhm_guide.md:197-210): with --restart, rounds whose contigs-<k>.fasta
checkpoint exists are skipped and their contigs reloaded, resuming at the
first missing round.
"""

from __future__ import annotations

import os
import sys
import time

from .models.assembler import Assembler, AssemblerConfig, Contig
from .io.fasta import read_fasta
from .options import Options, parse_args, setup_output_dir
from .utils.logger import get_logger
from .utils.memlog import MemoryTracker


def load_checkpoint_contigs(fname: str) -> list[Contig]:
    out = []
    for name, seq in read_fasta(fname):
        parts = name.split()
        cid = int(parts[0].replace("Contig", "")) if parts else 0
        depth = float(parts[1]) if len(parts) > 1 else 1.0
        out.append(Contig(cid, seq, depth))
    return out


def _infer_contigs_k(fname: str) -> int:
    """k of a contigs-<k>.fasta checkpoint filename; 0 if not inferable."""
    import re

    m = re.search(r"contigs-(\d+)\.fasta(\.gz)?$", os.path.basename(fname))
    return int(m.group(1)) if m else 0


def log_module(log, name: str, secs: float):
    """[module] timing line; multi-process runs aggregate min/avg/max across
    processes (reference MinSumMax reductions, upcxx-utils/timers.hpp:42-161)."""
    import jax

    if jax.process_count() > 1:
        from .parallel import min_sum_max

        s = min_sum_max(secs)
        log.info(
            f"[module] {name} {s['avg']:.2f}s "
            f"(min {s['min']:.2f} max {s['max']:.2f} over {s['n']} procs)"
        )
    else:
        log.info(f"[module] {name} {secs:.2f}s")


def run_pipeline(opts: Options) -> Assembler:
    out_dir = setup_output_dir(opts)
    log = get_logger(log_file=os.path.join(out_dir, "mhm2_tpu.log"), verbose=opts.verbose)
    opts.save(os.path.join(out_dir, "mhm2_tpu.config"))
    log.info(f"Starting mhm2_tpu in {out_dir} with k={opts.kmer_lens}")

    cfg = AssemblerConfig(
        kmer_lens=tuple(opts.kmer_lens),
        qual_offset=opts.qual_offset,
        dmin_thres=opts.min_depth_thres,
        min_ctg_print_len=opts.min_ctg_print_len,
        block_reads=opts.block_reads,
        bucket_cap=opts.bucket_cap or None,
        checkpoint=opts.checkpoint,
        output_dir=out_dir,
        n_shards=opts.shards,
        n_hosts=opts.hosts,
        verbose=opts.verbose,
        dump_kmers=opts.dump_kmers,
    )
    asm = Assembler(cfg)
    tracker = MemoryTracker(os.path.join(out_dir, "memory_tracker.log"))
    tracker.start()
    try:
        t0 = time.time()
        merged_ckpt = os.path.join(out_dir, "reads-merged.fastq.gz")
        reloaded_merged = opts.restart and os.path.exists(merged_ckpt)
        if reloaded_merged:
            # reference --restart consumes the merged-reads checkpoint
            # (already merged AND includes any unpaired inputs) instead of
            # re-merging (docs/mhm_guide.md:197-210)
            asm.load_merged_reads(merged_ckpt)
            log.info("[restart] reloaded merged reads checkpoint")
        else:
            asm.load_reads(list(opts.reads))
            if opts.unpaired:
                from .io.fastq import FastqReader

                for fname in opts.unpaired:
                    r = FastqReader(fname)
                    asm.add_unpaired(r.seqs, r.quals)
        log_module(log, "merge_reads", time.time() - t0)
        if opts.checkpoint_merged and not reloaded_merged:
            asm.dump_merged_reads(merged_ckpt)
            log.info("[checkpoint] wrote reads-merged.fastq.gz")

        if opts.post_asm_only:
            # reference --post-asm-only (docs/mhm_guide.md:226-233): take the
            # existing final assembly in the output dir and run only the
            # requested post-assembly steps on it
            fa = os.path.join(out_dir, "final_assembly.fasta")
            if not os.path.exists(fa):
                raise FileNotFoundError(f"--post-asm-only needs {fa}")
            asm.contigs = load_checkpoint_contigs(fa)
            log.info(f"[post-asm-only] loaded {len(asm.contigs)} contigs from {fa}")
        prev_k = 0
        if opts.contigs and not opts.post_asm_only:
            # mid-pipeline restart from an EXTERNAL contig checkpoint
            # (reference -c/--contigs + --prev-kmer-len,
            # docs/mhm_guide.md:285-309): the file becomes the most recent
            # checkpoint; rounds at or below its k are already done
            asm.contigs = load_checkpoint_contigs(opts.contigs)
            prev_k = opts.prev_kmer_len or _infer_contigs_k(opts.contigs)
            if not prev_k:
                raise ValueError(
                    f"--contigs {opts.contigs}: cannot infer its k-mer round "
                    "from the filename; pass --prev-kmer-len"
                )
            log.info(
                f"[restart] loaded {len(asm.contigs)} contigs from "
                f"{opts.contigs} (previous round k={prev_k}); resuming at "
                f"the first k > {prev_k}"
            )
        profiled = False
        for k in opts.kmer_lens if not opts.post_asm_only else []:
            if prev_k and k <= prev_k:
                log.info(f"[restart] skipping k={k} (<= --prev-kmer-len {prev_k})")
                continue
            ckpt = os.path.join(out_dir, f"contigs-{k}.fasta")
            if opts.restart and os.path.exists(ckpt):
                asm.contigs = load_checkpoint_contigs(ckpt)
                log.info(f"[restart] skipping k={k}, loaded {len(asm.contigs)} contigs from {ckpt}")
                continue
            t0 = time.time()
            if opts.profile and not profiled:
                import jax

                with jax.profiler.trace(os.path.join(out_dir, "profile")):
                    asm.run_round(k)
                profiled = True
                log.info(f"[profile] trace written to {out_dir}/profile")
            else:
                asm.run_round(k)
            log_module(log, f"contigging k={k}", time.time() - t0)
            if os.environ.get("MHM2_TPU_TEST_CRASH_ROUND") == str(k):
                # fault injection for supervisor tests: die hard AFTER the
                # round's checkpoint is on disk (launcher.py auto-resume)
                os.kill(os.getpid(), 9)

        if not opts.post_asm_only:
            asm.dump_contigs(os.path.join(out_dir, "final_assembly.fasta"))
        if opts.gfa:
            from .io.gfa import write_gfa2

            n_edges = write_gfa2(
                os.path.join(out_dir, "final_assembly.gfa2"),
                [(c.id, c.seq, c.depth) for c in asm.contigs if len(c.seq) >= opts.min_ctg_print_len],
                # --max-kmer-len: a restart that only re-runs smaller k still
                # sizes overlaps by the original run's largest contigging k
                max([opts.max_kmer_len] + list(opts.kmer_lens)),
            )
            log.info(f"[gfa] wrote final_assembly.gfa2 with {n_edges} edges")
        if opts.post_asm_align or opts.post_asm_abundance:
            from .models.post_asm import post_asm_align

            t0 = time.time()
            post_asm_align(
                asm,
                sam_fname=os.path.join(out_dir, "final_assembly.sam")
                if opts.post_asm_align else None,
                abundance_fname=os.path.join(out_dir, "final_assembly_depths.tsv")
                if opts.post_asm_abundance else None,
            )
            log_module(log, "post_asm_align", time.time() - t0)
        asm.print_stats()
        log.info("Finished")
    finally:
        tracker.stop()
    return asm


def main(argv=None):
    # Make JAX_PLATFORMS authoritative: plugin sitecustomize hooks (e.g. the
    # axon TPU tunnel in this environment) can override platform selection at
    # interpreter startup; config.update after import wins.
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat.split(",")[0])
    # persistent compilation cache: round/table shapes repeat across runs
    cache_dir = os.environ.get(
        "MHM2_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".mhm2_tpu_jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # multi-process launch (reference mhm2.py builds the upcxx-run spawn,
    # src/mhm2.py:446-466): coordinates processes over DCN when the launcher
    # exports the rendezvous env vars; scheduler env (SLURM/MPI/PBS/LSF,
    # mhm2.py:107-250) fills them when they are absent
    from .launcher import detect_scheduler_env

    sched = detect_scheduler_env()
    if sched:
        os.environ.update(sched)
    nprocs = os.environ.get("MHM2_TPU_NUM_PROCS")
    if nprocs:
        from .parallel import init_multihost

        init_multihost(
            os.environ["MHM2_TPU_COORDINATOR"],
            int(nprocs),
            int(os.environ["MHM2_TPU_PROC_ID"]),
        )
    opts = parse_args(argv)
    run_pipeline(opts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
