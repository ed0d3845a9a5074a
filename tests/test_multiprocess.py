"""True multi-process (2 hosts x 4 devices) end-to-end equivalence.

Spawns two Python processes that coordinate via jax.distributed (the DCN
analog on CPU), each ingesting its own byte range of a shared FASTQ, counting
through the hierarchical two-stage exchange, traversing, and cooperatively
writing one FASTA. Output must equal a single-host assembly of the same reads
— the reference's rank-count-independence property (SURVEY.md §4.3).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

from mhm2_proxy_tpu.io.fastq import write_fastq
from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_assembly_equals_single(tmp_path, rng):
    genome = random_genome(rng, 1200)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=10.0, read_len=72, err_rate=0.0)
    fastq = str(tmp_path / "reads.fastq")
    write_fastq(fastq, ids, seqs, quals)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), fastq, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    # both processes computed identical global contigs
    c0 = json.load(open(tmp_path / "contigs-0.json"))
    c1 = json.load(open(tmp_path / "contigs-1.json"))
    assert c0 == c1 and len(c0) > 0

    # per-process log fan-out (utils/logger.py, reference log.cpp:281-313):
    # rank 0 writes the main log; EVERY rank writes a per_rank debug log
    assert (tmp_path / "mhm2_tpu.log").exists()
    for r in range(2):
        rank_log = tmp_path / "per_rank" / "00000000" / f"{r:08d}" / "mhm2_tpu.log"
        assert rank_log.exists(), rank_log
        body = rank_log.read_text()
        assert f"worker {r}/2 up" in body and "per-rank debug stream" in body

    # single-host oracle over the same reads
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph
    from mhm2_proxy_tpu.models.assembler import _lists_to_block
    from mhm2_proxy_tpu.constants import QUAL_CUTOFF

    k = 21
    store = KmerCountStore(k)
    codes, q, lens = _lists_to_block(seqs, quals, 32, 33)
    store.add_reads_block(codes, q >= 33 + QUAL_CUTOFF, lens)
    exp = sorted(traverse_debruijn_graph(store.finalize(), k))
    assert [s for s, _ in c0] == [s for s, _ in exp]
    got_d = np.array([d for _, d in c0])
    exp_d = np.array([d for _, d in exp])
    assert np.allclose(got_d, exp_d)

    # the cooperative FASTA write produced every contig exactly once
    from mhm2_proxy_tpu.io.fasta import read_fasta

    fa = sorted(seq for _, seq in read_fasta(str(tmp_path / "final_assembly.fasta")))
    assert fa == sorted(s for s, _ in exp)


def test_two_process_two_file_assembly_equals_single(tmp_path, rng):
    """Two-file f1:f2 ingest across processes: byte ranges are aligned to a
    common PAIR boundary per file (different record byte sizes between the
    files), mate validation on, read-id disjointness checked — and the
    distributed assembly equals the single-host one."""
    genome = random_genome(rng, 1500)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=10.0, read_len=80, err_rate=0.0)
    # mate-2 records trimmed shorter so the two files have different record sizes
    f1, f2 = str(tmp_path / "p_1.fastq"), str(tmp_path / "p_2.fastq")
    write_fastq(f1, ids[0::2], seqs[0::2], quals[0::2])
    write_fastq(f2, ids[1::2], [s[:64] for s in seqs[1::2]],
                [q[:64] for q in quals[1::2]])
    paired = f"{f1}:{f2}"

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), paired, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    c0 = json.load(open(tmp_path / "contigs-0.json"))
    c1 = json.load(open(tmp_path / "contigs-1.json"))
    assert c0 == c1 and len(c0) > 0

    # single-host oracle: same Assembler ingest (merge + ids), same counting
    from mhm2_proxy_tpu.kcount import KmerCountStore
    from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph
    from mhm2_proxy_tpu.models.assembler import Assembler, AssemblerConfig
    from mhm2_proxy_tpu.constants import QUAL_CUTOFF

    k = 21
    asm = Assembler(AssemblerConfig(kmer_lens=(k,), block_reads=64))
    asm.load_reads([paired])
    store = KmerCountStore(k)
    for codes, q, lens in asm.packed_reads.blocks(64, min_len=k):
        store.add_reads_block(codes, q >= 33 + QUAL_CUTOFF, lens)
    exp = sorted(traverse_debruijn_graph(store.finalize(), k))
    assert [s for s, _ in c0] == [s for s, _ in exp]
