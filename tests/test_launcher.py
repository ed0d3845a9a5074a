"""Supervisor auto-resume (reference mhm2.py:585-597) with fault injection."""

import os
import subprocess
import sys

import pytest

from mhm2_proxy_tpu.launcher import classify_failure, rounds_completed
from mhm2_proxy_tpu.io.fastq import write_fastq
from mhm2_proxy_tpu.io.fasta import read_fasta
from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads


def test_classify_failure():
    assert classify_failure("", -9) == "killed by signal 9 (SIGKILL)"
    assert classify_failure("x\nstd::bad_alloc\n", 1) == "out of memory"
    assert "exception" in classify_failure("ValueError: boom", 1)
    assert classify_failure("fine", 3) == "exit code 3"


def test_rounds_completed(tmp_path):
    open(tmp_path / "contigs-21.fasta", "w").write(">c\nA\n")
    assert rounds_completed(str(tmp_path), (21, 33)) == 1


@pytest.mark.slow
def test_auto_resume_after_mid_run_kill(tmp_path, rng):
    """SIGKILL after round 1 -> supervisor resumes -> output equals an
    uninterrupted run."""
    genome = random_genome(rng, 1500)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=10.0, read_len=70, err_rate=0.0)
    if len(seqs) % 2:
        ids, seqs, quals = ids[:-1], seqs[:-1], quals[:-1]
    fastq = str(tmp_path / "reads.fastq")
    write_fastq(fastq, ids, seqs, quals)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    base = [
        "-r", fastq, "-k", "21", "33", "--block-reads", "64",
        "--min-ctg-print-len", "0",
    ]

    def run_supervised(outdir, crash_round=None):
        e = dict(env)
        if crash_round:
            e["MHM2_TPU_TEST_CRASH_ROUND"] = str(crash_round)
        p = subprocess.run(
            [sys.executable, "-m", "mhm2_proxy_tpu.launcher", *base, "-o", outdir],
            env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", timeout=600,
        )
        return p

    # NOTE: the crash env var persists into the resumed child, but round 21
    # is checkpoint-skipped on restart so the injection never re-fires.
    p = run_supervised(str(tmp_path / "crashed"), crash_round=21)
    assert "auto-resuming with --restart" in p.stdout, p.stdout[-3000:]
    assert p.returncode == 0, p.stdout[-3000:]

    p2 = run_supervised(str(tmp_path / "clean"))
    assert p2.returncode == 0, p2.stdout[-3000:]

    got = sorted(seq for _, seq in read_fasta(str(tmp_path / "crashed" / "final_assembly.fasta")))
    exp = sorted(seq for _, seq in read_fasta(str(tmp_path / "clean" / "final_assembly.fasta")))
    assert got == exp and len(got) > 0


def test_no_resume_when_nothing_completed(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, "-m", "mhm2_proxy_tpu.launcher",
         "-r", str(tmp_path / "missing.fastq"), "-o", str(tmp_path / "out")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo", timeout=300,
    )
    assert p.returncode != 0
    assert "not resuming" in p.stdout


def test_detect_scheduler_env_slurm():
    from mhm2_proxy_tpu.launcher import detect_scheduler_env

    env = {"SLURM_PROCID": "3", "SLURM_NTASKS": "8",
           "SLURM_LAUNCH_NODE_IPADDR": "10.0.0.5"}
    got = detect_scheduler_env(env)
    assert got == {"MHM2_TPU_NUM_PROCS": "8", "MHM2_TPU_PROC_ID": "3",
                   "MHM2_TPU_COORDINATOR": "10.0.0.5:8476"}
    # explicit rendezvous config wins over scheduler detection
    env["MHM2_TPU_NUM_PROCS"] = "2"
    assert detect_scheduler_env(env) is None
    # single-task jobs don't trigger distributed init
    assert detect_scheduler_env({"SLURM_PROCID": "0", "SLURM_NTASKS": "1"}) is None


def test_detect_scheduler_env_mpi_and_lsf():
    from mhm2_proxy_tpu.launcher import detect_scheduler_env

    got = detect_scheduler_env(
        {"OMPI_COMM_WORLD_RANK": "1", "OMPI_COMM_WORLD_SIZE": "4",
         "MHM2_TPU_COORDINATOR": "h0:9999"})
    assert got["MHM2_TPU_PROC_ID"] == "1"
    assert got["MHM2_TPU_COORDINATOR"] == "h0:9999"
    # LSF task ids are 1-based
    got = detect_scheduler_env({"LSF_PM_TASKID": "2", "LSF_PM_NUMPROCS": "4"})
    assert got["MHM2_TPU_PROC_ID"] == "1"
    assert detect_scheduler_env({}) is None
