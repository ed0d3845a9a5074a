#!/usr/bin/env python3
"""Assembly quality checker (reference ci/check_asm_quality.py analog).

The reference downloads an ArcticSynth sample and diffs metaquast metrics
against golden files within a threshold (1% single sample, 2% coassembly).
With no network access, we generate a deterministic synthetic metagenome
(ci/make_sample.py), assemble it, compute metaquast-style metrics against the
known reference genomes, and diff each metric against a golden file within
--threshold (default 0.01 relative).

Metrics: contigs counts/lengths (N50/L50/largest/total), genome fraction
(reference 31-mers covered by contigs), duplication ratio, mismatch rate
estimated from contig-vs-genome anchor alignment, and a misassembly count
(split-contig anchor check: consecutive contig anchors must map to the same
genome, same orientation, at consistent offsets — the metaquast-misassembly
analog, reference ci/good-arctic-sample0.txt:24).
"""

from __future__ import annotations

import argparse
import sys


def misassembly_stats(contigs: list[str], genomes: list[str], K: int = 31,
                      anchor_step: int = 200, tol: int = 50, min_len: int = 500,
                      local_max: int = 1000) -> dict:
    """Anchor-consistency misassembly classification (metaquast analog).

    Anchors are unique reference K-mers sampled every anchor_step bases along
    each contig. Consecutive anchor pairs are classified following metaquast's
    extensive/local split (reference golden rows 24 and 27,
    /root/reference/ci/good-arctic-sample0.txt:24,27):

    - different genome or flipped orientation, or offset drift > local_max
      -> **misassembly** (relocation/translocation/inversion analog);
    - offset drift in (tol, local_max] -> **local misassembly**;
    - offset drift in (0, tol] -> **indel event** (small gap vs the
      reference; metaquast's "# indels per 100 kbp" numerator analog).
    """
    from mhm2_proxy_tpu.oracle.pyref import revcomp_str

    index: dict[str, tuple | None] = {}
    for gi, g in enumerate(genomes):
        for i in range(len(g) - K + 1):
            km = g[i : i + K]
            ckm = min(km, revcomp_str(km))
            index[ckm] = None if ckm in index else (gi, i, ckm == km)
    mis = local = indels = 0
    for c in contigs:
        if len(c) < min_len:
            continue
        anchors = []
        for i in range(0, len(c) - K + 1, anchor_step):
            km = c[i : i + K]
            ckm = min(km, revcomp_str(km))
            hit = index.get(ckm)
            if hit is not None:
                gi, p, g_fwd = hit
                anchors.append((i, gi, p, (km == ckm) == g_fwd))
        for (i1, g1, p1, f1), (i2, g2, p2, f2) in zip(anchors, anchors[1:]):
            if g1 != g2 or f1 != f2:
                mis += 1
                continue
            delta = (p2 - p1) if f1 else (p1 - p2)
            drift = abs(delta - (i2 - i1))
            if drift > local_max:
                mis += 1
            elif drift > tol:
                local += 1
            elif drift > 0:
                indels += 1
    return {"misassemblies": mis, "local_misassemblies": local,
            "indel_events": indels}


def contig_metrics(contigs: list[str], genomes: list[str], min_len: int = 500):
    from mhm2_proxy_tpu.oracle.pyref import revcomp_str

    contigs = [c for c in contigs if len(c) >= min_len]
    lens = sorted((len(c) for c in contigs), reverse=True)
    total = sum(lens)
    n50 = l50 = n75 = l75 = 0
    acc = 0
    for i, ln in enumerate(lens):
        acc += ln
        if not n50 and acc >= total / 2:
            n50, l50 = ln, i + 1
        if acc >= total * 3 / 4:
            n75, l75 = ln, i + 1
            break

    K = 31
    ref_kmers = {}
    for g in genomes:
        gg = g + "$" + revcomp_str(g)
        for i in range(len(g) - K + 1):
            km = g[i : i + K]
            ref_kmers[min(km, revcomp_str(km))] = False
    aligned_bases = 0
    mismatch_proxy = 0
    unaligned_length = 0
    n_bases = 0
    for c in contigs:
        n_bases += c.count("N") + c.count("n")
        hits = 0
        for i in range(len(c) - K + 1):
            km = c[i : i + K]
            km = min(km, revcomp_str(km))
            if km in ref_kmers:
                ref_kmers[km] = True
                hits += 1
        aligned_bases += hits
        # contig kmers absent from every genome ~ mismatch neighborhoods
        mismatch_proxy += (len(c) - K + 1) - hits
        # metaquast "unaligned length" analog: contigs with no reference
        # K-mer at all contribute their full length
        if hits == 0:
            unaligned_length += len(c)
    covered = sum(1 for v in ref_kmers.values() if v)
    genome_fraction = 100.0 * covered / max(len(ref_kmers), 1)
    dup_ratio = aligned_bases / max(covered, 1)
    mis = misassembly_stats(contigs, genomes, min_len=min_len)

    return {
        "num_contigs": len(contigs),
        "total_length": total,
        "largest_contig": lens[0] if lens else 0,
        "n50": n50,
        "l50": l50,
        "n75": n75,
        "l75": l75,
        "genome_fraction": round(genome_fraction, 3),
        "duplication_ratio": round(dup_ratio, 4),
        "unaligned_kmers_per_100kbp": round(1e5 * mismatch_proxy / max(total, 1), 2),
        "unaligned_length": unaligned_length,
        "ns_per_100kbp": round(1e5 * n_bases / max(total, 1), 2),
        "misassemblies": mis["misassemblies"],
        "local_misassemblies": mis["local_misassemblies"],
        "indels_per_100kbp": round(1e5 * mis["indel_events"] / max(total, 1), 2),
    }


def load_metrics_file(fname: str) -> dict:
    out = {}
    with open(fname) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = float(v)
    return out


def compare(got: dict, golden: dict, threshold: float) -> list[str]:
    errs = []
    for key, gv in golden.items():
        if key not in got:
            errs.append(f"missing metric {key}")
            continue
        cv = float(got[key])
        denom = max(abs(gv), 1e-9)
        if abs(cv - gv) / denom > threshold:
            errs.append(f"{key}: got {cv} vs golden {gv} (drift {abs(cv-gv)/denom:.3%})")
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assembly", required=True, help="final_assembly.fasta")
    ap.add_argument("--genomes", nargs="+", required=True, help="reference genome FASTAs")
    ap.add_argument("--golden", help="golden metrics file; omit to print metrics")
    ap.add_argument("--threshold", type=float, default=0.01)
    args = ap.parse_args()

    import os, sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from mhm2_proxy_tpu.io.fasta import read_fasta

    contigs = [seq for _, seq in read_fasta(args.assembly)]
    genomes = []
    for g in args.genomes:
        genomes.extend(seq for _, seq in read_fasta(g))
    m = contig_metrics(contigs, genomes)
    for k, v in m.items():
        print(f"{k} = {v}")
    if not args.golden:
        return 0
    errs = compare(m, load_metrics_file(args.golden), args.threshold)
    if errs:
        print("QUALITY CHECK FAILED:", file=sys.stderr)
        for e in errs:
            print("  " + e, file=sys.stderr)
        return 1
    print(f"QUALITY CHECK PASSED (threshold {args.threshold:.1%})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
