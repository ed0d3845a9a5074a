#!/usr/bin/env python3
"""Post-assembly alignment/abundance gate (reference --post-asm-align surface,
/root/reference/docs/mhm_guide.md:211-233).

Validates the two post-asm artifacts the guide documents:

  final_assembly.sam         one record per read, SAM v1.6 + NM/AS tags
  final_assembly_depths.tsv  jgi_summarize-style contigName/contigLen/
                             totalAvgDepth table for binning

Checks are two-tier:
  1. STRUCTURAL (always): every mapped record's RNAME exists in the header,
     POS lands inside the contig, the CIGAR consumes exactly the read length,
     and for pure-match CIGARs the mismatch count recomputed from the contig
     sequence equals the NM tag (an SSW regression that shifts positions or
     miscounts edits fails here, not in a threshold).
  2. METRIC GOLDEN (--golden): mapped fraction, NM rate, abundance totals
     diffed within --threshold, same engine as check_asm_quality.py.
"""

from __future__ import annotations

import argparse
import re
import sys

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def parse_sam(fname: str):
    header_len = {}
    records = []
    with open(fname) as f:
        for line in f:
            if line.startswith("@"):
                if line.startswith("@SQ"):
                    fields = dict(
                        kv.split(":", 1) for kv in line.strip().split("\t")[1:]
                    )
                    header_len[fields["SN"]] = int(fields["LN"])
                continue
            records.append(line.rstrip("\n").split("\t"))
    return header_len, records


def structural_check(header_len, records, contig_seqs, max_reconstruct=500):
    """Assert SAM invariants; returns (n_mapped, nm_sum, bases_mapped)."""
    n_mapped = 0
    nm_sum = 0
    bases = 0
    reconstructed = 0
    for rec in records:
        flag = int(rec[1])
        if flag & 4:
            assert rec[2] == "*" and rec[3] == "0", f"unmapped with RNAME/POS: {rec[:4]}"
            continue
        rname, pos, cig, seq = rec[2], int(rec[3]), rec[5], rec[9]
        assert rname in header_len, f"RNAME {rname} not in header"
        assert 1 <= pos <= header_len[rname], f"POS {pos} outside {rname}"
        ops = _CIG_RE.findall(cig)
        assert ops and sum(len(x) for x in cig) == sum(
            len(n) + 1 for n, _ in ops
        ), f"bad CIGAR {cig}"
        q_consumed = sum(int(n) for n, op in ops if op in "MIS=X")
        assert q_consumed == len(seq), f"CIGAR {cig} consumes {q_consumed} != {len(seq)}"
        r_consumed = sum(int(n) for n, op in ops if op in "MDN=X")
        assert pos - 1 + r_consumed <= header_len[rname], (
            f"alignment overruns {rname}: {pos}+{r_consumed}"
        )
        nm = 0
        for field in rec[11:]:
            if field.startswith("NM:i:"):
                nm = int(field[5:])
        n_mapped += 1
        nm_sum += nm
        bases += len(seq)
        # recompute NM against the contig for gap-free CIGARs (S/=/X only —
        # the vast majority at 0.2-0.4% read error): every `=` segment must
        # match the contig exactly, every `X` base must differ, and the X
        # total must equal the NM tag. Only contigs present in the dumped
        # FASTA (>= min-ctg-print-len) have sequence available; the SAM
        # header also carries the short ones.
        if reconstructed < max_reconstruct and rname in contig_seqs and all(
            op in "S=X" for _, op in ops
        ):
            q = 0
            r = pos - 1
            mism = 0
            cseq = contig_seqs[rname]
            for n, op in ops:
                n = int(n)
                if op == "S":
                    q += n
                    continue
                same = sum(1 for j in range(n) if seq[q + j] == cseq[r + j])
                if op == "=":
                    assert same == n, (
                        f"`=` segment differs from contig ({rec[0]} @ "
                        f"{rname}:{pos} {cig})"
                    )
                else:
                    mism += n - 0
                    assert same == 0, (
                        f"`X` segment matches contig ({rec[0]} @ "
                        f"{rname}:{pos} {cig})"
                    )
                q += n
                r += n
            assert mism == nm, (
                f"NM mismatch: recomputed {mism} vs tag {nm} ({rec[0]} @ "
                f"{rname}:{pos} {cig})"
            )
            reconstructed += 1
    assert reconstructed > 0 or n_mapped == 0, "no record could be reconstructed"
    return n_mapped, nm_sum, bases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sam", required=True)
    ap.add_argument("--depths", required=True)
    ap.add_argument("--assembly", required=True)
    ap.add_argument("--golden")
    ap.add_argument("--threshold", type=float, default=0.02)
    args = ap.parse_args()

    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from check_asm_quality import compare, load_metrics_file
    from mhm2_proxy_tpu.io.fasta import read_fasta

    # the SAM header carries EVERY contig (reads align to short ones too);
    # the dumped FASTA holds only those >= min-ctg-print-len — a subset
    contigs = {hdr.split()[0]: seq for hdr, seq in read_fasta(args.assembly)}
    header_len, records = parse_sam(args.sam)
    missing = set(contigs) - set(header_len)
    assert not missing, f"assembly contigs absent from @SQ: {sorted(missing)[:5]}"
    for name, seq in contigs.items():
        assert header_len[name] == len(seq), (
            f"{name} LN {header_len[name]} != {len(seq)}"
        )
    n_mapped, nm_sum, bases = structural_check(header_len, records, contigs)

    depth_rows = []
    with open(args.depths) as f:
        head = f.readline().strip().split("\t")
        assert head == ["contigName", "contigLen", "totalAvgDepth"], head
        for line in f:
            name, ln, d = line.split("\t")
            depth_rows.append((name, int(ln), float(d)))
    assert len(depth_rows) == len(header_len), "depths rows != SAM @SQ count"
    depth_weighted = sum(ln * d for _, ln, d in depth_rows)

    m = {
        "sam_records": len(records),
        "mapped_frac": round(n_mapped / max(len(records), 1), 4),
        "nm_per_100bp": round(100.0 * nm_sum / max(bases, 1), 3),
        "abundance_contigs": len(depth_rows),
        "mean_depth": round(
            sum(d for _, _, d in depth_rows) / max(len(depth_rows), 1), 3
        ),
        # aligned bases recovered from the depth table; must track the SAM
        "depth_weighted_bases_ratio": round(depth_weighted / max(bases, 1), 4),
    }
    for k, v in m.items():
        print(f"{k} = {v}")
    if not args.golden:
        return 0
    errs = compare(m, load_metrics_file(args.golden), args.threshold)
    if errs:
        print("POST-ASM CHECK FAILED:", file=sys.stderr)
        for e in errs:
            print("  " + e, file=sys.stderr)
        return 1
    print(f"POST-ASM CHECK PASSED (threshold {args.threshold:.1%})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
