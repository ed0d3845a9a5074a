"""Post-assembly read-to-contig alignment (full-MHM2 --post-asm-align parity).

The reference guide documents post-assembly alignment of reads to the final
assembly producing SAM output plus per-contig abundances (depths) for binning
(docs/mhm_guide.md:211-233), backed by the SSW/ADEPT kernels. Here reads are
anchored to contigs by shared-k-mer lookup against the contig k-mer table
(same machinery as counting), scored with the batched Smith-Waterman kernel
on device, CIGARs come from the batched device traceback DP, and abundances
are aligned-base sums per contig (jgi_summarize-style depth table).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import bitkmer as bk
from ..ops.lookup import table_lookup
from ..ops.ssw import sw_align, sw_cigar_batch

_ACGT = np.frombuffer(b"ACGTN", np.uint8)


def build_contig_index(contigs: list[str], k: int = 31):
    """Sorted (kmer -> contig id, offset) arrays over contig k-mers.

    Also carries a single concatenated contig code buffer (+ per-contig
    start/len) so reference windows around anchors are one vectorized gather
    instead of a per-read python slice loop.
    """
    all_words = []
    all_cid = []
    all_off = []
    all_rc = []
    clen = np.array([len(s) for s in contigs], np.int64)
    cstart = np.zeros(len(contigs) + 1, np.int64)
    np.cumsum(clen, out=cstart[1:])
    concat = np.full(int(cstart[-1]), 255, np.uint8)
    for cid, seq in enumerate(contigs):
        codes = bk.ascii_to_codes(seq.encode())
        concat[cstart[cid] : cstart[cid + 1]] = codes
        if len(seq) < k:
            continue
        words = np.asarray(bk.kmer_words_from_codes(jnp.asarray(codes[None, :]), k))[0]
        cw, was_rc = bk.canonicalize_words(jnp.asarray(words), k)
        all_words.append(np.asarray(cw))
        all_rc.append(np.asarray(was_rc))
        all_cid.append(np.full(words.shape[0], cid, np.int32))
        all_off.append(np.arange(words.shape[0], dtype=np.int32))
    if not all_words:
        return None
    words = np.concatenate(all_words)
    cid = np.concatenate(all_cid)
    off = np.concatenate(all_off)
    rc = np.concatenate(all_rc)
    order = np.lexsort(tuple(words[:, w] for w in range(words.shape[1] - 1, -1, -1)))
    return dict(
        words=words[order], cid=cid[order], off=off[order], rc=rc[order], k=k,
        concat=concat, cstart=cstart, clen=clen,
    )


def align_reads_to_contigs(
    codes: np.ndarray, lens: np.ndarray, contigs: list[str],
    index=None, k: int = 31,
    match=1, mismatch=1, gap_open=1, gap_extend=1,
    cigars: bool = False, n_seeds: int = 5,
):
    """Anchor + align a block of reads against contigs.

    Anchoring is MULTI-SEED (reference klign seeds every read at several
    k-mers; a single mid-read anchor loses the read to one sequencing error
    or a non-unique k-mer): each read samples `n_seeds` k-mer positions, all
    are looked up in one batch, and the seeds vote on (contig, orientation,
    diagonal) with a small indel slack — the winning seed anchors the
    alignment window; any found seed rescues an otherwise-lost read.

    Returns dict with per-read contig id (-1 unanchored), score, identity,
    begin/end spans, orientation (rev), the window offset within the contig
    (win_lo, so contig position = win_lo + r_begin), the oriented codes the
    alignment used, and — when cigars=True — SSW-style CIGARs + NM counts.
    """
    if index is None:
        index = build_contig_index(contigs, k)
    if index is None:
        B = codes.shape[0]
        return dict(cid=np.full(B, -1, np.int32), score=np.zeros(B, np.int32),
                    identity=np.zeros(B, np.float32))
    B, L = codes.shape
    kk = index["k"]
    words = np.asarray(bk.kmer_words_from_codes(jnp.asarray(codes), kk))
    P = words.shape[1]
    span = np.maximum(lens - kk, 0).astype(np.int64)
    # seed fractions ordered by centrality so argmax tie-breaks to the middle
    fracs = np.array([0.5, 0.25, 0.75, 0.0, 1.0])[:n_seeds]
    NS = len(fracs)
    posS = np.clip((span[:, None] * fracs[None, :]).astype(np.int64), 0, P - 1)
    anchors = words[np.arange(B)[:, None], posS]  # (B, NS, W)
    cwS, q_rcS = bk.canonicalize_words(
        jnp.asarray(anchors.reshape(B * NS, -1)), kk
    )
    q_rcS = np.asarray(q_rcS).reshape(B, NS)
    idxS, foundS = table_lookup(
        jnp.asarray(index["words"]), jnp.int32(len(index["words"])), cwS
    )
    idxS = np.asarray(idxS).reshape(B, NS)
    foundS = np.asarray(foundS).reshape(B, NS)
    cidS = np.where(foundS & (lens >= kk)[:, None], index["cid"][idxS], -1)
    rel_rcS = (q_rcS ^ index["rc"][idxS]) & (cidS >= 0)
    # oriented read position of each anchor and the implied contig diagonal
    midS = np.where(rel_rcS, span[:, None] - posS, posS)
    centerS = index["off"][idxS].astype(np.int64)
    diagS = centerS - midS
    # vote: seeds agreeing on (contig, orientation, diagonal +- indel slack)
    same = (
        (cidS[:, :, None] == cidS[:, None, :])
        & (rel_rcS[:, :, None] == rel_rcS[:, None, :])
        & (np.abs(diagS[:, :, None] - diagS[:, None, :]) <= 16)
        & (cidS >= 0)[:, None, :]
    )
    votes = np.where(cidS >= 0, same.sum(-1), -1)
    s_star = np.argmax(votes, axis=1)
    rb = np.arange(B)
    cid = cidS[rb, s_star]
    idx = idxS[rb, s_star]
    rel_rc = rel_rcS[rb, s_star]
    mid = midS[rb, s_star]
    # reverse-complement reads that anchor in reverse orientation
    j = np.arange(L)[None, :]
    rev_idx = np.clip(lens[:, None] - 1 - j, 0, L - 1)
    codes_rc = np.take_along_axis(codes, rev_idx, axis=1)
    codes_rc = np.where(codes_rc < 4, 3 - codes_rc, codes_rc).astype(np.uint8)
    codes_rc = np.where(j < lens[:, None], codes_rc, 4).astype(np.uint8)
    codes = np.where(rel_rc[:, None], codes_rc, codes)

    # vectorized ref windows around the anchor (one gather over the
    # concatenated contig buffer; no per-read python loop)
    Lr = L + 64
    center = index["off"][idx].astype(np.int64)
    c_len = np.where(cid >= 0, index["clen"][np.clip(cid, 0, None)], 0)
    lo = np.clip(center - mid - 32, 0, None)
    lo = np.where(cid >= 0, lo, 0)
    gstart = index["cstart"][np.clip(cid, 0, None)] + lo
    gidx = gstart[:, None] + np.arange(Lr)[None, :]
    in_contig = (np.arange(Lr)[None, :] < (c_len - lo)[:, None]) & (cid >= 0)[:, None]
    refs = np.where(
        in_contig, index["concat"][np.clip(gidx, 0, len(index["concat"]) - 1)], 255
    ).astype(np.uint8)
    r_len = np.where(cid >= 0, np.minimum(c_len - lo, Lr), 0).astype(np.int32)

    aln = sw_align(
        jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(refs), jnp.asarray(r_len),
        match=match, mismatch=mismatch, gap_open=gap_open, gap_extend=gap_extend,
    )
    score = np.asarray(aln["score"])
    # identity proxy: score / (match * aligned_query_len), so clipped/partial
    # alignments are judged over the span that actually aligned
    qspan = np.maximum(np.asarray(aln["q_end"]) - np.asarray(aln["q_begin"]) + 1, 1)
    identity = np.where(cid >= 0, score / (match * qspan), 0.0)
    out = dict(cid=cid, score=score, identity=identity.astype(np.float32),
               q_begin=np.asarray(aln["q_begin"]), q_end=np.asarray(aln["q_end"]),
               r_begin=np.asarray(aln["r_begin"]), r_end=np.asarray(aln["r_end"]),
               rev=rel_rc, win_lo=lo.astype(np.int64), codes=codes)
    if cigars:
        aln_np = {kk: np.asarray(v) for kk, v in aln.items()}
        aln_np["q_begin"] = np.where(cid >= 0, aln_np["q_begin"], -1)
        aln_np["q_end"] = np.where(cid >= 0, aln_np["q_end"], -1)
        cg, nm = sw_cigar_batch(
            codes, lens, refs, r_len, aln_np,
            match=match, mismatch=mismatch, gap_open=gap_open, gap_extend=gap_extend,
        )
        out["cigar"] = cg
        out["nm"] = nm
    return out


def sam_record(name: str, out: dict, i: int, lens: np.ndarray,
               cnames: list[str] | None = None) -> str:
    """One SAM line (v1.6 mandatory fields + NM tag) for read i of a block.

    cnames maps the aligner's dense contig index to the contig's REAL name
    (Contig<id> from the FASTA header) — a --post-asm-only run reloads only
    the >=min-print-len contigs, so index != id there."""
    n = int(lens[i])
    if out["cid"][i] < 0 or n == 0:
        return f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*"
    seq = _ACGT[np.minimum(out["codes"][i, :n], 4)].tobytes().decode()
    flag = 16 if out["rev"][i] else 0
    pos = int(out["win_lo"][i] + out["r_begin"][i]) + 1  # SAM is 1-based
    cig = out["cigar"][i] if out.get("cigar") else "*"
    nm = int(out["nm"][i]) if "nm" in out else 0
    ci = int(out["cid"][i])
    rname = cnames[ci] if cnames is not None else f"Contig{ci}"
    return (
        f"{name}\t{flag}\t{rname}\t{pos}\t60\t{cig}"
        f"\t*\t0\t0\t{seq}\t*\tNM:i:{nm}\tAS:i:{int(out['score'][i])}"
    )


def post_asm_align(
    asm, sample_reads: int | None = None, k: int = 31, block_reads: int = 2048,
    sam_fname: str | None = None, abundance_fname: str | None = None,
):
    """Align packed reads back to the final contigs; optional SAM + depths.

    sample_reads=None aligns every read (reference --post-asm-align aligns
    all; the stats sampler passes a bound). Returns summary stats. Abundance
    is the per-contig mean aligned-read depth over its full length, written
    as the jgi_summarize-style `contigName contigLen totalAvgDepth` table the
    guide documents for binning (docs/mhm_guide.md:222-233).
    """
    contigs = [c.seq for c in asm.contigs]
    # real contig names (FASTA header ids): a --post-asm-only run reloads
    # only the dumped >=min-print-len contigs, so the dense aligner index
    # does not equal the id — the SAM/depths must name what the FASTA names
    cnames = [f"Contig{c.id}" for c in asm.contigs]
    if not contigs:
        return dict(aligned_frac=0.0, mean_identity=0.0)
    index = build_contig_index(contigs, k)
    tot = 0
    anchored = 0
    ident_sum = 0.0
    aligned_bases = np.zeros(len(contigs), np.int64)
    sam = open(sam_fname, "w") if sam_fname else None
    if sam:
        sam.write("@HD\tVN:1.6\tSO:unknown\n")
        for cname, c in zip(cnames, contigs):
            sam.write(f"@SQ\tSN:{cname}\tLN:{len(c)}\n")
        sam.write("@PG\tID:mhm2_proxy_tpu\tPN:mhm2_proxy_tpu\n")
    rid = 0
    for codes, quals, lens, ids in asm.packed_reads.blocks(
        block_reads, min_len=k, with_ids=True
    ):
        out = align_reads_to_contigs(
            codes, lens, contigs, index=index, k=k, cigars=sam is not None
        )
        mask = lens > 0
        tot += int(mask.sum())
        hit = (out["cid"] >= 0) & mask
        anchored += int(hit.sum())
        ident_sum += float(out["identity"][hit].sum())
        span = np.where(hit, out["r_end"] - out["r_begin"] + 1, 0)
        np.add.at(aligned_bases, np.clip(out["cid"], 0, None), span)
        if sam:
            for i in np.nonzero(mask)[0]:
                # real read identity (packed_reads.cpp:74-75 id convention);
                # anonymous rows keep a positional fallback name
                rid_i = int(ids[i])
                name = (
                    f"r{abs(rid_i)}/{2 if rid_i > 0 else 1}"
                    if rid_i else f"read_{rid + int(i)}"
                )
                sam.write(sam_record(name, out, int(i), lens, cnames) + "\n")
        rid += int(codes.shape[0])
        if sample_reads is not None and tot >= sample_reads:
            break
    if sam:
        sam.close()
    stats = dict(
        aligned_frac=anchored / max(tot, 1),
        mean_identity=ident_sum / max(anchored, 1),
        sampled_reads=tot,
    )
    if abundance_fname:
        with open(abundance_fname, "w") as f:
            f.write("contigName\tcontigLen\ttotalAvgDepth\n")
            for cidx, (cname, c) in enumerate(zip(cnames, contigs)):
                depth = aligned_bases[cidx] / max(len(c), 1)
                f.write(f"{cname}\t{len(c)}\t{depth:.4f}\n")
        stats["abundance_file"] = abundance_fname
    asm.log.info(f"post-asm-align: {stats}")
    return stats


def post_asm_align_stats(asm, sample_reads: int = 2048, k: int = 31):
    """Align a sample of the packed reads back to the final contigs."""
    return post_asm_align(asm, sample_reads=sample_reads, k=k, block_reads=512)
