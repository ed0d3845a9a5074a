"""Post-assembly read-to-contig alignment (full-MHM2 --post-asm-align parity).

The reference guide documents post-assembly alignment of reads to the final
assembly producing SAM-ish alignment stats (docs/mhm_guide.md:211-233),
backed by the SSW/ADEPT kernels. Here reads are anchored to contigs by
shared-k-mer lookup against the contig k-mer table (same machinery as
counting) and scored with the batched Smith-Waterman kernel on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import bitkmer as bk
from ..ops.lookup import table_lookup
from ..ops.ssw import sw_align


def build_contig_index(contigs: list[str], k: int = 31):
    """Sorted (kmer -> contig id, offset) arrays over contig k-mers."""
    W = bk.strings_to_words(["A" * k], k).shape[1]
    all_words = []
    all_cid = []
    all_off = []
    all_rc = []
    for cid, seq in enumerate(contigs):
        if len(seq) < k:
            continue
        codes = bk.ascii_to_codes(seq.encode())[None, :]
        words = np.asarray(bk.kmer_words_from_codes(jnp.asarray(codes), k))[0]
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
    return dict(words=words[order], cid=cid[order], off=off[order], rc=rc[order], k=k)


def align_reads_to_contigs(
    codes: np.ndarray, lens: np.ndarray, contigs: list[str],
    index=None, k: int = 31,
    match=1, mismatch=1, gap_open=1, gap_extend=1,
):
    """Anchor + align a block of reads against contigs.

    Returns dict with per-read contig id (-1 unanchored), score, identity.
    """
    if index is None:
        index = build_contig_index(contigs, k)
    if index is None:
        B = codes.shape[0]
        return dict(cid=np.full(B, -1, np.int32), score=np.zeros(B, np.int32),
                    identity=np.zeros(B, np.float32))
    B, L = codes.shape
    # one anchor kmer per read: the middle valid kmer
    words = np.asarray(
        bk.kmer_words_from_codes(jnp.asarray(codes), index["k"])
    )
    P = words.shape[1]
    mid = np.clip((lens - index["k"]) // 2, 0, P - 1)
    anchor = words[np.arange(B), mid]
    cw, q_rc = bk.canonicalize_words(jnp.asarray(anchor), index["k"])
    q_rc = np.asarray(q_rc)
    idx, found = table_lookup(
        jnp.asarray(index["words"]), jnp.int32(len(index["words"])), cw
    )
    idx, found = np.asarray(idx), np.asarray(found)
    cid = np.where(found & (lens >= index["k"]), index["cid"][idx], -1)
    # orientation of the read relative to the contig
    rel_rc = q_rc ^ index["rc"][idx]
    # reverse-complement reads that anchor in reverse orientation
    j = np.arange(L)[None, :]
    rev_idx = np.clip(lens[:, None] - 1 - j, 0, L - 1)
    codes_rc = np.take_along_axis(codes, rev_idx, axis=1)
    codes_rc = np.where(codes_rc < 4, 3 - codes_rc, codes_rc).astype(np.uint8)
    codes_rc = np.where(j < lens[:, None], codes_rc, 4).astype(np.uint8)
    codes = np.where(rel_rc[:, None], codes_rc, codes)
    # mid kmer position flips under rc: pos' = len - k - pos
    mid = np.where(rel_rc, np.maximum(lens - index["k"], 0) - mid, mid)

    # build padded ref windows around the anchor for SW scoring
    Lr = L + 64
    refs = np.full((B, Lr), 255, np.uint8)
    r_len = np.zeros(B, np.int32)
    for i in range(B):
        if cid[i] < 0:
            continue
        seq = contigs[cid[i]]
        center = int(index["off"][idx[i]])
        lo = max(0, center - int(mid[i]) - 32)
        window = seq[lo : lo + Lr]
        rc = bk.ascii_to_codes(window.encode())
        refs[i, : len(rc)] = rc
        r_len[i] = len(rc)
    aln = sw_align(
        jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(refs), jnp.asarray(r_len),
        match=match, mismatch=mismatch, gap_open=gap_open, gap_extend=gap_extend,
    )
    score = np.asarray(aln["score"])
    # identity proxy: score / (match * aligned_query_len), so clipped/partial
    # alignments are judged over the span that actually aligned
    qspan = np.maximum(np.asarray(aln["q_end"]) - np.asarray(aln["q_begin"]) + 1, 1)
    identity = np.where(cid >= 0, score / (match * qspan), 0.0)
    return dict(cid=cid, score=score, identity=identity.astype(np.float32),
                q_begin=np.asarray(aln["q_begin"]), q_end=np.asarray(aln["q_end"]),
                r_begin=np.asarray(aln["r_begin"]), r_end=np.asarray(aln["r_end"]))


def post_asm_align_stats(asm, sample_reads: int = 2048, k: int = 31):
    """Align a sample of the packed reads back to the final contigs."""
    contigs = [c.seq for c in asm.contigs]
    if not contigs:
        return dict(aligned_frac=0.0, mean_identity=0.0)
    index = build_contig_index(contigs, k)
    tot = 0
    anchored = 0
    ident_sum = 0.0
    for codes, quals, lens in asm.packed_reads.blocks(512, min_len=k):
        out = align_reads_to_contigs(codes, lens, contigs, index=index, k=k)
        mask = lens > 0
        tot += int(mask.sum())
        hit = (out["cid"] >= 0) & mask
        anchored += int(hit.sum())
        ident_sum += float(out["identity"][hit].sum())
        if tot >= sample_reads:
            break
    stats = dict(
        aligned_frac=anchored / max(tot, 1),
        mean_identity=ident_sum / max(anchored, 1),
        sampled_reads=tot,
    )
    asm.log.info(f"post-asm-align: {stats}")
    return stats
