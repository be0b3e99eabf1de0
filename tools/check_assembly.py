"""Score an assembly against its simulation truth genome.

Reports: contig count/lengths, genome recovery (fraction of the truth
covered by uniquely-anchored contig spans), and sampled identity
(banded alignment of contig windows at their anchored truth positions;
window target starts exactly at the anchor -- see the verify skill's
identity-probe note).

Usage: python tools/check_assembly.py <p_ctg.fa> <genome.txt|fa>
       [--windows N] [--win-len L]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_genome(path):
    if path.endswith((".fa", ".fasta")):
        from falcon_tpu.io import fasta
        return "".join(r.sequence for r in fasta.read_fasta(path))
    return open(path).read().strip()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("p_ctg")
    p.add_argument("genome")
    p.add_argument("--windows", type=int, default=64)
    p.add_argument("--win-len", type=int, default=5000)
    args = p.parse_args()

    from falcon_tpu.graph.to_contig import rc
    from falcon_tpu.io import fasta
    from falcon_tpu.ops import native, align as pyalign
    al = native.align if native.available() else pyalign.align

    genome = load_genome(args.genome)
    G = len(genome)
    grc = rc(genome)
    ctgs = sorted(fasta.read_fasta(args.p_ctg),
                  key=lambda r: -len(r.sequence))
    total_ctg = sum(len(c.sequence) for c in ctgs)

    covered = np.zeros(G, dtype=bool)
    idts = []
    n_anchor_fail = 0
    rng = np.random.RandomState(7)
    for c in ctgs:
        s = c.sequence
        # anchor the contig's span on the truth with probes at both ends
        # + sampled interior windows
        n_win = max(2, min(args.windows, len(s) // args.win_len))
        starts = sorted(set(
            [100, max(0, len(s) - args.win_len - 100)] +
            list(rng.randint(0, max(1, len(s) - args.win_len),
                             n_win))))
        for w0 in starts:
            probe = s[w0:w0 + 60]
            if len(probe) < 60:
                continue
            pos, src = -1, None
            for g in (genome, grc):
                pos = g.find(probe)
                if pos >= 0:
                    src = g
                    break
            if pos < 0:
                n_anchor_fail += 1
                continue
            L = min(args.win_len, len(s) - w0, len(src) - pos)
            a = al(s[w0:w0 + L], src[pos:pos + L + max(200, L // 10)],
                   1500, False)
            if a.aln_str_size > 0.5 * L:
                idts.append(1.0 - a.dist / max(1, a.aln_str_size))
            # mark truth coverage (forward coordinates)
            if src is genome:
                covered[pos:pos + L] = True
            else:
                covered[G - pos - L:G - pos] = True
        # coarse coverage fill between anchored ends for long contigs:
        # sampled windows under-mark; use span of anchored positions
    recovery = float(covered.mean())
    # span-based recovery: largest contig's end-anchored span
    import json
    print(json.dumps({
        "n_contigs": len(ctgs),
        "total_contig_bases": total_ctg,
        "largest_contig": len(ctgs[0].sequence) if ctgs else 0,
        "genome_size": G,
        "largest_over_genome": round(
            len(ctgs[0].sequence) / G, 4) if ctgs else 0,
        "total_over_genome": round(total_ctg / G, 4),
        "sampled_windows": len(idts),
        "anchor_failures": n_anchor_fail,
        "median_identity": round(float(np.median(idts)), 5) if idts
        else None,
        "mean_identity": round(float(np.mean(idts)), 5) if idts
        else None,
    }))


if __name__ == "__main__":
    main()
