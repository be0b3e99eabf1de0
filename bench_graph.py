"""Graph-stage scale probe: time ovlp_to_graph on a synthetic Dmel-class
overlap table.

The stage-2 graph code is the reference-parity-mandated python
(graph/sg.py, graph/unitigs.py).  SURVEY.md section 7 flags it as the
"arrays, not objects" hazard for 100Mb+ genomes; this probe synthesizes a
realistic preads.ovl straight from a coordinate model (tiling preads over
a genome, dovetail overlaps with ~99.9% idt -- no sequences needed by
ovlp_to_graph) and times/means the stage, so the scaling decision is
driven by measurement instead of folklore.

Usage: python bench_graph.py [--genome-mb 140] [--coverage 12]
"""
import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def synth_table(path, genome_bases, coverage=12, mean_len=12000, seed=7):
    """Write a preads.ovl-style 13-col table for tiling preads.

    Reads tile the genome at spacing mean_len/coverage with +-20% length
    jitter; every overlapping read pair emits the symmetric record pair
    with proper dovetail coords, idt 99.9, score=-overlap_len."""
    rng = np.random.RandomState(seed)
    step = int(mean_len / coverage)
    starts = np.arange(0, genome_bases - mean_len, step, dtype=np.int64)
    lens = (mean_len *
            (0.8 + 0.4 * rng.rand(len(starts)))).astype(np.int64)
    ends = starts + lens
    n = len(starts)
    print("synth: %d preads, %.0f Mb genome, ~%.0fx" %
          (n, genome_bases / 1e6, coverage), file=sys.stderr)
    written = 0
    with open(path, "w") as f:
        CH = 65536
        for lo in range(0, n, CH):
            hi = min(lo + CH, n)
            rows = []
            for i in range(lo, hi):
                # overlaps: subsequent reads starting before ends[i]
                j = i + 1
                while j < n and starts[j] < ends[i] - 500:
                    ov = int(min(ends[i], ends[j]) - starts[j])
                    if ov >= 1000:
                        a_s = int(starts[j] - starts[i])
                        a_e = int(min(ends[i], ends[j]) - starts[i])
                        b_s = 0
                        b_e = ov
                        la, lb = int(lens[i]), int(lens[j])
                        rows.append(
                            "%09d %09d %d 99.900 0 %d %d %d 0 %d %d %d "
                            "overlap" % (i, j, -ov, a_s, a_e, la,
                                         b_s, b_e, lb))
                        rows.append(
                            "%09d %09d %d 99.900 0 %d %d %d 0 %d %d %d "
                            "overlap" % (j, i, -ov, b_s, b_e, lb,
                                         a_s, a_e, la))
                    j += 1
            f.write("\n".join(rows))
            f.write("\n")
            written += len(rows)
        f.write("---\n")
    print("synth: %d overlap records" % written, file=sys.stderr)
    return n, written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--genome-mb", type=float, default=140.0)
    p.add_argument("--coverage", type=float, default=12)
    p.add_argument("--out", default="/tmp/ftpu_bench_graph")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    ovl = os.path.join(args.out, "preads.ovl")
    t0 = time.time()
    n_reads, n_recs = synth_table(ovl, int(args.genome_mb * 1e6),
                                  args.coverage)
    t_synth = time.time() - t0

    from falcon_tpu.graph import unitigs
    t0 = time.time()
    unitigs.ovlp_to_graph(ovl, args.out, min_len=4000, min_idt=96.0)
    t_graph = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    import json
    print(json.dumps({
        "metric": "ovlp_to_graph_wall_s", "value": round(t_graph, 1),
        "unit": "s", "genome_mb": args.genome_mb, "n_preads": n_reads,
        "n_records": n_recs, "synth_s": round(t_synth, 1),
        "maxrss_gb": round(rss_gb, 2),
        "records_per_s": round(n_recs / t_graph, 1)}))


if __name__ == "__main__":
    main()
