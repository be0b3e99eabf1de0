"""Quick verification drive: simulated genome -> full pipeline via the
public package surface -> contig must reconstruct the genome (>99% idt).
This is the .claude/skills/verify recipe as a script (CPU, host or
device backend via --device)."""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from falcon_tpu.io import fasta
    from falcon_tpu.pipeline.driver import Pipeline
    from falcon_tpu.utils import sim
    from falcon_tpu.graph.to_contig import rc
    from falcon_tpu.ops import native

    out = tempfile.mkdtemp(prefix="ftpu_verify_")
    os.chdir(out)
    G = 100000
    genome = sim.random_genome(G, seed=42)
    reads = sim.simulate_reads(genome, coverage=18, mean_len=7000,
                               min_len=1500, error=0.05, seed=43)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    open("input.fofn", "w").write(os.path.abspath("raw_reads.fa") + "\n")
    open("fc_run.cfg", "w").write("""[General]
input_fofn = input.fofn
input_type = raw
genome_size = %d
seed_coverage = 15
length_cutoff = -1
length_cutoff_pr = 1000
use_device = false
pa_DBsplit_option = -x500 -s50
ovlp_DBsplit_option = -x500 -s50
falcon_sense_option = --output-multi --min-idt 0.70 --min-cov 2 --max-n-read 1800
overlap_filtering_setting = --max-diff 100 --max-cov 100 --min-cov 1
""" % G)
    p_ctg = Pipeline("fc_run.cfg", ".", use_device=False).run()
    ctgs = list(fasta.read_fasta(p_ctg))
    assert ctgs, "no contigs"
    s = max(ctgs, key=lambda c: len(c.sequence)).sequence
    print("contig: %d of %d" % (len(s), G))
    assert len(s) > 0.9 * G
    best = None
    for g in (genome, rc(genome)):
        i = g.find(s[500:560])
        if i >= 0:
            best = (g, i)
            break
    assert best, "anchor failed"
    g, i = best
    tot_d = tot_b = 0
    for w0 in range(500, len(s) - 2500, max(1, (len(s) - 3000) // 8)):
        q = s[w0:w0 + 2000]
        t = g[i - 500 + w0: i - 500 + w0 + 2100]
        a = native.align(q, t, 400)
        tot_d += a.dist
        tot_b += 2000
    idt = 1.0 - tot_d / max(tot_b, 1)
    print("sampled identity: %.5f" % idt)
    assert idt > 0.99
    shutil.rmtree(out, ignore_errors=True)
    print("VERIFY OK")


if __name__ == "__main__":
    main()
