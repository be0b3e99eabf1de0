"""End-to-end assembly on a small simulated genome (CPU, host kernels).

This is the synth0-style acceptance test the reference lacks in-repo
(SURVEY.md section 4: 'add the end-to-end synth0 contig-equality test').
Truth-checking: the primary contig must reconstruct the genome.
"""
import os

import numpy as np
import pytest

from falcon_tpu.io import fasta
from falcon_tpu.pipeline.driver import Pipeline
from falcon_tpu.utils import sim


def write_cfg(path, genome_size, block_mb=50):
    with open(path, "w") as f:
        f.write("""[General]
input_fofn = input.fofn
input_type = raw
genome_size = %d
seed_coverage = 15
length_cutoff = -1
length_cutoff_pr = 1000
pa_DBsplit_option = -x500 -s%s
ovlp_DBsplit_option = -x500 -s%s
pa_HPCdaligner_option = -v -e.70 -l1000
ovlp_HPCdaligner_option = -v -e.96 -l500
falcon_sense_option = --output-multi --min-idt 0.70 --min-cov 2 --max-n-read 1800
overlap_filtering_setting = --max-diff 100 --max-cov 100 --min-cov 1
""" % (genome_size, block_mb, block_mb))


@pytest.mark.slow
def test_full_assembly(tmp_path):
    os.chdir(tmp_path)
    G = 60000
    genome = sim.random_genome(G, seed=7)
    reads = sim.simulate_reads(genome, coverage=20, mean_len=7000,
                               min_len=1500, error=0.04, seed=3)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", G)

    p_ctg = Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()
    ctgs = list(fasta.read_fasta(p_ctg))
    assert ctgs, "no contigs produced"
    longest = max(ctgs, key=lambda c: len(c.sequence))
    assert len(longest.sequence) > 0.75 * G

    # contig must match the genome: anchor + banded alignment
    from falcon_tpu.graph.to_contig import rc
    from falcon_tpu.ops import native, align as pyalign
    al = native.align if native.available() else pyalign.align
    s = longest.sequence
    probe = s[500:560]
    hit = None
    for g in (genome, rc(genome)):
        p = g.find(probe)
        if p >= 0:
            hit = (g, p)
            break
    assert hit, "contig anchor not in genome"
    g, p = hit
    L = min(len(s) - 500, len(g) - p) - 100
    a = al(s[500:500 + L], g[p:p + L + int(0.1 * L)], 1500, False)
    idt = 1 - a.dist / max(1, a.aln_str_size)
    assert a.aln_str_size > 0.9 * L
    assert idt > 0.995, "contig identity %.4f too low" % idt


@pytest.mark.slow
def test_full_assembly_multiblock(tmp_path):
    """Same acceptance test but with the read DB split into multiple
    blocks, exercising the block-pair (i, j) scatter the reference runs
    via HPC.daligner's job triangle (driver._overlap_store)."""
    os.chdir(tmp_path)
    G = 60000
    genome = sim.random_genome(G, seed=17)
    reads = sim.simulate_reads(genome, coverage=20, mean_len=7000,
                               min_len=1500, error=0.04, seed=13)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", G, block_mb=0.3)   # ~4 blocks at 20x 60kb

    pipe = Pipeline("fc_run.cfg", str(tmp_path), use_device=False)
    p_ctg = pipe.run()
    from falcon_tpu.io import readstore
    store = readstore.ReadStore.load(
        os.path.join(str(tmp_path), "0-rawreads", "raw_reads"))
    assert len(store.blocks) >= 2, "config did not produce multiple blocks"
    ctgs = list(fasta.read_fasta(p_ctg))
    assert ctgs, "no contigs produced"
    longest = max(ctgs, key=lambda c: len(c.sequence))
    assert len(longest.sequence) > 0.75 * G
