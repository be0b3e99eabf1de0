"""Pipeline robustness: degenerate inputs must not crash the driver.

(The reference relies on external binaries failing with nonzero exit;
in-process phases must handle these directly.)"""
import os

import pytest

from falcon_tpu.io import fasta
from falcon_tpu.pipeline.driver import Pipeline
from falcon_tpu.utils import sim
from tests.test_pipeline_e2e import write_cfg


def test_no_overlaps(tmp_path):
    """Reads from unrelated genomes: no overlaps, no preads, empty
    contig set -- but every artifact file exists."""
    os.chdir(tmp_path)
    reads = []
    for k in range(6):
        g = sim.random_genome(3000, seed=100 + k)
        reads.append(("r%d" % k, g))
    fasta.write_fasta("raw_reads.fa", reads, width=0)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", 1000)
    p_ctg = Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()
    assert os.path.exists(p_ctg)
    assert list(fasta.read_fasta(p_ctg)) == []
    assert os.path.exists("0-rawreads/preads.fasta")
    assert os.path.exists("1-preads_ovl/preads.ovl")


def test_single_read(tmp_path):
    os.chdir(tmp_path)
    g = sim.random_genome(8000, seed=3)
    fasta.write_fasta("raw_reads.fa", [("only", g)], width=0)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", 500)
    p_ctg = Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()
    assert os.path.exists(p_ctg)


def test_empty_fasta(tmp_path):
    os.chdir(tmp_path)
    open("raw_reads.fa", "w").close()
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", 1000)
    with pytest.raises(ValueError, match="[Rr]ead"):
        # auto-cutoff on an empty store raises the reference's
        # GenomeCoverageError-equivalent (functional.py:252-258)
        Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()


def test_phase0_overlap_resume(tmp_path):
    """raw_overlaps.ovl is a mid-phase checkpoint: deleting only
    preads.fasta must re-run consensus WITHOUT re-running overlap."""
    os.chdir(tmp_path)
    g = sim.random_genome(30000, seed=8)
    reads = sim.simulate_reads(g, coverage=15, mean_len=5000,
                               min_len=1500, error=0.04, seed=9)
    fasta.write_fasta("raw_reads.fa", reads, width=0)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", 30000)
    p = Pipeline("fc_run.cfg", str(tmp_path), use_device=False)
    p.phase0()
    first = open("0-rawreads/preads.fasta").read()
    os.unlink("0-rawreads/preads.fasta")
    p2 = Pipeline("fc_run.cfg", str(tmp_path), use_device=False)
    p2.phase0()
    assert p2.timings["phase0_overlap"] == 0.0   # resumed from .ovl
    assert open("0-rawreads/preads.fasta").read() == first
