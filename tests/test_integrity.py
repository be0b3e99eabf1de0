"""Artifact integrity (LAcheck analog): corrupt checkpoints are detected
on resume, quarantined, and recomputed instead of consumed silently
(reference: falcon_kit/mains/LAsort.py:42-47 LAcheck-and-drop;
falcon_kit/mains/dazzler.py:430-473)."""
import json
import os

import pytest

from falcon_tpu.io import fasta, integrity
from falcon_tpu.pipeline.driver import Pipeline
from falcon_tpu.utils import sim

from .test_pipeline_e2e import write_cfg


def test_sidecar_roundtrip(tmp_path):
    p = str(tmp_path / "artifact.txt")
    with open(p, "w") as f:
        f.write("hello overlap table\n" * 100)
    integrity.write_sidecar(p, rows=100)
    assert integrity.verify(p) is True
    meta = json.load(open(integrity.sidecar_path(p)))
    assert meta["rows"] == 100
    # size-preserving corruption is still caught (CRC, not just size)
    with open(p, "r+b") as f:
        f.seek(10)
        f.write(b"X")
    assert integrity.verify(p) is False
    # missing sidecar = legacy artifact
    os.unlink(integrity.sidecar_path(p))
    assert integrity.verify(p) is None
    assert integrity.check_resume(p, "t") is True   # accepted w/ warning


def test_check_resume_quarantines(tmp_path):
    p = str(tmp_path / "table.ovl")
    with open(p, "w") as f:
        f.write("data\n")
    integrity.write_sidecar(p)
    with open(p, "a") as f:
        f.write("truncated-writer-junk")
    assert integrity.check_resume(p, "t") is False
    assert not os.path.exists(p)
    assert os.path.exists(p + ".corrupt")


@pytest.mark.slow
def test_pipeline_recovers_from_corrupt_overlap_checkpoint(tmp_path):
    """Corrupt the raw_overlaps.ovl mid-phase checkpoint after a full
    run; a resumed run must detect it, quarantine, recompute, and still
    produce the same contigs."""
    os.chdir(tmp_path)
    G = 40000
    genome = sim.random_genome(G, seed=11)
    reads = sim.simulate_reads(genome, coverage=18, mean_len=6000,
                               min_len=1500, error=0.04, seed=12)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", G)

    p_ctg = Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()
    first = open(p_ctg).read()
    assert first

    # corrupt the overlap checkpoint (size-preserving bit flip) and
    # remove downstream artifacts so phase0 must re-enter the ovl branch
    ovl = str(tmp_path / "0-rawreads" / "raw_overlaps.ovl")
    with open(ovl, "r+b") as f:
        f.seek(os.path.getsize(ovl) // 2)
        f.write(b"#")
    for fn in ("0-rawreads/preads.fasta", "1-preads_ovl/preads.ovl",
               "2-asm-falcon/preads4falcon.fasta", "2-asm-falcon/p_ctg.fa"):
        os.unlink(str(tmp_path / fn))

    p_ctg2 = Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()
    assert os.path.exists(ovl + ".corrupt")
    assert integrity.verify(ovl) is True       # recomputed + re-sidecared
    assert open(p_ctg2).read() == first
