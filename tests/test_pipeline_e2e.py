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


@pytest.mark.slow
def test_full_assembly_adversarial(tmp_path):
    """VERDICT round-1 #10: the stretched e2e bar.  A diploid-ish
    adversarial genome -- internal 8kb repeat, a het window (4% SNPs +
    a 1.5kb insertion in hap2), chimeric junk reads -- through the FULL
    pipeline (raw reads -> consensus -> pread overlap -> graph):
    exactly one primary contig at >=99.9% identity, plus a_ctg bubble
    content that anchors back to the genome at >=99% identity."""
    from falcon_tpu.graph.to_contig import rc
    from falcon_tpu.ops import native, align as pyalign
    os.chdir(tmp_path)
    G = 120000
    seed = 11
    rng = np.random.RandomState(seed)
    g = list(sim.random_genome(G, seed=seed))
    g[60000:68000] = g[10000:18000]            # dispersed repeat copy
    hap1 = "".join(g)
    hap2 = list(hap1)
    bases = "ACGT"
    for p in range(30000, 36000):              # het window
        if rng.rand() < 0.04:
            hap2[p] = bases[(bases.index(hap2[p]) + 1 + rng.randint(3))
                            % 4]
    ins = "".join(bases[rng.randint(4)] for _ in range(1500))
    hap2 = "".join(hap2[:33000]) + ins + "".join(hap2[33000:])
    err = 0.03
    reads = list(sim.simulate_reads(hap1, coverage=14, mean_len=8000,
                                    min_len=2500, error=err,
                                    seed=seed + 1))
    r2 = sim.simulate_reads(hap2, coverage=14, mean_len=8000,
                            min_len=2500, error=err, seed=seed + 2)
    reads += [("1%08d" % i, s) for i, (n, s) in enumerate(r2)]
    for i in range(6):                         # chimeric junk
        a = rng.randint(0, G - 30000)
        b = rng.randint(0, G - 30000)
        if abs(a - b) < 30000:
            b = (b + 50000) % (G - 30000)
        reads.append(("2%08d" % i, hap1[a:a + 4000] + hap1[b:b + 4000]))

    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    with open("fc_run.cfg", "w") as f:
        f.write("""[General]
input_fofn = input.fofn
input_type = raw
genome_size = %d
seed_coverage = 18
length_cutoff = -1
length_cutoff_pr = 1000
falcon_sense_option = --output-multi --min-idt 0.70 --min-cov 2 --max-n-read 1800
overlap_filtering_setting = --max-diff 100 --max-cov 100 --min-cov 1
""" % G)
    p_ctg = Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()

    al = native.align if native.available() else pyalign.align

    def idt_vs(s, gen):
        probe = s[500:560]
        for gg in (gen, rc(gen)):
            p = gg.find(probe)
            if p >= 0:
                L = min(len(s) - 500, len(gg) - p) - 100
                if L <= 0:
                    return None
                a = al(s[500:500 + L], gg[p:p + L + int(0.1 * L)],
                       1500, False)
                return 1 - a.dist / max(1, a.aln_str_size)
        return None

    ctgs = list(fasta.read_fasta(p_ctg))
    assert len(ctgs) == 1, [c.name for c in ctgs]
    (c,) = ctgs
    assert len(c.sequence) > 0.95 * G
    idt = idt_vs(c.sequence, hap1)
    assert idt is not None and idt >= 0.999, idt

    a_fn = os.path.join("2-asm-falcon", "a_ctg.fa")
    actgs = [r for r in fasta.read_fasta(a_fn)
             if len(r.sequence) >= 1000]
    assert actgs, "no alternate (bubble) contigs"
    for r in actgs:
        ai = max(x for x in (idt_vs(r.sequence, hap1),
                             idt_vs(r.sequence, hap2)) if x is not None)
        assert ai >= 0.99, (r.name, ai)


@pytest.mark.slow
def test_preads_input_type_matches_raw_run(tmp_path):
    """input_type=preads must skip stage 0 and produce the IDENTICAL
    assembly that the raw run's own phase 1+2 produced from the same
    pread FASTA (the working version of reference run1.py:485-508's
    unfinished preads branch; VERDICT r3 missing #1)."""
    os.chdir(tmp_path)
    G = 60000
    genome = sim.random_genome(G, seed=7)
    reads = sim.simulate_reads(genome, coverage=20, mean_len=7000,
                               min_len=1500, error=0.04, seed=3)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", G)
    raw_dir = tmp_path / "run_raw"
    raw_dir.mkdir()
    Pipeline("fc_run.cfg", str(raw_dir), use_device=False).run()
    preads_fn = raw_dir / "0-rawreads" / "preads.fasta"
    assert preads_fn.exists()

    # second pipeline: the preads fasta IS the input; stage 0 skipped
    with open("fc_preads.cfg", "w") as f:
        f.write("""[General]
input_fofn = %s
input_type = preads
genome_size = %d
length_cutoff_pr = 1000
ovlp_DBsplit_option = -x500 -s50
ovlp_HPCdaligner_option = -v -e.96 -l500
overlap_filtering_setting = --max-diff 100 --max-cov 100 --min-cov 1
""" % (preads_fn, G))
    pr_dir = tmp_path / "run_preads"
    pr_dir.mkdir()
    p_ctg2 = Pipeline("fc_preads.cfg", str(pr_dir), use_device=False).run()
    assert not (pr_dir / "0-rawreads" / "preads.fasta").exists(), \
        "stage 0 must be skipped for input_type=preads"
    for art in ("p_ctg.fa", "a_ctg.fa", "p_ctg_tiling_path"):
        a = (raw_dir / "2-asm-falcon" / art).read_bytes()
        b = (pr_dir / "2-asm-falcon" / art).read_bytes()
        assert a == b, "artifact %s differs between raw and preads runs" \
            % art


@pytest.mark.slow
def test_consensus_midphase_resume(tmp_path, monkeypatch):
    """Kill the consensus phase after its first checkpointed chunk; the
    driver must resume mid-phase: skip the finished groups, truncate the
    unmarked tail, and complete the assembly with no duplicate or
    garbage preads (round-4: the remote-TPU client can wedge
    mid-consensus on multi-hour runs)."""
    os.chdir(tmp_path)
    G = 25000
    genome = sim.random_genome(G, seed=7)
    reads = sim.simulate_reads(genome, coverage=20, mean_len=5000,
                               min_len=1500, error=0.04, seed=3)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", G)
    monkeypatch.setenv("FTPU_USE_PALLAS", "0")

    import falcon_tpu.cns.device as devmod
    real = devmod.run_consensus_device

    class Boom(RuntimeError):
        pass

    def dying(groups, cfg, out, dev=None, progress_cb=None):
        calls = []

        def cb(k):
            # record ONE durable checkpoint, then fail every subsequent
            # chunk (the finisher may already have written later chunks'
            # records before noticing -- exactly the unmarked-tail shape
            # a process death leaves)
            if not calls:
                progress_cb(k)
                calls.append(k)
            raise Boom()
        d = devmod.DeviceCns(chunk_tasks=24, use_pallas=False)
        return real(groups, cfg, out, dev=d, progress_cb=cb)

    part = tmp_path / "part"
    part.mkdir()
    monkeypatch.setattr(devmod, "run_consensus_device", dying)
    with pytest.raises(Boom):
        Pipeline("fc_run.cfg", str(part), use_device=True).run()
    tmp = part / "0-rawreads" / "preads.fasta.tmp"
    prog = part / "0-rawreads" / "preads.fasta.progress"
    assert tmp.exists() and prog.exists()
    k_done, good_bytes = map(int, prog.read_text().split())
    assert k_done > 0 and good_bytes > 0
    # simulate a torn record written as the process died
    with open(tmp, "ab") as f:
        f.write(b">partial_garbage\nACG")

    def resuming(groups, cfg, out, dev=None, progress_cb=None):
        # count groups offered on resume: must be original - k_done
        seen = []

        def counting():
            for g in groups:
                seen.append(g[0])
                yield g
        d = devmod.DeviceCns(chunk_tasks=24, use_pallas=False)
        n = real(counting(), cfg, out, dev=d, progress_cb=progress_cb)
        resuming.seen = seen
        return n

    monkeypatch.setattr(devmod, "run_consensus_device", resuming)
    p_ctg = Pipeline("fc_run.cfg", str(part), use_device=True).run()
    got = (part / "0-rawreads" / "preads.fasta").read_bytes()
    assert b"partial_garbage" not in got, "crash tail not truncated"
    # no duplicate pread records (each seed emitted at most once per
    # prolog group)
    names = [l for l in got.split(b"\n") if l.startswith(b">")]
    assert len(names) == len(set(names)), "duplicate preads after resume"
    # the resumed pass skipped the finished prefix
    assert len(resuming.seen) > 0
    # and the assembly completed with a real contig
    ctgs = list(fasta.read_fasta(p_ctg))
    assert ctgs and max(len(c.sequence) for c in ctgs) > 0.5 * G
