"""The CLI tool surface: each main parses --help and the core tools run
on real artifacts (mirrors the reference's smoke/help test pattern,
e.g. test/test_consensus.py:5-9)."""
import io
import os
import sys

import pytest

from falcon_tpu.mains import (calc_cutoff, collect_contig_gfa,
                              collect_pread_gfa, consensus, dedup_a_tigs,
                              fetch_reads, gen_gfa_v1, gen_gfa_v2,
                              graph_to_contig, graph_to_utgs, hgap_adapt,
                              ovlp_filter, ovlp_stats, ovlp_to_graph,
                              track_reads)

ALL_MAINS = [calc_cutoff, collect_contig_gfa, collect_pread_gfa, consensus,
             dedup_a_tigs, fetch_reads, gen_gfa_v1, gen_gfa_v2,
             graph_to_contig, graph_to_utgs, hgap_adapt, ovlp_filter,
             ovlp_stats, ovlp_to_graph, track_reads]


@pytest.mark.parametrize("mod", ALL_MAINS,
                         ids=[m.__name__.split(".")[-1] for m in ALL_MAINS])
def test_help(mod):
    try:
        mod.main(["prog", "--help"])
    except SystemExit:
        pass


def test_calc_cutoff_cli(tmp_path, capsys):
    fa = tmp_path / "r.fa"
    fa.write_text(">a\n" + "A" * 5000 + "\n>b\n" + "C" * 3000 + "\n"
                  ">c\n" + "G" * 1000 + "\n")
    rc = calc_cutoff.main(["prog", "--coverage", "1",
                           "--genome-size", "6000", str(fa)])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "3000"


def test_calc_cutoff_insufficient(tmp_path, capsys):
    fa = tmp_path / "r.fa"
    fa.write_text(">a\n" + "A" * 100 + "\n")
    rc = calc_cutoff.main(["prog", "--coverage", "30",
                           "--genome-size", "1000000", str(fa)])
    assert rc == 1


def test_ovlp_stats_cli(tmp_path, capsys):
    ovl = tmp_path / "t.ovl"
    ovl.write_text(
        "000000000 000000001 -1807 99.00 0 0 1807 1988 0 181 1988 1988 "
        "overlap\n---\n")
    rc = ovlp_stats.main(["prog", "--ovl-fn", str(ovl), "--min-len", "1"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "000000000 1988 1 0"


def test_consensus_cli_stream(monkeypatch, capsys):
    import numpy as np
    from falcon_tpu.utils import sim
    rng = np.random.RandomState(0)
    genome = sim.random_genome(3000, seed=1)
    g = np.frombuffer(genome.encode(), np.uint8)
    tmpl = g[200:2800]
    def noisy():
        return sim.mutate(tmpl, rng, 0.01, 0.01, 0.01).tobytes().decode()
    lines = []
    seed = noisy()
    lines.append("000000000 " + seed)
    for i in range(1, 12):
        lines.append("%09d %s" % (i, noisy()))
    lines.append("+ +")
    lines.append("- -")
    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))
    rc = consensus.main(["prog", "--min-cov", "2", "--min-cov-aln", "2",
                         "--min-n-read", "5", "--output-multi"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith(">prolog/0000000000/")
    seq = "".join(out.splitlines()[1:])
    assert len(seq) > 2000


def test_make_fofn_abs(tmp_path):
    from falcon_tpu.mains import tasks
    sub = tmp_path / "data"
    sub.mkdir()
    (sub / "a.fa").write_text(">x\nACGT\n")
    fofn = sub / "in.fofn"
    fofn.write_text("a.fa\n/abs/b.fa\n\n")
    out = tmp_path / "out.fofn"
    rc = tasks.main(["prog", "make-fofn-abs", str(fofn), str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines == [str(sub / "a.fa"), "/abs/b.fa"]
    # same in/out path rejected
    with pytest.raises(ValueError):
        tasks.make_fofn_abs(str(fofn), str(fofn))
    # no task -> usage
    assert tasks.main(["prog"]) == 2


def test_hgap_adapt(tmp_path):
    # fake an external fc_run tree with sharded consensus outputs and
    # stage-1 products
    job = tmp_path / "ext_run"
    (job / "0-rawreads" / "preads").mkdir(parents=True)
    (job / "0-rawreads" / "preads" / "out.00001.fasta").write_text(
        ">p1\nACGT\n")
    (job / "0-rawreads" / "preads" / "out.00002.fasta").write_text(
        ">p2\nTTTT\n")
    (job / "0-rawreads" / "length_cutoff").write_text("1200\n")
    (job / "1-preads_ovl").mkdir()
    (job / "1-preads_ovl" / "preads4falcon.fasta").write_text(">p1\nACGT\n")
    (job / "2-asm-falcon").mkdir()
    (job / "2-asm-falcon" / "preads.ovl").write_text("---\n")
    out = tmp_path / "run"
    rc = hgap_adapt.main(["prog", "--job-output", str(job),
                          "--out", str(out)])
    assert rc == 0
    assert (out / "0-rawreads" / "preads.fasta").read_text() == \
        ">p1\nACGT\n>p2\nTTTT\n"
    assert (out / "0-rawreads" / "length_cutoff").read_text() == "1200\n"
    assert (out / "2-asm-falcon" / "preads4falcon.fasta").exists()
    assert (out / "1-preads_ovl" / "preads.ovl").exists()
    # empty dir -> nothing adoptable
    empty = tmp_path / "empty"
    empty.mkdir()
    assert hgap_adapt.main(["prog", "--job-output", str(empty),
                            "--out", str(tmp_path / "run2")]) == 1
