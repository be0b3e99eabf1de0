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
                              graph_to_contig, graph_to_utgs, ovlp_filter,
                              ovlp_stats, ovlp_to_graph, track_reads)

ALL_MAINS = [calc_cutoff, collect_contig_gfa, collect_pread_gfa, consensus,
             dedup_a_tigs, fetch_reads, gen_gfa_v1, gen_gfa_v2,
             graph_to_contig, graph_to_utgs, ovlp_filter, ovlp_stats,
             ovlp_to_graph, track_reads]


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
