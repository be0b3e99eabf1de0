"""Byte-parity of the stage-2 graph pipeline vs the reference python.

Generates overlap tables from simulated preads with the falcon_tpu overlap
engine, then runs BOTH the reference ovlp_to_graph/graph_to_contig (loaded
from /root/reference with nx1 shims, see ref_stage2.py) and
falcon_tpu.graph on the same preads.ovl, comparing:

  * sg_edges_list: exact bytes (both sides emit in edge-dict insertion
    order, which is deterministic given the input)
  * chimers_nodes: content (the reference iterates an address-ordered set)
  * utg_data / c_path: content as sorted lines (the reference's line order
    leaks PYTHONHASHSEED via set.pop)
  * ctg_paths + p_ctg.fa: contig content with ids renumbered away
"""
import os
import types

import numpy as np
import pytest

from falcon_tpu.graph import to_contig, unitigs
from falcon_tpu.io import fasta
from falcon_tpu.overlap import engine, filter as ofilter
from falcon_tpu.utils import sim

from . import ref_stage2


def _have_oracle():
    try:
        from . import oracle
        oracle.get_lib()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not (os.path.isdir(ref_stage2.REF) and _have_oracle()),
    reason="reference checkout unavailable")


def make_reads_plain(G, coverage, err, seed):
    genome = sim.random_genome(G, seed=seed)
    return sim.simulate_reads(genome, coverage=coverage, mean_len=8000,
                              min_len=3000, error=err, seed=seed + 1)


def make_reads_hard(G=120000, coverage=14, err=0.004, seed=11):
    """Adversarial genome: an internal repeat, a divergent (diploid)
    window producing a bubble, plus chimeric junk reads -- exercises
    chimer removal, spurs, best-overlap R edges and compound paths."""
    rng = np.random.RandomState(seed)
    g = list(sim.random_genome(G, seed=seed))
    g[60000:68000] = g[10000:18000]           # repeat copy
    hap1 = "".join(g)
    hap2 = list(hap1)
    # divergent window: 2% substitutions over 6kb
    bases = "ACGT"
    for p in range(30000, 36000):
        if rng.rand() < 0.02:
            hap2[p] = bases[(bases.index(hap2[p]) + 1 + rng.randint(3)) % 4]
    hap2 = "".join(hap2)
    reads = []
    reads += sim.simulate_reads(hap1, coverage=coverage / 2,
                                mean_len=8000, min_len=3000, error=err,
                                seed=seed + 1)
    r2 = sim.simulate_reads(hap2, coverage=coverage / 2, mean_len=8000,
                            min_len=3000, error=err, seed=seed + 2)
    reads += [("1%08d" % i, s) for i, (n, s) in enumerate(r2)]
    # chimeric reads: junctions of two distant loci
    for i in range(6):
        a = rng.randint(0, G - 30000)
        b = rng.randint(0, G - 30000)
        if abs(a - b) < 30000:
            b = (b + 50000) % (G - 30000)
        s = hap1[a:a + 4000] + hap1[b:b + 4000]
        reads.append(("2%08d" % i, s))
    return reads


def make_preads_ovl(tmp, G=80000, coverage=12, err=0.004, seed=5,
                    reads=None):
    if reads is None:
        reads = make_reads_plain(G, coverage, err, seed)
    rs_store = __import__("falcon_tpu.io.readstore",
                          fromlist=["ReadStore"]).ReadStore
    store = rs_store.from_seqs([s for _, s in reads],
                               [n for n, _ in reads])
    rids = np.arange(len(store))
    # topk=1: these fixtures feed the REFERENCE's own ovlp_to_graph, and
    # in --lfc mode the reference crashes (KeyError 'best_in',
    # ovlp_to_graph.py:1314 -- best_in is only populated by
    # mark_best_overlap) on the multi-in-edge junctions that richer
    # multi-window tables produce.  The parity target here is the graph
    # stage, not the engine; falcon_tpu's own lfc handling of those
    # junctions is covered by test_lfc_multi_in_edge_junction below.
    ovls = engine.overlap_blocks(
        store, rids, rids,
        engine.OverlapParams(k=14, min_hits=4, min_overlap=500, topk=1))
    recs = engine.emit_symmetric(ovls)
    from falcon_tpu.overlap import table as otable
    lines = otable.to_lines(recs)
    ovl_fn = os.path.join(tmp, "preads.ovl")
    with open(ovl_fn, "w") as f:
        ofilter.run_ovlp_filter(f, [lambda L=lines: L], max_diff=60,
                                max_cov=60, min_cov=1, min_len=2500,
                                bestn=10)
    # the engine emits store-row ids; name the fasta accordingly (the
    # pipeline driver does the same renumbering, DB2Falcon-style)
    fasta.write_fasta(os.path.join(tmp, "preads4falcon.fasta"),
                      [("%09d" % i, s) for i, (n, s) in enumerate(reads)])
    return ovl_fn


def run_reference(tmp, ovl_fn, lfc=False, improper=False, proper_a=False):
    mod = ref_stage2.load_ref_ovlp_to_graph()
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        args = types.SimpleNamespace(
            overlap_file=ovl_fn, min_len=4000, min_idt=96.0, lfc=lfc,
            disable_chimer_bridge_removal=False)
        mod.ovlp_to_graph(args)
        g2c = ref_stage2.load_ref_graph_to_contig()
        g2c.run(improper_p_ctg=improper, proper_a_ctg=proper_a)
    finally:
        os.chdir(cwd)


def run_mine(tmp, ovl_fn, lfc=False, improper=False, proper_a=False):
    unitigs.ovlp_to_graph(ovl_fn, tmp, min_len=4000, min_idt=96.0,
                          lfc=lfc, set_order_compat=True)
    to_contig.run(tmp, improper_p_ctg=improper, proper_a_ctg=proper_a)


def read(path):
    with open(path) as f:
        return f.read()


def contig_multiset(pa_ctg_fa):
    seqs = sorted(r.sequence for r in fasta.read_fasta(pa_ctg_fa))
    return seqs


def ctg_paths_content(path):
    rows = []
    for line in open(path):
        f = line.split()
        rows.append(tuple(f[1:]))  # drop the id column
    return sorted(rows)


def _compare_all(tmp_ref, tmp_my, expect_chimers=False):
    # sg_edges_list: exact
    assert read(os.path.join(tmp_my, "sg_edges_list")) == \
        read(os.path.join(tmp_ref, "sg_edges_list"))

    # chimers_nodes: content
    ref_chim = sorted(read(os.path.join(tmp_ref, "chimers_nodes")).split())
    assert sorted(read(os.path.join(tmp_my, "chimers_nodes")).split()) == \
        ref_chim
    if expect_chimers:
        assert ref_chim, "dataset did not exercise chimer removal"

    # utg_data / c_path / ctg_paths: exact bytes (set-order compat mode
    # pops the same CPython sets as the reference in this interpreter)
    for fn in ("utg_data", "c_path", "ctg_paths"):
        assert read(os.path.join(tmp_my, fn)) == \
            read(os.path.join(tmp_ref, fn)), "%s differs" % fn

    # contig fasta + tiling paths: exact bytes
    for fn in ("p_ctg.fa", "a_ctg_all.fa", "a_ctg_base.fa",
               "p_ctg_tiling_path", "a_ctg_tiling_path",
               "a_ctg_base_tiling_path"):
        assert read(os.path.join(tmp_my, fn)) == \
            read(os.path.join(tmp_ref, fn)), "%s differs" % fn


def _run_case(tmp_path, reads=None, expect_chimers=False, lfc=False,
              improper=False, proper_a=False):
    import shutil
    tmp_ref = str(tmp_path / "ref")
    tmp_my = str(tmp_path / "mine")
    os.makedirs(tmp_ref)
    os.makedirs(tmp_my)
    make_preads_ovl(tmp_ref, reads=reads)
    shutil.copy(os.path.join(tmp_ref, "preads.ovl"),
                os.path.join(tmp_my, "preads.ovl"))
    shutil.copy(os.path.join(tmp_ref, "preads4falcon.fasta"),
                os.path.join(tmp_my, "preads4falcon.fasta"))
    run_reference(tmp_ref, os.path.join(tmp_ref, "preads.ovl"), lfc=lfc,
                  improper=improper, proper_a=proper_a)
    run_mine(tmp_my, os.path.join(tmp_my, "preads.ovl"), lfc=lfc,
             improper=improper, proper_a=proper_a)
    _compare_all(tmp_ref, tmp_my, expect_chimers=expect_chimers)


def test_stage2_byte_parity(tmp_path):
    _run_case(tmp_path)


def test_stage2_byte_parity_lfc(tmp_path):
    """--lfc mode (resolve_repeat_edges instead of mark_best_overlap,
    reference ovlp_to_graph.py:323-409)."""
    _run_case(tmp_path, lfc=True)


def test_stage2_byte_parity_ctg_flags(tmp_path):
    """--improper-p-ctg + --proper-a-ctg (graph_to_contig.py:420-424)."""
    _run_case(tmp_path, improper=True, proper_a=True)


@pytest.mark.slow
def test_stage2_byte_parity_hard(tmp_path):
    _run_case(tmp_path, reads=make_reads_hard())


@pytest.mark.slow
def test_stage2_byte_parity_hard_lfc(tmp_path):
    _run_case(tmp_path, reads=make_reads_hard(), lfc=True)


def _ref_capture_main(mod, argv, out_fn, tmp):
    import contextlib
    import io as _io
    buf = _io.StringIO()
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        with contextlib.redirect_stdout(buf):
            try:
                mod.main(["prog"] + argv)
            except SystemExit as e:
                assert not e.code
    finally:
        os.chdir(cwd)
    with open(os.path.join(tmp, out_fn), "w") as f:
        f.write(buf.getvalue())


def _my_capture_main(modname, argv, out_fn, tmp):
    import contextlib
    import importlib
    import io as _io
    mod = importlib.import_module("falcon_tpu.mains." + modname)
    buf = _io.StringIO()
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        with contextlib.redirect_stdout(buf):
            rc = mod.main(["prog"] + argv)
            assert not rc
    finally:
        os.chdir(cwd)
    with open(os.path.join(tmp, out_fn), "w") as f:
        f.write(buf.getvalue())


def test_gfa_byte_parity(tmp_path):
    """The GFA chain (dedup_a_tigs -> collect_pread/contig_gfa ->
    gen_gfa_v1/v2) is byte-identical to the reference's on the same
    stage-2 artifacts (the TASK_RUN_FALCON_ASM_SCRIPT recipe,
    reference pype_tasks.py:121-164)."""
    import shutil
    tmp_ref = str(tmp_path / "ref")
    tmp_my = str(tmp_path / "mine")
    os.makedirs(tmp_ref)
    os.makedirs(tmp_my)
    make_preads_ovl(tmp_ref)
    shutil.copy(os.path.join(tmp_ref, "preads.ovl"),
                os.path.join(tmp_my, "preads.ovl"))
    shutil.copy(os.path.join(tmp_ref, "preads4falcon.fasta"),
                os.path.join(tmp_my, "preads4falcon.fasta"))
    run_reference(tmp_ref, os.path.join(tmp_ref, "preads.ovl"))
    run_mine(tmp_my, os.path.join(tmp_my, "preads.ovl"))

    # reference chain
    _ref_capture_main(ref_stage2.load_ref_main("dedup_a_tigs"), [],
                      "a_ctg.fa", tmp_ref)
    _ref_capture_main(ref_stage2.load_ref_main("collect_pread_gfa"), [],
                      "asm.gfa.json", tmp_ref)
    _ref_capture_main(ref_stage2.load_ref_main("collect_pread_gfa"),
                      ["--add-string-graph"], "sg.gfa.json", tmp_ref)
    _ref_capture_main(ref_stage2.load_ref_main("collect_contig_gfa"), [],
                      "contig.gfa2.json", tmp_ref)
    _ref_capture_main(ref_stage2.load_ref_main("gen_gfa_v1"),
                      ["asm.gfa.json"], "asm.gfa", tmp_ref)
    _ref_capture_main(ref_stage2.load_ref_main("gen_gfa_v1"),
                      ["sg.gfa.json"], "sg.gfa", tmp_ref)
    _ref_capture_main(ref_stage2.load_ref_main("gen_gfa_v2"),
                      ["contig.gfa2.json"], "contig.gfa2", tmp_ref)

    # our chain
    _my_capture_main("dedup_a_tigs", [], "a_ctg.fa", tmp_my)
    _my_capture_main("collect_pread_gfa", [], "asm.gfa.json", tmp_my)
    _my_capture_main("collect_pread_gfa", ["--add-string-graph"],
                     "sg.gfa.json", tmp_my)
    _my_capture_main("collect_contig_gfa", [], "contig.gfa2.json", tmp_my)
    _my_capture_main("gen_gfa_v1", ["asm.gfa.json"], "asm.gfa", tmp_my)
    _my_capture_main("gen_gfa_v1", ["sg.gfa.json"], "sg.gfa", tmp_my)
    _my_capture_main("gen_gfa_v2", ["contig.gfa2.json"], "contig.gfa2",
                     tmp_my)

    for fn in ("a_ctg.fa", "asm.gfa", "sg.gfa", "contig.gfa2"):
        assert read(os.path.join(tmp_my, fn)) == \
            read(os.path.join(tmp_ref, fn)), "%s differs" % fn


@pytest.mark.slow
def test_lfc_multi_in_edge_junction(tmp_path):
    """--lfc on a multi-window (topk=3) overlap table: the REFERENCE
    crashes here (KeyError 'best_in', ovlp_to_graph.py:1314 -- lfc mode
    never populates best_in) but falcon_tpu must terminate the contig
    extension at the junction and finish the assembly."""
    tmp = str(tmp_path / "mine")
    os.makedirs(tmp)
    reads = make_reads_hard()
    rs_store = __import__("falcon_tpu.io.readstore",
                          fromlist=["ReadStore"]).ReadStore
    store = rs_store.from_seqs([s for _, s in reads],
                               [n for n, _ in reads])
    rids = np.arange(len(store))
    ovls = engine.overlap_blocks(
        store, rids, rids,
        engine.OverlapParams(k=14, min_hits=4, min_overlap=500, topk=3))
    recs = engine.emit_symmetric(ovls)
    from falcon_tpu.overlap import table as otable
    lines = otable.to_lines(recs)
    ovl_fn = os.path.join(tmp, "preads.ovl")
    with open(ovl_fn, "w") as f:
        ofilter.run_ovlp_filter(f, [lambda L=lines: L], max_diff=60,
                                max_cov=60, min_cov=1, min_len=2500,
                                bestn=10)
    fasta.write_fasta(os.path.join(tmp, "preads4falcon.fasta"),
                      [("%09d" % i, s) for i, (n, s) in enumerate(reads)])
    run_mine(tmp, ovl_fn, lfc=True)
    assert os.path.exists(os.path.join(tmp, "p_ctg.fa"))
    assert contig_multiset(os.path.join(tmp, "p_ctg.fa"))
