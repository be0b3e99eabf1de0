"""REAL multi-process distributed execution (jax.distributed + gloo over
2 local CPU processes): the collective gather paths and the driver's
block-pair striping, compared byte-for-byte against single-process runs.

This is the cluster-scheduler-equivalence test the reference gets from
`job_type=local` bash jobs (reference: run_support.py:200-226,
test_run_support.py:30-33): the same work split across processes must
reproduce the one-process artifact exactly.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(n_procs, args, timeout=240, extra_env=None):
    port = free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        # the axon TPU sitecustomize force-registers its backend and
        # breaks multi-process CPU init; run workers with a clean path
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env.pop("XLA_FLAGS", None)
        env["FTPU_COORDINATOR_ADDRESS"] = "127.0.0.1:%d" % port
        env["FTPU_NUM_PROCESSES"] = str(n_procs)
        env["FTPU_PROCESS_ID"] = str(pid)
        if extra_env:
            env.update(extra_env)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py")]
            + args, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    try:
        rc = [p.wait(timeout=timeout) for p in procs]
    finally:
        # never leave gloo workers behind (an orphan from a timed-out
        # run lingers forever waiting on its peer and poisons later
        # runs on the shared host)
        for p in procs:
            if p.poll() is None:
                p.kill()
    logs = [p.stdout.read().decode() for p in procs]
    assert rc == [0] * n_procs, "\n".join(logs)


def test_two_process_gathers(tmp_path):
    """allgather_lines / allgather_records / allgather_table with
    process_count == 2: both hosts see the identical concatenation in
    host order; >=2^33 record values survive (no int32 downcast)."""
    base = str(tmp_path / "g.txt")
    launch(2, ["gather", base])
    with open(base + ".0") as f:
        v0 = f.read()
    with open(base + ".1") as f:
        v1 = f.read()
    assert v0 == v1
    lines = eval(v0.split("\n")[0])
    assert lines[:3] == ["host0-line0", "host0-line1", "host0-line2"]
    assert lines[-1] == "host1-line3" and len(lines) == 7
    rows = eval(v0.split("\n")[1])
    assert len(rows) == 4 + 8
    assert rows[4][0] >= (1 << 33), "int64 values truncated in gather"
    tbl_lines = v0.split("\n")[2:]
    assert sum(1 for l in tbl_lines if l.strip()) == 5


@pytest.mark.slow
def test_two_process_overlap_store_matches_single(tmp_path):
    """Pipeline._overlap_store with 2 jax processes == 1 process,
    byte-for-byte."""
    from falcon_tpu.io import fasta
    from falcon_tpu.utils import sim
    genome = sim.random_genome(25000, seed=41)
    reads = sim.simulate_reads(genome, coverage=10, mean_len=4000,
                               min_len=1500, error=0.05, seed=42)
    fa = str(tmp_path / "raw.fa")
    fasta.write_fasta(fa, reads, width=80)
    cfg_fn = str(tmp_path / "fc.cfg")
    with open(cfg_fn, "w") as f:
        f.write("[General]\ninput_fofn = %s\ngenome_size = 25000\n"
                "use_device = false\nmasking =\n" % fa)

    # single-process reference run (in-process)
    from falcon_tpu.io import readstore
    from falcon_tpu.overlap import table as T
    from falcon_tpu.pipeline.driver import Pipeline
    p = Pipeline(cfg_fn, str(tmp_path / "single"), use_device=False)
    store = readstore.ReadStore.from_fasta_files([fa])
    store.split_blocks(40_000)
    assert len(store.blocks) >= 3
    tbl = p._overlap_store(store, p._engine_params(0), "sp")
    single_fn = str(tmp_path / "single.ovl")
    T.write_table(single_fn, tbl, terminator=True)

    outs = [str(tmp_path / ("mp%d.ovl" % i)) for i in range(2)]
    port = free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env.pop("XLA_FLAGS", None)
        env["FTPU_COORDINATOR_ADDRESS"] = "127.0.0.1:%d" % port
        env["FTPU_NUM_PROCESSES"] = "2"
        env["FTPU_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             "overlap", cfg_fn, str(tmp_path / ("w%d" % pid)),
             outs[pid]], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    rcs = [p_.wait(timeout=600) for p_ in procs]
    logs = [p_.stdout.read().decode() for p_ in procs]
    assert rcs == [0, 0], "\n".join(logs)

    with open(single_fn) as f:
        want = f.read()
    for fn in outs:
        with open(fn) as f:
            got = f.read()
        assert got == want, "multi-process table differs from " \
            "single-process (%s)" % fn
    assert want.count("\n") > 50


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["host", "dp"])
def test_two_process_full_pipeline_matches_single(tmp_path, monkeypatch,
                                                  backend):
    """FULL Pipeline.run() under 2 jax.distributed gloo processes:
    raw FASTA -> p_ctg.fa / sg_edges_list / asm.gfa must be byte-equal
    on both hosts and equal to the single-process run (the reference's
    job_type=local equivalence, test_run_support.py:30-33, extended
    through every phase).

    backend=dp runs the production DEVICE path with the on-chip
    consensus DP engine (FTPU_CNS_DP=1, the multi-chip scaling
    configuration) on the XLA-CPU backend -- previously only the host
    hybrid had ever run the full multi-process pipeline."""
    from falcon_tpu.io import fasta
    from falcon_tpu.utils import sim
    G = 40000
    genome = sim.random_genome(G, seed=61)
    reads = sim.simulate_reads(genome, coverage=18, mean_len=5000,
                               min_len=1500, error=0.04, seed=62)
    fa = str(tmp_path / "raw.fa")
    fasta.write_fasta(fa, reads, width=80)
    cfg_fn = str(tmp_path / "fc.cfg")
    with open(cfg_fn, "w") as f:
        f.write("""[General]
input_fofn = %s
input_type = raw
genome_size = %d
seed_coverage = 15
length_cutoff = -1
length_cutoff_pr = 1000
pa_DBsplit_option = -x500 -s0.05
ovlp_DBsplit_option = -x500 -s0.05
pa_HPCdaligner_option = -v -e.70 -l1000
ovlp_HPCdaligner_option = -v -e.96 -l500
falcon_sense_option = --output-multi --min-idt 0.70 --min-cov 2 --max-n-read 1800 --n-core 0
overlap_filtering_setting = --max-diff 100 --max-cov 100 --min-cov 1
""" % (fa, G))
    # --n-core 0 = in-process FakePool: forking a worker pool inside the
    # multithreaded jax.distributed processes deadlocks (os.fork + gloo)

    # single-process reference run (same backend as the workers)
    from falcon_tpu.pipeline.driver import Pipeline
    sdir = str(tmp_path / "single")
    os.makedirs(sdir)
    dp = backend == "dp"
    if dp:
        monkeypatch.setenv("FTPU_USE_PALLAS", "0")
        monkeypatch.setenv("FTPU_CNS_DP", "1")
    Pipeline(cfg_fn, sdir, use_device=dp).run()

    # the 2-worker run is load-sensitive (phase skew between the
    # workers while one holds a gloo collective open); a hung attempt is
    # killed by launch() and retried once on a fresh out dir
    import subprocess as _sp
    mode = "pipeline-dp" if dp else "pipeline"
    # FTPU_CNS_DP deliberately NOT set for the workers: under 2-process
    # distribution the DP engine must default ON (mp_worker asserts it)
    extra = {"FTPU_USE_PALLAS": "0"} if dp else None
    for attempt in (1, 2):
        out_base = str(tmp_path / ("mp%d" % attempt))
        try:
            launch(2, [mode, cfg_fn, out_base], timeout=420,
                   extra_env=extra)
            break
        except _sp.TimeoutExpired:
            if attempt == 2:
                raise

    arts = ["2-asm-falcon/p_ctg.fa", "2-asm-falcon/a_ctg.fa",
            "2-asm-falcon/sg_edges_list", "2-asm-falcon/ctg_paths",
            "2-asm-falcon/utg_data", "2-asm-falcon/asm.gfa",
            "2-asm-falcon/sg.gfa", "2-asm-falcon/contig.gfa2",
            "0-rawreads/preads.fasta", "1-preads_ovl/preads.ovl"]
    for rel in arts:
        with open(os.path.join(sdir, rel)) as f:
            want = f.read()
        for pid in range(2):
            with open(os.path.join(out_base + ".%d" % pid, rel)) as f:
                got = f.read()
            assert got == want, "%s differs on host %d" % (rel, pid)
    with open(os.path.join(sdir, "2-asm-falcon/p_ctg.fa")) as f:
        assert f.read().count(">") >= 1
