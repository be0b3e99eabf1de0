"""Device consensus engine: align_tb kernel + DeviceCns vs the exact host
kernel (quality), and the device-path end-to-end assembly."""
import io
import os

import numpy as np
import pytest

from falcon_tpu.cns import runner
from falcon_tpu.cns.device import (DeviceCns, gate_group_ranged,
                                   run_consensus_device, seq_to_codes)
from falcon_tpu.ops import native, align as pyalign

A = np.frombuffer(b"ACGT", dtype=np.uint8)


def noisy(t_arr, err, rng):
    out = []
    for c in t_arr:
        r = rng.rand()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            out.append(rng.randint(0, 4))
            out.append(int(c))
            continue
        if r < err:
            out.append((int(c) + rng.randint(1, 4)) % 4)
            continue
        out.append(int(c))
    return np.array(out, dtype=np.uint8)


def _al(q, t, band=1000):
    if native.available():
        return native.align(q, t, band, False)
    return pyalign.align(q, t, band, False)


def test_align_tb_roundtrip():
    from falcon_tpu.ops.align_tb import (align_tb_batch, moves_to_alignment,
                                         unpack_moves)
    import jax.numpy as jnp
    rng = np.random.RandomState(11)
    t = rng.randint(0, 4, 900).astype(np.uint8)
    q = noisy(t, 0.2, rng)
    B, L = 8, 1024
    qb = np.full((B, L), 4, np.int8)
    tb = np.full((B, L), 5, np.int8)
    qb[0, :len(q)] = q
    tb[0, :len(t)] = t
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    ql[0], tl[0] = len(q), len(t)
    bi, bj, bd, mvp = [np.asarray(x) for x in align_tb_batch(
        jnp.asarray(qb), jnp.asarray(ql), jnp.asarray(tb),
        jnp.asarray(tl), W=128)]
    mv = unpack_moves(mvp)
    qa, ta = moves_to_alignment(q, t, mv[:, 0])
    assert len(qa) == len(ta) > 0
    # column counts must reproduce the endpoint and the distance
    nq = sum(1 for c in qa if c != ord("-"))
    nt = sum(1 for c in ta if c != ord("-"))
    assert (nq, nt) == (bi[0], bj[0])
    d = sum(1 for a, b in zip(qa, ta) if a != b)
    assert d == bd[0]
    # pad rows must be inert
    assert (bi[1:] == 0).all() and (mv[:, 1:] == 3).all()


def test_device_consensus_quality_vs_host():
    """DeviceCns preads must match the exact host kernel's to >=99.5%."""
    rng = np.random.RandomState(5)
    truth = rng.randint(0, 4, 4000).astype(np.uint8)
    seed_seq = A[truth].tobytes().decode()
    items = [("000000000", seed_seq, None)]
    for k in range(14):
        sup = A[noisy(truth, 0.12, rng)].tobytes().decode()
        items.append(("%09d" % (k + 1), sup,
                      (0, len(sup), 0, len(seed_seq))))
    cfg = runner.ConsensusConfig(min_cov=2, min_idt=0.70, min_n_read=4,
                                 min_cov_aln=4, output_multi=False)

    out_dev = io.StringIO()
    n_dev = run_consensus_device(
        iter([("000000000", items)]), cfg, out_dev)
    assert n_dev == 1

    out_host = io.StringIO()
    n_host = runner.run_consensus(
        iter([("000000000", [(rid, s) for rid, s, _ in items])]),
        cfg, out_host, n_core=0)
    assert n_host == 1

    dev_seq = "".join(out_dev.getvalue().splitlines()[1:])
    host_seq = "".join(out_host.getvalue().splitlines()[1:])
    a = _al(dev_seq, host_seq)
    idt = 1 - a.dist / max(1, a.aln_str_size)
    assert a.aln_str_size > 0.9 * min(len(dev_seq), len(host_seq))
    assert idt > 0.995, "device consensus diverges: idt=%.4f" % idt
    # both must be close to the truth
    t_str = A[truth].tobytes().decode()
    for s in (dev_seq, host_seq):
        a = _al(s, t_str)
        assert 1 - a.dist / max(1, a.aln_str_size) > 0.99


def test_gate_group_ranged_matches_plain_gate():
    """Same sequences in, same (ordered) support sequences out."""
    rng = np.random.RandomState(9)
    truth = rng.randint(0, 4, 2500).astype(np.uint8)
    seed_seq = A[truth].tobytes().decode()
    items = [("s", seed_seq, None)]
    for k in range(8):
        n = rng.randint(800, 2500)
        items.append(("r%d" % k, A[truth[:n]].tobytes().decode(),
                      (0, n, 0, n)))
    cfg = runner.ConsensusConfig(min_n_read=3, min_cov_aln=2,
                                 max_n_read=6, max_cov_aln=4)
    g = gate_group_ranged("s", items, cfg)
    plain = runner.gate_group("s", [(rid, s) for rid, s, _ in items], cfg)
    assert g is not None and plain is not None
    seed_seq_g, sups = g
    assert seed_seq_g == plain[0]
    # plain: [seed, seed-as-support, sorted sups...]; ranged: sups only
    assert [s for s, _, _ in sups] == plain[1:]


@pytest.mark.slow
def test_full_assembly_device(tmp_path):
    """End-to-end with the device extension + device consensus paths
    (CPU backend): contigs must reconstruct the genome."""
    from falcon_tpu.io import fasta
    from falcon_tpu.pipeline.driver import Pipeline
    from falcon_tpu.utils import sim
    from tests.test_pipeline_e2e import write_cfg
    os.chdir(tmp_path)
    G = 40000
    genome = sim.random_genome(G, seed=21)
    reads = sim.simulate_reads(genome, coverage=18, mean_len=6000,
                               min_len=1500, error=0.04, seed=22)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", G)
    os.environ["FTPU_USE_PALLAS"] = "0"      # CPU backend
    try:
        p_ctg = Pipeline("fc_run.cfg", str(tmp_path), use_device=True).run()
    finally:
        del os.environ["FTPU_USE_PALLAS"]
    ctgs = list(fasta.read_fasta(p_ctg))
    assert ctgs, "no contigs produced"
    longest = max(ctgs, key=lambda c: len(c.sequence))
    assert len(longest.sequence) > 0.75 * G
    from falcon_tpu.graph.to_contig import rc
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
    a = _al(s[500:500 + L], g[p:p + L + int(0.1 * L)], 1500)
    idt = 1 - a.dist / max(1, a.aln_str_size)
    assert idt > 0.995, "contig identity %.4f too low" % idt


def test_native_moves_to_alns_parity():
    """C++ batch reconstruction == python moves_to_alignment per lane."""
    if not native.available():
        pytest.skip("no native lib")
    from falcon_tpu.ops.align_tb import (pack_moves, unpack_moves,
                                         moves_to_alignment)
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    B, S = 6, 64
    mv = rng.choice([0, 1, 2, 3], size=(S, B),
                    p=[.4, .2, .2, .2]).astype(np.int8)
    mv[:10, 3] = 3  # leading inactive run
    packed = np.asarray(pack_moves(jnp.asarray(mv)))
    tasks = []
    for k in range(B):
        m = mv[:, k][mv[:, k] != 3]
        nq = int((m != 1).sum())
        nt = int((m != 2).sum())
        tasks.append((rng.randint(0, 5, max(nq, 1)).astype(np.uint8),
                      rng.randint(0, 5, max(nt, 1)).astype(np.uint8)))
    alns = native.moves_to_alns(packed, np.arange(B, dtype=np.int32),
                                [q for q, _ in tasks],
                                [t for _, t in tasks])
    mvu = unpack_moves(packed)
    for k in range(B):
        qa, ta = moves_to_alignment(tasks[k][0], tasks[k][1], mvu[:, k])
        assert alns[k] == (len(qa), qa, ta)
