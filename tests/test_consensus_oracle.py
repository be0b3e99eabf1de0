"""Bit-parity of falcon_tpu.ops.consensus_dp vs the reference C
generate_consensus (src/c/falcon.c:562)."""
import numpy as np
import pytest

from falcon_tpu.ops import consensus_dp as C
from falcon_tpu.utils import sim

from . import oracle


def _have_oracle():
    try:
        oracle.get_lib()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have_oracle(),
                                reason="reference oracle unavailable")


def make_group(seed_len=3000, n_support=12, err=0.12, seed=0):
    """Seed read + noisy support reads drawn from the same template, in the
    layout fc_consensus feeds the kernel (seed duplicated at [0] and [1],
    reference consensus.py:183-188)."""
    rng = np.random.RandomState(seed)
    genome = sim.random_genome(seed_len + 2000, seed=seed + 77)
    g = np.frombuffer(genome.encode(), dtype=np.uint8)
    start = rng.randint(0, 1000)
    tmpl = g[start:start + seed_len]
    seed_read = sim.mutate(tmpl, rng, sub=err / 6, ins=err / 6, dele=err / 6)
    seqs = [seed_read.tobytes().decode()]
    seqs.append(seqs[0])  # seed is used again by design
    for _ in range(n_support):
        s = rng.randint(0, 800)
        ln = rng.randint(seed_len // 2, seed_len + 1000)
        frag = g[s:s + ln]
        e = err / 3
        read = sim.mutate(frag, rng, sub=e, ins=e, dele=e)
        seqs.append(read.tobytes().decode())
    return seqs


@pytest.mark.parametrize("case", range(4))
def test_generate_consensus_parity(case):
    params = [
        dict(seed_len=2500, n_support=10, err=0.10, seed=case),
        dict(seed_len=4000, n_support=20, err=0.16, seed=case + 10),
        dict(seed_len=1500, n_support=6, err=0.06, seed=case + 20),
        dict(seed_len=3000, n_support=15, err=0.22, seed=case + 30),
    ][case]
    seqs = make_group(**params)
    exp = oracle.oracle_generate_consensus(seqs, min_cov=6, K=8, min_idt=0.70)
    got = C.generate_consensus(seqs, min_cov=6, K=8, min_idt=0.70)
    assert got == exp


def test_low_coverage_lowercase():
    seqs = make_group(seed_len=2000, n_support=3, err=0.08, seed=5)
    exp = oracle.oracle_generate_consensus(seqs, min_cov=6, K=8, min_idt=0.70)
    got = C.generate_consensus(seqs, min_cov=6, K=8, min_idt=0.70)
    assert got == exp


def test_no_alignable_supports():
    rng = np.random.RandomState(9)
    seqs = [sim.random_genome(2000, seed=i) for i in range(4)]
    exp = oracle.oracle_generate_consensus(seqs, min_cov=6, K=8, min_idt=0.70)
    got = C.generate_consensus(seqs, min_cov=6, K=8, min_idt=0.70)
    assert got == exp == ""
