"""Bit-parity of falcon_tpu.ops.kmer vs the compiled reference C."""
import numpy as np
import pytest

from falcon_tpu.ops import kmer as KM

from . import oracle


def _have_oracle():
    try:
        oracle.get_lib()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have_oracle(),
                                reason="reference oracle unavailable")

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(rng, n):
    return BASES[rng.randint(0, 4, n)].tobytes()


def mutate(t, rng, err):
    out = []
    for ch in np.frombuffer(t, dtype=np.uint8):
        r = rng.rand()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            out.append(BASES[rng.randint(4)])
        out.append(ch)
    return np.asarray(out, dtype=np.uint8).tobytes()


def run_case(target, query, K, mask_th=None, bin_size=None, count_th=5):
    ok = oracle.OracleKmer(target, K)
    if mask_th is not None:
        ok.mask(mask_th)
    qp_e, tp_e = ok.find(query)

    lk = KM.KmerLookup(target, K)
    if mask_th is not None:
        lk.mask(mask_th)
    qp_g, tp_g = lk.find_kmer_pos_for_seq(query)

    assert list(qp_g) == qp_e
    assert list(tp_g) == tp_e

    if bin_size is not None and len(qp_e) > 0:
        exp1 = ok.best_range(bin_size, count_th, variant=1)
        got1 = KM.find_best_aln_range(qp_g, tp_g, K, bin_size, count_th)
        assert got1.astuple() == exp1
        exp2 = ok.best_range(bin_size, count_th, variant=2)
        got2 = KM.find_best_aln_range2(qp_g, tp_g, K, bin_size, count_th)
        assert got2.astuple() == exp2
    ok.close()


def test_hits_basic():
    rng = np.random.RandomState(0)
    t = rand_seq(rng, 3000)
    q = mutate(t, rng, 0.1)
    run_case(t, q, 8, bin_size=48)


def test_hits_identical():
    rng = np.random.RandomState(1)
    t = rand_seq(rng, 2000)
    run_case(t, t, 8, bin_size=48)


def test_hits_masked():
    rng = np.random.RandomState(2)
    core = rand_seq(rng, 400)
    t = core * 6  # heavy repeats -> masking active
    q = mutate(t, rng, 0.05)
    run_case(t, q, 8, mask_th=16, bin_size=48)


def test_hits_unrelated():
    rng = np.random.RandomState(3)
    t = rand_seq(rng, 1500)
    q = rand_seq(rng, 1500)
    run_case(t, q, 8, bin_size=48)


def test_various_K():
    rng = np.random.RandomState(4)
    t = rand_seq(rng, 4000)
    q = mutate(t, rng, 0.15)
    for K in (8, 12):  # K=14 covered too but its 4^14 oracle table is slow
        run_case(t, q, K, bin_size=K * 6)


def test_range2_used_by_get_alignment():
    # parameters from reference consensus.py:61 get_alignment
    rng = np.random.RandomState(5)
    t = rand_seq(rng, 6000)
    q = mutate(t, rng, 0.08)
    run_case(t, q, 8, mask_th=16, bin_size=8 * 50, count_th=25)
