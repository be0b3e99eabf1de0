"""Bit-parity of falcon_tpu.ops.align vs the compiled reference C aligner."""
import numpy as np
import pytest

from falcon_tpu.ops import align as A

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


def mutate(seq, rng, err):
    out = []
    for ch in seq:
        r = rng.rand()
        if r < err / 3:
            continue  # del
        if r < 2 * err / 3:
            out.append(BASES[rng.randint(4)])  # ins (before)
        if r < err:
            out.append(BASES[rng.randint(4)])
        else:
            out.append(ch)
    return np.asarray(out, dtype=np.uint8).tobytes()


def rand_seq(rng, n):
    return BASES[rng.randint(0, 4, n)].tobytes()


def check_pair(q, t, band):
    got = A.align(q, t, band, True)
    exp = oracle.oracle_align(q, t, band, True)
    assert got.aln_str_size == exp["aln_str_size"]
    assert got.dist == exp["dist"]
    assert (got.aln_q_s, got.aln_q_e) == (exp["aln_q_s"], exp["aln_q_e"])
    assert (got.aln_t_s, got.aln_t_e) == (exp["aln_t_s"], exp["aln_t_e"])
    assert got.q_aln_str == exp["q_aln_str"]
    assert got.t_aln_str == exp["t_aln_str"]


def test_identical():
    rng = np.random.RandomState(0)
    s = rand_seq(rng, 2000)
    check_pair(s, s, 150)


def test_noisy_pairs():
    rng = np.random.RandomState(1)
    for err in (0.02, 0.1, 0.25):
        for n in (300, 1500, 5000):
            t = rand_seq(rng, n)
            q = mutate(np.frombuffer(t, dtype=np.uint8), rng, err)
            check_pair(q, t, 150)


def test_unalignable():
    rng = np.random.RandomState(2)
    q = rand_seq(rng, 1000)
    t = rand_seq(rng, 1000)
    check_pair(q, t, 100)


def test_asymmetric_lengths():
    rng = np.random.RandomState(3)
    t = rand_seq(rng, 4000)
    q = mutate(np.frombuffer(t, dtype=np.uint8)[500:2500], rng, 0.12)
    check_pair(q, t, 150)
    check_pair(t, q, 150)


def test_tiny():
    check_pair(b"ACGT", b"ACGT", 10)
    check_pair(b"A", b"T", 10)
    check_pair(b"", b"ACGT", 10)


def test_score_only():
    rng = np.random.RandomState(4)
    t = rand_seq(rng, 3000)
    q = mutate(np.frombuffer(t, dtype=np.uint8), rng, 0.15)
    got = A.align(q, t, 150, False)
    exp = oracle.oracle_align(q, t, 150, False)
    assert got.dist == exp["dist"]
    assert got.aln_str_size == exp["aln_str_size"]
    assert (got.aln_q_e, got.aln_t_e) == (exp["aln_q_e"], exp["aln_t_e"])


def test_wide_band_long():
    rng = np.random.RandomState(5)
    t = rand_seq(rng, 12000)
    q = mutate(np.frombuffer(t, dtype=np.uint8), rng, 0.18)
    check_pair(q, t, 1500)
