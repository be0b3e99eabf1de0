"""Dust/tandem soft-mask tracks (io.masking): unit behavior, seed
suppression in the overlap engine, and repeat-genome assembly."""
import os

import numpy as np
import pytest

from falcon_tpu.io import masking, readstore
from falcon_tpu.overlap import engine


def codes(s):
    return readstore.encode_seq(s)


def flat(seqs):
    lens = np.array([len(s) for s in seqs], np.int64)
    offs = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    return np.concatenate([codes(s) for s in seqs]), offs


def random_seq(n, seed=0):
    rng = np.random.RandomState(seed)
    A = np.frombuffer(b"ACGT", np.uint8)
    return A[rng.randint(0, 4, n)].tobytes().decode()


def test_dust_flags_low_complexity_not_random():
    rnd = random_seq(2000, 1)
    lc = "A" * 300 + "AT" * 150 + "CAG" * 100
    data, offs = flat([rnd, lc, rnd])
    m = masking.dust_mask(data, offs)
    n = len(rnd)
    frac_rnd = m[:n].mean()
    frac_lc = m[n:n + len(lc)].mean()
    assert frac_lc > 0.8, "low-complexity read not dusted: %.2f" % frac_lc
    assert frac_rnd < 0.05, "random read over-dusted: %.2f" % frac_rnd


def test_tandem_flags_array_not_random():
    rnd = random_seq(3000, 2)
    unit = random_seq(40, 3)
    tand = rnd[:500] + unit * 60 + rnd[500:1000]
    data, offs = flat([rnd, tand])
    m = masking.tandem_mask(data, offs)
    n = len(rnd)
    arr = m[n + 500:n + 500 + 40 * 60]
    assert arr.mean() > 0.9, "tandem array not masked: %.2f" % arr.mean()
    assert m[:n].mean() < 0.02


def test_mask_does_not_leak_across_reads():
    """The same k-mer in two different reads is NOT tandem evidence."""
    unit = random_seq(600, 4)
    data, offs = flat([unit, unit])     # identical reads, no self-repeat
    m = masking.tandem_mask(data, offs)
    assert not m.any()


def test_store_masks_round_trip(tmp_path):
    rnd = random_seq(1500, 5)
    lc = "ACAC" * 200
    store = readstore.ReadStore.from_seqs([rnd, lc, rnd])
    store.build_masks()
    store.split_blocks()
    fn = str(tmp_path / "db")
    store.save(fn)
    st2 = readstore.ReadStore.load(fn)
    assert st2.mask is not None
    assert np.array_equal(st2.mask, store.mask)
    assert st2.get_mask(1).mean() > 0.5


def test_masks_bound_seed_candidates():
    """A tandem-heavy genome must not blow up the candidate-pair count
    when masks are on (the quadratic seed blowup DBdust/TANmask exist
    to prevent)."""
    from falcon_tpu.utils import sim
    rng = np.random.RandomState(6)
    G = 30000
    base = sim.random_genome(G, seed=6)
    unit = base[1000:1030]
    genome = base[:10000] + unit * 200 + base[10000:]   # 6kb tandem array
    reads = sim.simulate_reads(genome, coverage=8, mean_len=5000,
                               min_len=1500, error=0.02, seed=7)
    store = readstore.ReadStore.from_seqs([s for _, s in reads])
    params = engine.OverlapParams(k=14, min_hits=4, stride=4,
                                  min_overlap=800)
    rids = np.arange(len(store), dtype=np.int64)

    def count_cands(st):
        seen = []
        orig = engine.extend_pairs_host

        def spy(store_, index, rids_a, cands, p):
            seen.append(len(cands))
            from falcon_tpu.overlap import table as T
            return T.empty(0)

        engine.overlap_blocks(st, rids, rids, params, aligner=spy)
        return sum(seen)

    n_unmasked = count_cands(store)
    store.build_masks()
    n_masked = count_cands(store)
    assert n_masked < n_unmasked, (n_masked, n_unmasked)
    # bounded: within 4x of a repeat-free genome of the same size
    store_clean = readstore.ReadStore.from_seqs(
        [s for _, s in sim.simulate_reads(base + base[:6000], coverage=8,
                                          mean_len=5000, min_len=1500,
                                          error=0.02, seed=7)])
    store_clean.build_masks()
    n_clean = count_cands(store_clean)
    assert n_masked < 4 * max(n_clean, 1), (n_masked, n_clean)


@pytest.mark.slow
def test_repeat_genome_assembles(tmp_path):
    """Full pipeline over a genome with a tandem array + dispersed
    repeats: same contig count as the repeat-free equivalent (one), good
    identity on the unique flanks."""
    from falcon_tpu.io import fasta
    from falcon_tpu.pipeline.driver import Pipeline
    from falcon_tpu.utils import sim
    from tests.test_pipeline_e2e import write_cfg
    os.chdir(tmp_path)
    G = 60000
    base = sim.random_genome(G, seed=31)
    unit = base[2000:2030]
    line = base[30000:32000]
    genome = (base[:15000] + unit * 120 + base[15000:40000] + line +
              base[40000:50000] + line + base[50000:])
    reads = sim.simulate_reads(genome, coverage=20, mean_len=8000,
                               min_len=2000, error=0.04, seed=32)
    fasta.write_fasta("raw_reads.fa", reads, width=80)
    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    write_cfg("fc_run.cfg", len(genome))
    p_ctg = Pipeline("fc_run.cfg", str(tmp_path), use_device=False).run()
    ctgs = list(fasta.read_fasta(p_ctg))
    assert len(ctgs) >= 1
    longest = max(ctgs, key=lambda c: len(c.sequence))
    assert len(longest.sequence) > 0.75 * len(genome), \
        "repeat genome fragmented: %d of %d" % (len(longest.sequence),
                                                len(genome))


def test_native_mask_parity_and_speed():
    """C++ dust/tandem masks are bit-identical to the numpy reference on
    a store with homopolymers, microsatellites, tandem arrays, Ns and
    read boundaries splitting repeats."""
    import time
    import numpy as np
    from falcon_tpu.io import masking
    from falcon_tpu.ops import native
    if not native.available():
        import pytest
        pytest.skip("native unavailable")
    rng = np.random.RandomState(3)
    parts = []
    lens = []
    for i in range(40):
        seq = rng.randint(0, 4, 4000).astype(np.uint8)
        if i % 3 == 0:
            seq[100:160] = 2                        # homopolymer
        if i % 4 == 0:
            unit = rng.randint(0, 4, 7)
            seq[1000:1000 + 70 * 7] = np.tile(unit, 70)   # microsat
        if i % 5 == 0:
            unit = rng.randint(0, 4, 150)
            seq[2000:2000 + 10 * 150] = np.tile(unit, 10)  # tandem
        if i % 7 == 0:
            seq[500:505] = 9                        # Ns
        parts.append(seq)
        lens.append(len(seq))
    codes = np.concatenate(parts)
    offsets = np.zeros(len(parts) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])

    for np_fn, nat_fn, kw in (
            (masking.dust_mask, native.dust_mask, {}),
            (masking.tandem_mask, native.tandem_mask, {})):
        want = np_fn(codes, offsets, **kw)
        got = nat_fn(codes, offsets, **kw)
        np.testing.assert_array_equal(got, want,
                                      err_msg=np_fn.__name__)
    # sanity: the planted tandem region is masked
    t = native.tandem_mask(codes, offsets)
    assert t[offsets[0] + 2100:offsets[0] + 3200].mean() > 0.9
