"""Multi-window candidates: daligner's multiple-local-alignments analog.

The engine extends up to params.topk disjoint diagonal windows per
(a, b, strand) (engine._chain_candidates / ftpu_seed_chain_impl) and
dedups records that converge to the same extents (_dedup_extents).  The
reference consumes every .las record of a pair
(falcon_kit/mains/ovlp_filter.py:112-191); a single window per pair
loses the true dovetail overlap whenever a repeat window out-seeds it.
"""
import numpy as np
import pytest

from falcon_tpu.io import readstore
from falcon_tpu.overlap import engine
from falcon_tpu.utils import sim


def _store_from_seqs(seqs):
    import tempfile
    from falcon_tpu.io import fasta
    with tempfile.NamedTemporaryFile("w", suffix=".fa",
                                     delete=False) as f:
        for i, s in enumerate(seqs):
            f.write(">r%d\n%s\n" % (i, s))
        fn = f.name
    return readstore.ReadStore.from_fasta_files([fn], min_len=0)


def _mut(seq, rng, err):
    a = np.frombuffer(seq.encode(), np.uint8)
    return sim.mutate(a, rng, sub=err / 3, ins=err / 3,
                      dele=err / 3).tobytes().decode()


def test_tandem_pair_emits_multiple_records():
    """Two reads inside a tandem array truly align at several shifts;
    topk>=2 must emit multiple records for the pair, with distinct
    extents (dedup keeps them apart)."""
    rng = np.random.RandomState(3)
    unit = sim.random_genome(500, seed=17)
    array = unit * 16                      # 8 kb tandem array
    A = array[0:4000]
    B = _mut(array[1000:5000], rng, 0.02)
    store = _store_from_seqs([A, B])
    params = engine.OverlapParams(min_overlap=500, min_idt=0.0, topk=3,
                                  max_kmer_freq=64)
    tbl = engine.overlap_blocks(store, np.arange(2), np.arange(2), params)
    pair = tbl[(tbl["a_id"] == 0) & (tbl["b_id"] == 1)]
    assert len(pair) >= 2, \
        "tandem pair should produce multiple records, got %d" % len(pair)
    # extents genuinely distinct (not dedup leakage)
    bs = np.sort(pair["b_start"])
    assert np.all(np.diff(bs) >= 50)

    # topk=1 emits exactly one
    params1 = engine.OverlapParams(min_overlap=500, min_idt=0.0, topk=1,
                                   max_kmer_freq=64)
    tbl1 = engine.overlap_blocks(store, np.arange(2), np.arange(2),
                                 params1)
    assert len(tbl1[(tbl1["a_id"] == 0) & (tbl1["b_id"] == 1)]) == 1


def test_repeat_window_no_longer_shadows_true_overlap():
    """A pair whose shared exact repeat out-seeds the noisy true dovetail
    overlap: with topk=1 the repeat window wins, its extension runs
    through non-homologous flanks and dies on identity; with topk=3 the
    true overlap window is also extended and the record survives."""
    rng = np.random.RandomState(5)
    R = sim.random_genome(2500, seed=23)          # exact repeat copy
    uA = sim.random_genome(3000, seed=24)
    uM = sim.random_genome(2000, seed=25)         # A/B junction unique
    uB = sim.random_genome(3000, seed=26)
    # genome: [uA][R][uM][R][uB]; A covers up to mid-uM+, B from mid-uM-
    genome = uA + R + uM + R + uB
    A = _mut(genome[0:7000], rng, 0.10)           # uA + R + uM(1.5k)
    B = _mut(genome[6000:13000], rng, 0.10)       # uM(1.5k) + R + uB
    store = _store_from_seqs([A, B])

    def run(topk):
        params = engine.OverlapParams(min_overlap=800, min_idt=0.60,
                                      topk=topk)
        tbl = engine.overlap_blocks(store, np.arange(2), np.arange(2),
                                    params)
        return tbl[(tbl["a_id"] == 0) & (tbl["b_id"] == 1)]

    multi = run(3)
    assert len(multi) >= 1, "true overlap lost even with topk=3"
    # the true overlap record spans the uM junction: a_end near len(A),
    # b_start near 0
    good = multi[(multi["a_end"] > len(A) - 300) &
                 (multi["b_start"] < 300)]
    assert len(good) >= 1, "no dovetail record: %r" % multi
    single = run(1)
    # with one window, either the pair is lost or the surviving record
    # is the repeat-anchored one that fails the dovetail shape; if the
    # seeder happened to pick the true window this case can pass too --
    # the hard guarantee is only monotonicity:
    assert len(multi) >= len(single)


def test_dedup_extents_unit():
    a_id = np.array([1, 1, 1, 2], np.int64)
    b_id = np.array([2, 2, 2, 3], np.int64)
    st = np.array([0, 0, 0, 0], np.int64)
    a_s = np.array([100, 120, 900, 0], np.int64)
    a_e = np.array([5000, 5010, 6000, 500], np.int64)
    b_s = np.array([0, 10, 800, 0], np.int64)
    b_e = np.array([4900, 4880, 5900, 500], np.int64)
    dist = np.array([40, 30, 50, 5], np.int64)
    keep = engine._dedup_extents(a_id, b_id, st, a_s, a_e, b_s, b_e, dist)
    # rows 0/1 are the same alignment -> keep row 1 (lower dist);
    # row 2 distinct; row 3 different pair
    assert keep.tolist() == [False, True, True, True]


@pytest.mark.slow
def test_repeat_dense_genome_recall():
    """Recall vs simulated truth on a ~25% repeat genome: topk=3 must
    close the single-window gap (VERDICT r2 item 3)."""
    rng = np.random.RandomState(11)
    R = sim.random_genome(3000, seed=31)
    parts = []
    for i in range(8):
        parts.append(sim.random_genome(9000, seed=40 + i))
        parts.append(R)
    genome = "".join(parts)                 # 96 kb, 25% repeat
    reads, positions = [], []
    # uniform tiling reads with known positions (truth for recall)
    L, step = 8000, 1500
    for i, s in enumerate(range(0, len(genome) - L, step)):
        reads.append(("read%03d" % i, _mut(genome[s:s + L], rng, 0.10)))
        positions.append((s, s + L))
    import tempfile
    from falcon_tpu.io import fasta
    with tempfile.NamedTemporaryFile("w", suffix=".fa",
                                     delete=False) as f:
        for n, s in reads:
            f.write(">%s\n%s\n" % (n, s))
        fn = f.name
    store = readstore.ReadStore.from_fasta_files([fn], min_len=0)
    n = len(store)
    rids = np.arange(n)

    # truth: pairs overlapping by >= 2000 genome bases
    truth = set()
    for i in range(n):
        for j in range(i + 1, n):
            s = max(positions[i][0], positions[j][0])
            e = min(positions[i][1], positions[j][1])
            if e - s >= 2000:
                truth.add((i, j))

    def recall(topk):
        params = engine.OverlapParams(min_overlap=1000, min_idt=0.60,
                                      topk=topk)
        tbl = engine.overlap_blocks(store, rids, rids, params)
        found = set()
        for r in tbl:
            i, j = int(r["a_id"]), int(r["b_id"])
            found.add((min(i, j), max(i, j)))
        return len(found & truth) / len(truth)

    r1 = recall(1)
    r3 = recall(3)
    assert r3 >= r1, (r1, r3)
    assert r3 > 0.9, "topk=3 recall %.3f too low (topk=1: %.3f)" % (r3, r1)
    # the single-window configuration must actually have had a gap for
    # this dataset to be a meaningful regression test; if this ever
    # starts failing because r1 improved to parity, the dataset needs
    # more repeat density, not a looser assert
    assert r3 > r1, "dataset no longer separates topk=1 from topk=3"
