"""Cached k-mer tables (BlockIndex.native_table / AView) must produce
overlap tables identical to fresh per-pair builds -- the driver reuses
them across the block-pair triangle (pipeline.driver._overlap_store)."""
import numpy as np
import pytest

from falcon_tpu.io import readstore
from falcon_tpu.overlap import engine
from falcon_tpu.ops import native
from falcon_tpu.utils import sim


@pytest.fixture(scope="module")
def store():
    import os
    import tempfile
    g = sim.random_genome(60_000, seed=5)
    reads = sim.simulate_reads(g, coverage=8, seed=6)
    d = tempfile.mkdtemp()
    fa = os.path.join(d, "r.fasta")
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(">r%d\n%s\n" % (i, r))
    return readstore.ReadStore.from_fasta_files([fa])


def test_cached_tables_match_fresh(store):
    if not native.available():
        pytest.skip("native lib unavailable")
    params = engine.OverlapParams()
    blocks = store.split_blocks(block_bases=120_000)
    assert len(blocks) >= 2
    a, b = blocks[0], blocks[1]

    fresh = engine.overlap_blocks(store, a, b, params)

    # prebuilt + REUSED across two calls (the driver's cache pattern)
    index = engine.BlockIndex(store, b, params, build_tables=False)
    av = engine.AView(store, a, params)
    for _ in range(2):
        cached = engine.overlap_blocks(store, a, b, params,
                                       index=index, a_view=av)
        assert len(cached) == len(fresh)
        for name in fresh.dtype.names:
            np.testing.assert_array_equal(cached[name], fresh[name])
    # tables were actually cached (one build per strand / stride)
    assert set(index._ntabs) == {0, 1}
    assert av._qtab is not None


def test_seed_chain_tables_matches_fused(store):
    if not native.available():
        pytest.skip("native lib unavailable")
    params = engine.OverlapParams()
    blocks = store.split_blocks(block_bases=120_000)
    a, b = blocks[0], blocks[1]
    av = engine.AView(store, a, params)
    ix = engine.BlockIndex(store, b, params, build_tables=False)
    for strand, seed in ((0, ix.seed_fwd), (1, ix.seed_rev)):
        fused = native.seed_chain(
            av.seed, av.offsets, seed, ix.offsets, params.k,
            params.stride, params.max_kmer_freq, params.bin_size,
            params.min_hits, 2, av.rids, ix.rids, params.topk)
        split = native.seed_chain_tables(
            av.native_table(), ix.native_table(strand), av.offsets,
            ix.offsets, params.max_kmer_freq, params.bin_size,
            params.min_hits, 2, av.rids, ix.rids, params.topk)
        for f, s in zip(fused, split):
            np.testing.assert_array_equal(f, s)
