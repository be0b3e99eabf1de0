"""Overlap-engine internals: packed-key chaining vs a brute-force
reference, and the native seed join's index-emitting variant."""
import numpy as np
import pytest

from falcon_tpu.overlap import engine
from falcon_tpu.ops import native


def brute_chain(qpos, tpos, a, b, s, params):
    """Straightforward per-pair densest-window selection (the semantics
    _chain_candidates vectorizes): group by (a, b, strand); count hits
    per diagonal bin; combine adjacent bins; pick max count (ties:
    lower bin); anchor = min (qpos, tpos) of the winning window."""
    from collections import defaultdict
    groups = defaultdict(list)
    for k in range(len(qpos)):
        groups[(int(a[k]), int(b[k]), int(s[k]))].append(
            (int(qpos[k]), int(tpos[k])))
    out = []
    for (ai, bi, si), hits in sorted(groups.items()):
        bins = defaultdict(list)
        for (q, t) in hits:
            bins[(q - t) // params.bin_size].append((q, t))
        best = None
        for bn in sorted(bins):
            comb = bins[bn] + bins.get(bn + 1, [])
            if best is None or len(comb) > len(best[1]):
                best = (bn, comb)
        if best is None or len(best[1]) < params.min_hits:
            continue
        q, t = min(best[1])
        out.append((ai, bi, si, q, t, len(best[1])))
    return out


def test_chain_candidates_vs_brute():
    rng = np.random.RandomState(3)
    n = 4000
    a = rng.randint(0, 12, n)
    b = rng.randint(0, 12, n)
    s = rng.randint(0, 2, n)
    # clustered diagonals plus noise
    base_diag = (a * 31 + b * 7) % 900
    qpos = rng.randint(0, 3000, n)
    tpos = np.maximum(0, qpos - base_diag - rng.randint(-40, 40, n))
    params = engine.OverlapParams(min_hits=3, bin_size=256)
    got = engine._chain_candidates(qpos.astype(np.int64),
                                   tpos.astype(np.int64),
                                   a.astype(np.int64), b.astype(np.int64),
                                   s.astype(np.int64), params)
    want = brute_chain(qpos, tpos, a, b, s, params)
    assert sorted(got) == sorted(want)


def test_chain_candidates_empty():
    z = np.zeros(0, dtype=np.int64)
    assert engine._chain_candidates(
        z, z, z, z, z, engine.OverlapParams()) == []


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_seed_hits_idx_matches_flat():
    rng = np.random.RandomState(7)
    genome = rng.randint(0, 4, 30000).astype(np.uint8)

    def mkblock(n):
        reads = []
        for _ in range(n):
            st = rng.randint(0, 25000)
            ln = rng.randint(800, 4000)
            r = genome[st:st + ln].copy()
            r[rng.rand(len(r)) < 0.02] = 4  # some Ns
            reads.append(r)
        lens = np.array([len(r) for r in reads], np.int64)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        return np.concatenate(reads), offs

    qf, qo = mkblock(30)
    tf, to = mkblock(35)
    qp, tp = native.seed_hits(qf, qo, tf, to, 12, 3, 16)
    ai, qpl, bi, tpl = native.seed_hits_idx(qf, qo, tf, to, 12, 3, 16)
    assert len(qp) == len(ai) > 1000
    a_idx = np.searchsorted(qo, qp, side="right") - 1
    b_idx = np.searchsorted(to, tp, side="right") - 1
    old = sorted(zip(a_idx.tolist(), (qp - qo[a_idx]).tolist(),
                     b_idx.tolist(), (tp - to[b_idx]).tolist()))
    new = sorted(zip(ai.tolist(), qpl.tolist(), bi.tolist(), tpl.tolist()))
    assert old == new


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_seed_chain_matches_python_path(monkeypatch):
    """overlap_blocks via the fused C++ seed_chain must produce the same
    overlap records (and order) as the pure-python join+chain path."""
    from falcon_tpu.io import readstore
    from falcon_tpu.utils import sim
    genome = sim.random_genome(30000, seed=5)
    reads = sim.simulate_reads(genome, coverage=10, mean_len=5000,
                               min_len=1500, error=0.05, seed=6)
    store = readstore.ReadStore.from_seqs([s for _, s in reads])
    rids = np.arange(len(store), dtype=np.int64)
    params = engine.OverlapParams(k=12, min_hits=3, bin_size=256,
                                  stride=2, min_overlap=800, min_idt=0.5)
    recs_native = engine.overlap_blocks(store, rids, rids, params)
    monkeypatch.setattr("falcon_tpu.ops.native._lib", None)
    monkeypatch.setattr("falcon_tpu.ops.native._tried", True)
    recs_py = engine.overlap_blocks(store, rids, rids, params)
    assert len(recs_native) == len(recs_py) > 10
    from falcon_tpu.overlap import table as otable
    assert otable.to_lines(recs_native) == otable.to_lines(recs_py)


@pytest.mark.slow
def test_run_specs_matches_run():
    """DeviceExtender.run_specs (resident-flat gather tasks) must equal
    run() (materialized task slices) on the same extension tasks.
    Slow: the CPU multi-device backend pays ~1 min of sharded-kernel
    compile per path; full-size parity also runs on TPU (the device
    e2e bench asserts identical contigs)."""
    from falcon_tpu.ops.align_device import DeviceExtender
    rng = np.random.RandomState(2)
    flat = rng.randint(0, 4, 6000).astype(np.uint8)
    N = 24
    q_off = rng.randint(300, 5000, N).astype(np.int64)
    q_len = rng.randint(0, 250, N).astype(np.int64)
    q_dir = rng.choice([1, -1], N).astype(np.int64)
    t_off = np.minimum(q_off + rng.randint(-50, 50, N), 5999)
    t_len = np.clip(q_len + rng.randint(-60, 60, N), 0, 250)
    t_dir = q_dir.copy()
    # keep slices in bounds
    for off, ln, dr in ((q_off, q_len, q_dir), (t_off, t_len, t_dir)):
        fwd = dr == 1
        ln[fwd] = np.minimum(ln[fwd], len(flat) - off[fwd])
        ln[~fwd] = np.minimum(ln[~fwd], off[~fwd] + 1)
    ext = DeviceExtender(W=64, max_batch=8, use_pallas=False)
    tasks = []
    for k in range(N):
        if q_dir[k] == 1:
            qc = flat[q_off[k]:q_off[k] + q_len[k]]
        else:
            qc = flat[q_off[k] - q_len[k] + 1:q_off[k] + 1][::-1]
        if t_dir[k] == 1:
            tc = flat[t_off[k]:t_off[k] + t_len[k]]
        else:
            tc = flat[t_off[k] - t_len[k] + 1:t_off[k] + 1][::-1]
        tasks.append((qc, tc))
    r_mat = ext.run(tasks)
    r_specs = ext.run_specs(flat, q_off, q_len, q_dir,
                            t_off, t_len, t_dir)
    assert r_mat == r_specs


def test_cell_accounting_occupancy():
    """DeviceExtender._account_cells mirrors the pallas kernels'
    per-256-row-tile max_s super-block charging: homogeneous tiles ->
    high occupancy; one long task in a tile of short ones charges the
    whole tile at its sweep."""
    from falcon_tpu.ops.align_device import DeviceExtender
    from falcon_tpu.ops.align_pallas import SB
    ext = DeviceExtender(W=64, use_pallas=False)
    span = 2 * SB
    # homogeneous: 256 tasks of identical sweep -> occupancy ~ s/ceil(s)
    s = np.full(256, 1000, np.int64)
    issued, useful = ext._account_cells(s, 256, 1024)
    assert useful == 256 * 1000
    assert issued == 256 * (-(-1000 // span)) * span
    # heterogeneous: 255 tiny + 1 huge task in one tile
    ext2 = DeviceExtender(W=64, use_pallas=False)
    s2 = np.r_[np.full(255, 100, np.int64), [2000]]
    issued2, useful2 = ext2._account_cells(np.sort(s2), 256, 1024)
    assert issued2 == 256 * (-(-2000 // span)) * span
    assert ext2.occupancy() < 0.1
    # two tiles after sorting: the tiny tasks' tile is charged small
    ext3 = DeviceExtender(W=64, use_pallas=False)
    s3 = np.r_[np.full(256, 100, np.int64), np.full(256, 2000, np.int64)]
    ext3._account_cells(np.sort(s3), 512, 1024)
    assert ext3.occupancy() > 0.5
