"""Device-side consensus MSA+DP (ops.cns_dp): correctness vs the exact
host kernel (ops.consensus_dp / falcon.c semantics).

The DP path is quality-validated, not bit-exact (see ops.cns_dp's
documented approximations); these tests pin:
  * exact behavior on unambiguous groups (identical supports)
  * >=99.5% consensus identity vs the host-MSA device path on noisy
    groups, and >=99% vs the ground truth
  * gating parity (too-small groups emit nothing from either path)
"""
import io

import numpy as np
import pytest

from falcon_tpu.cns import runner
from falcon_tpu.cns.device import (DeviceCns, gate_group_ranged,
                                   run_consensus_device)
from falcon_tpu.ops import native, align as pyalign

A = np.frombuffer(b"ACGT", dtype=np.uint8)


def _al(q, t, band=1000):
    if native.available():
        return native.align(q, t, band, False)
    return pyalign.align(q, t, band, False)


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


def make_group(truth, n_sup, err, rng, seed_id="000000000"):
    seed_seq = A[truth].tobytes().decode()
    items = [(seed_id, seed_seq, None)]
    for k in range(n_sup):
        sup = A[noisy(truth, err, rng)].tobytes().decode() if err \
            else seed_seq
        items.append(("%09d" % (k + 1), sup,
                      (0, len(sup), 0, len(seed_seq))))
    return items


CFG = dict(min_cov=2, min_idt=0.70, min_n_read=4, min_cov_aln=4)


def test_dp_identical_supports_exact():
    """Unambiguous group: the DP path must reproduce the reference
    backtrack exactly -- consensus = seed[1:] (the walk emits pred bases;
    the reference's first base is dropped, and the device replaces the
    reference's quirk terminal char with the true final base)."""
    rng = np.random.RandomState(3)
    truth = rng.randint(0, 4, 2000).astype(np.uint8)
    items = make_group(truth, 6, 0.0, rng)
    cfg = runner.ConsensusConfig(**CFG)
    g = gate_group_ranged("000000000", items, cfg)
    dev = DeviceCns(use_dp=True, use_pallas=False)
    (sid, cns), = dev.consensus_chunk([("000000000", g[0], g[1])], cfg)
    seed_seq = A[truth].tobytes().decode()
    assert cns == seed_seq[1:]


@pytest.mark.parametrize("err,seed", [(0.08, 11), (0.15, 12)])
def test_dp_quality_vs_host_msa(err, seed):
    rng = np.random.RandomState(seed)
    truth = rng.randint(0, 4, 4000).astype(np.uint8)
    items = make_group(truth, 14, err, rng)
    cfg = runner.ConsensusConfig(**CFG)
    g = gate_group_ranged("000000000", items, cfg)
    chunk = [("000000000", g[0], g[1])]

    (_, cns_dp), = DeviceCns(
        use_dp=True, use_pallas=False).consensus_chunk(chunk, cfg)
    (_, cns_host), = DeviceCns(
        use_dp=False, use_pallas=False).consensus_chunk(chunk, cfg)
    assert len(cns_dp) > 3000 and len(cns_host) > 3000
    a = _al(cns_dp, cns_host)
    idt = 1 - a.dist / max(1, a.aln_str_size)
    assert a.aln_str_size > 0.9 * min(len(cns_dp), len(cns_host))
    assert idt > 0.995, "DP path diverges from host MSA: %.4f" % idt
    t_str = A[truth].tobytes().decode()
    a2 = _al(cns_dp, t_str)
    assert 1 - a2.dist / max(1, a2.aln_str_size) > 0.99


def test_dp_multi_group_batching():
    """Groups of different seed lengths land in different T buckets and
    DP batches; results must come back in chunk order."""
    rng = np.random.RandomState(7)
    cfg = runner.ConsensusConfig(**CFG)
    chunk = []
    truths = []
    for i, n in enumerate((1500, 2600, 900, 5100)):
        truth = rng.randint(0, 4, n).astype(np.uint8)
        truths.append(truth)
        items = make_group(truth, 8, 0.08, rng, seed_id="%09d" % i)
        g = gate_group_ranged("%09d" % i, items, cfg)
        assert g is not None
        chunk.append(("%09d" % i, g[0], g[1]))
    dev = DeviceCns(use_dp=True, use_pallas=False)
    res = dev.consensus_chunk(chunk, cfg)
    assert [sid for sid, _ in res] == ["%09d" % i for i in range(4)]
    for (sid, cns), truth in zip(res, truths):
        t_str = A[truth].tobytes().decode()
        a = _al(cns, t_str)
        assert 1 - a.dist / max(1, a.aln_str_size) > 0.985, sid


def test_dp_empty_group_emits_nothing():
    """A group whose every support fails the range gates produces ''
    (the scan finds no column with score > -1 beyond the seed's own
    self-tags... the seed self-alignment alone still yields the seed)."""
    rng = np.random.RandomState(9)
    truth = rng.randint(0, 4, 1200).astype(np.uint8)
    seed_seq = A[truth].tobytes().decode()
    # supports unrelated to the seed: alignment gate (>500 cols,
    # < max_diff) kills them
    other = rng.randint(0, 4, 1200).astype(np.uint8)
    items = [("000000000", seed_seq, None)]
    for k in range(6):
        items.append(("%09d" % (k + 1), A[other].tobytes().decode(),
                      (0, 1200, 0, 1200)))
    cfg = runner.ConsensusConfig(**CFG)
    g = gate_group_ranged("000000000", items, cfg)
    dev = DeviceCns(use_dp=True, use_pallas=False)
    (_, cns), = dev.consensus_chunk([("000000000", g[0], g[1])], cfg)
    # self-tags alone: every column has coverage 1 <= min_cov -> all
    # lowercase; format_output would then drop it via [ACGT]+ splitting
    assert cns == seed_seq[1:].lower()
    out = io.StringIO()
    assert runner.format_output(cns, "000000000",
                                runner.ConsensusConfig(**CFG), out) == 0


def test_run_consensus_device_dp_stream():
    """The streaming front-end with the DP path end-to-end."""
    rng = np.random.RandomState(21)
    truth = rng.randint(0, 4, 3000).astype(np.uint8)
    items = make_group(truth, 12, 0.1, rng)
    cfg = runner.ConsensusConfig(output_multi=False, **CFG)
    out = io.StringIO()
    dev = DeviceCns(use_dp=True, use_pallas=False)
    n = run_consensus_device(iter([("000000000", items)]), cfg, out,
                             dev=dev)
    assert n == 1
    seq = "".join(out.getvalue().splitlines()[1:])
    t_str = A[truth].tobytes().decode()
    a = _al(seq, t_str)
    assert 1 - a.dist / max(1, a.aln_str_size) > 0.99


def test_compact_emit_matches_plane_assembly():
    """Device-side compaction (compact_emit + assemble_compacted) must
    reproduce assemble_consensus exactly, incl. the overflow dump slot."""
    import numpy as np
    import jax.numpy as jnp
    from falcon_tpu.ops import cns_dp
    rng = np.random.RandomState(9)
    T, G, D = 32, 4, 5
    emit = np.full((T, G, D), cns_dp.NOEMIT, np.uint8)
    for g in range(G):
        n = rng.randint(1, T * 2)
        ts = rng.choice(T * D, size=min(n, T * D), replace=False)
        for x in ts:
            emit[x // D, g, x % D] = rng.randint(0, 9)
    cap = T + T // 4
    comp, counts = cns_dp.compact_emit(jnp.asarray(emit), cap=cap)
    comp, counts = np.asarray(comp), np.asarray(counts)
    for g in range(G):
        want = cns_dp.assemble_consensus(emit, g)
        assert counts[g] == np.sum(emit[:, g, :] != cns_dp.NOEMIT)
        if counts[g] <= cap:
            got = cns_dp.assemble_compacted(comp[g], int(counts[g]))
            assert got == want, g


@pytest.mark.parametrize("err,seed,s2mode", [
    (0.0, 21, "zero"), (0.12, 22, "zero"), (0.25, 23, "mix"),
    (0.12, 24, "lead")])
def test_accumulate_tags_mm_parity(err, seed, s2mode):
    """accumulate_tags_mm (gather-inversion + one-hot matmul) must be
    bit-identical to the scatter-add accumulate_tags on real move
    streams, including leading-insertion runs (support starts before the
    seed range), delta-cap truncation (high error), and out-of-T tags."""
    import jax.numpy as jnp
    from falcon_tpu.ops import align_tb, cns_dp
    rng = np.random.RandomState(seed)
    T, D, G, B, L = 1024, 14, 8, 6, 2048
    qs = np.full((B, L), 4, np.int8)
    ts = np.full((B, L), 5, np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    gidx = np.zeros(B, np.int32)
    s2 = np.zeros(B, np.int32)
    for b in range(B):
        t_arr = rng.randint(0, 4, rng.randint(700, 1100)).astype(np.uint8)
        q_arr = noisy(t_arr, err, rng) if err else t_arr.copy()
        if s2mode == "lead":
            # support has extra leading bases: alignment opens with an
            # insertion run (tags at tpos = s2 - 1)
            q_arr = np.concatenate(
                [rng.randint(0, 4, 7).astype(np.uint8), q_arr])
        qs[b, :len(q_arr)] = q_arr
        ts[b, :len(t_arr)] = t_arr
        qlen[b] = len(q_arr)
        tlen[b] = len(t_arr)
        gidx[b] = b % G if b != 3 else -1     # one dead task
        s2[b] = 0 if s2mode == "zero" else rng.randint(0, 5)
    bi, bj, bd, mvp = align_tb.align_tb_batch(
        jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
        jnp.asarray(tlen), W=64)
    max_diff = np.float32(0.5)
    msa_a = cns_dp.accumulate_tags(
        cns_dp.alloc_msa(G, T, D), mvp, jnp.asarray(qs), bd,
        jnp.asarray(gidx), jnp.asarray(s2), max_diff, T, D)
    msa_b = cns_dp.accumulate_tags_mm(
        cns_dp.alloc_msa(G, T, D), mvp, jnp.asarray(qs), bd,
        jnp.asarray(gidx), jnp.asarray(s2), max_diff, T, D, G)
    # dump slots (last element) legitimately differ: the scatter path
    # routes masked-out updates there, the matmul path has none
    a, b = np.asarray(msa_a)[:-1], np.asarray(msa_b)[:-1]
    assert a.sum() > 0, "degenerate case: no tags at all"
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("err,seed", [(0.0, 31), (0.12, 32), (0.3, 33)])
def test_planes_parity(err, seed):
    """accumulate_tags_planes (gather-free decode driven by the
    traceback kernel's base stream) must be bit-identical to the
    q-gather accumulate_tags on real move streams -- including deletion
    columns, leading insertions, and keep-gate rejected tasks."""
    import jax.numpy as jnp
    from falcon_tpu.ops import cns_dp
    from falcon_tpu.ops.align_tb_pallas import align_tb_batch_pallas
    rng = np.random.RandomState(seed)
    T, D, G, B, L = 1024, 14, 4, 8, 1024
    qs = np.full((B, L), 4, np.int8)
    ts = np.full((B, L), 5, np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    gidx = np.zeros(B, np.int32)
    s2 = np.zeros(B, np.int32)
    for b in range(B):
        t_arr = rng.randint(0, 4, rng.randint(600, 1000)).astype(np.uint8)
        q_arr = noisy(t_arr, err, rng) if err else t_arr.copy()
        if b % 3 == 1:
            q_arr = np.concatenate(
                [rng.randint(0, 4, 5).astype(np.uint8), q_arr])
        qs[b, :min(len(q_arr), L)] = q_arr[:L]
        ts[b, :len(t_arr)] = t_arr
        qlen[b] = min(len(q_arr), L)
        tlen[b] = len(t_arr)
        gidx[b] = b % G if b != 2 else -1
        s2[b] = rng.randint(0, 4)
    bi, bj, bd, mvp, basep = align_tb_batch_pallas(
        jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
        jnp.asarray(tlen), W=64, block_b=8, interpret=True,
        emit_base=True)
    max_diff = np.float32(0.5)
    msa_a = cns_dp.accumulate_tags(
        cns_dp.alloc_msa(G, T, D), mvp, jnp.asarray(qs), bd,
        jnp.asarray(gidx), jnp.asarray(s2), max_diff, T, D)
    msa_b = cns_dp.accumulate_tags_planes(
        cns_dp.alloc_msa(G, T, D), mvp, basep, bd,
        jnp.asarray(gidx), jnp.asarray(s2), max_diff, T, D)
    a, b_ = np.asarray(msa_a)[:-1], np.asarray(msa_b)[:-1]
    assert a.sum() > 0, "degenerate case: no tags at all"
    np.testing.assert_array_equal(a, b_)


def test_emit_base_moves_unchanged():
    """emit_base must not perturb the moves contract (the q char rides
    spare bits of the internal trace planes only)."""
    import jax.numpy as jnp
    from falcon_tpu.ops.align_tb_pallas import align_tb_batch_pallas
    rng = np.random.RandomState(44)
    B, L = 8, 512
    qs = np.full((B, L), 4, np.int8)
    ts = np.full((B, L), 5, np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b in range(B):
        t_arr = rng.randint(0, 4, rng.randint(300, 500)).astype(np.uint8)
        q_arr = noisy(t_arr, 0.1, rng)
        qs[b, :min(len(q_arr), L)] = q_arr[:L]
        ts[b, :len(t_arr)] = t_arr
        qlen[b] = min(len(q_arr), L)
        tlen[b] = len(t_arr)
    a = align_tb_batch_pallas(jnp.asarray(qs), jnp.asarray(qlen),
                              jnp.asarray(ts), jnp.asarray(tlen),
                              W=64, block_b=8, interpret=True)
    b_ = align_tb_batch_pallas(jnp.asarray(qs), jnp.asarray(qlen),
                               jnp.asarray(ts), jnp.asarray(tlen),
                               W=64, block_b=8, interpret=True,
                               emit_base=True)
    for x, y in zip(a, b_[:4]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("err,seed", [(0.0, 41), (0.12, 42), (0.3, 43)])
def test_consensus_scan_prefix_parity(err, seed):
    """consensus_scan(prefix=True) (log-step max-plus delta chain) must
    be bit-identical to the sequential chain -- scores are multiples of
    0.5 far below float32's exact-integer range, so the reassociation
    is exact; argmax tie order is pinned by the shared post-pass cand
    construction."""
    import jax.numpy as jnp
    from falcon_tpu.ops import align_tb, cns_dp
    rng = np.random.RandomState(seed)
    T, D, G, B, L = 1024, 14, 8, 12, 2048
    qs = np.full((B, L), 4, np.int8)
    ts = np.full((B, L), 5, np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    gidx = np.zeros(B, np.int32)
    s2 = np.zeros(B, np.int32)
    for b in range(B):
        t_arr = rng.randint(0, 4, rng.randint(700, 1100)).astype(np.uint8)
        q_arr = noisy(t_arr, err, rng) if err else t_arr.copy()
        qs[b, :len(q_arr)] = q_arr
        ts[b, :len(t_arr)] = t_arr
        qlen[b] = len(q_arr)
        tlen[b] = len(t_arr)
        gidx[b] = b % G
        s2[b] = rng.randint(0, 5)
    bi, bj, bd, mvp = align_tb.align_tb_batch(
        jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
        jnp.asarray(tlen), W=64)
    msa = cns_dp.accumulate_tags(
        cns_dp.alloc_msa(G, T, D), mvp, jnp.asarray(qs), bd,
        jnp.asarray(gidx), jnp.asarray(s2), np.float32(0.5), T, D)
    ref = cns_dp.consensus_scan(msa, G, T, D, prefix=False)
    new = cns_dp.consensus_scan(msa, G, T, D, prefix=True)
    for a, b, name in zip(ref, new,
                          ("bp", "cov", "gb_s", "gb_t", "gb_d", "gb_b")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)


def test_consensus_scan_prefix_parity_random_msa():
    """Adversarial random MSA counts (incl. empty columns, start-only
    links, and isolated insertion levels with dead predecessors) --
    exercises the constant-map (-1.0) encoding paths that real move
    streams rarely hit."""
    from falcon_tpu.ops import cns_dp
    rng = np.random.RandomState(7)
    G, T, D = 5, 64, 14
    msa = np.zeros(cns_dp.msa_size(G, T, D), np.uint16)
    n = msa.shape[0] - 1
    hot = rng.choice(n, size=n // 7, replace=False)
    msa[hot] = rng.randint(1, 200, size=hot.shape[0]).astype(np.uint16)
    import jax.numpy as jnp
    msa = jnp.asarray(msa)
    ref = cns_dp.consensus_scan(msa, G, T, D, prefix=False)
    new = cns_dp.consensus_scan(msa, G, T, D, prefix=True)
    for a, b, name in zip(ref, new,
                          ("bp", "cov", "gb_s", "gb_t", "gb_d", "gb_b")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)


@pytest.mark.parametrize("err,seed", [(0.0, 51), (0.12, 52), (0.3, 53)])
def test_backtrack_walk_parity(err, seed):
    """backtrack_walk must emit the identical code stream (hence
    identical consensus strings) as backtrack + compact_emit, for every
    group including empty ones."""
    import jax.numpy as jnp
    from falcon_tpu.ops import align_tb, cns_dp
    rng = np.random.RandomState(seed)
    T, D, G, B, L = 1024, 14, 8, 12, 2048
    qs = np.full((B, L), 4, np.int8)
    ts = np.full((B, L), 5, np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    gidx = np.zeros(B, np.int32)
    s2 = np.zeros(B, np.int32)
    for b in range(B):
        t_arr = rng.randint(0, 4, rng.randint(700, 1100)).astype(np.uint8)
        q_arr = noisy(t_arr, err, rng) if err else t_arr.copy()
        qs[b, :len(q_arr)] = q_arr
        ts[b, :len(t_arr)] = t_arr
        qlen[b] = len(q_arr)
        tlen[b] = len(t_arr)
        gidx[b] = b % (G - 1)       # leave the last group empty
        s2[b] = rng.randint(0, 5)
    bi, bj, bd, mvp = align_tb.align_tb_batch(
        jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
        jnp.asarray(tlen), W=64)
    msa = cns_dp.accumulate_tags(
        cns_dp.alloc_msa(G, T, D), mvp, jnp.asarray(qs), bd,
        jnp.asarray(gidx), jnp.asarray(s2), np.float32(0.5), T, D)
    bp, cov, gb_s, gb_t, gb_d, gb_b = cns_dp.consensus_scan(msa, G, T, D)
    min_cov = 2
    emit = cns_dp.backtrack(bp, cov, gb_s, gb_t, gb_d, gb_b,
                            np.int32(min_cov), G, T, D)
    comp, counts = cns_dp.compact_emit(emit, cap=T + T // 4)
    packed, done = cns_dp.backtrack_walk(
        bp, cov, gb_s, gb_t, gb_d, gb_b, min_cov, G, T, D, cap=2 * T)
    comp, counts, packed, done = map(np.asarray,
                                     (comp, counts, packed, done))
    assert done.all()
    n_nonempty = 0
    for g in range(G):
        ref = cns_dp.assemble_compacted(comp[g], int(counts[g]))
        got = cns_dp.assemble_walk(packed[g])
        assert got == ref, "group %d: %d vs %d chars" % (
            g, len(got), len(ref))
        n_nonempty += bool(ref)
    assert n_nonempty >= G - 1      # only the deliberately-empty group


def test_run_consensus_device_dp_stream_prefix_walk(monkeypatch):
    """The DP stream path with the prefix-scan + walk-backtrack
    variants enabled must match the default DP path byte-for-byte."""
    rng = np.random.RandomState(21)
    truth = rng.randint(0, 4, 3000).astype(np.uint8)
    items = make_group(truth, 12, 0.1, rng)
    cfg = runner.ConsensusConfig(output_multi=False, **CFG)
    outs = []
    for flags in ("0", "1"):
        monkeypatch.setenv("FTPU_CNS_PREFIX", flags)
        monkeypatch.setenv("FTPU_CNS_WALK", flags)
        out = io.StringIO()
        dev = DeviceCns(use_dp=True, use_pallas=False)
        assert dev.use_prefix == dev.use_walk == (flags == "1")
        n = run_consensus_device(iter([("000000000", items)]), cfg, out,
                                 dev=dev)
        assert n == 1
        outs.append(out.getvalue())
    assert outs[0] == outs[1]


def test_walk_overflow_plane_fallback(monkeypatch, caplog):
    """A walk that overruns its step cap (forced tiny via
    FTPU_CNS_WALK_CAP_FRAC) must fall back to the plane backtrack at
    collect and still produce the exact default-path output."""
    import logging
    caplog.set_level(logging.INFO, logger="falcon_tpu.cns.device")
    rng = np.random.RandomState(23)
    truth = rng.randint(0, 4, 3000).astype(np.uint8)
    items = make_group(truth, 10, 0.1, rng)
    cfg = runner.ConsensusConfig(output_multi=False, **CFG)
    outs = []
    for env in ({}, {"FTPU_CNS_WALK": "1",
                     "FTPU_CNS_WALK_CAP_FRAC": "0.05"}):
        for k in ("FTPU_CNS_WALK", "FTPU_CNS_WALK_CAP_FRAC"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        out = io.StringIO()
        dev = DeviceCns(use_dp=True, use_pallas=False)
        n = run_consensus_device(iter([("000000000", items)]), cfg, out,
                                 dev=dev)
        assert n == 1
        outs.append(out.getvalue())
    assert outs[0] == outs[1]
    assert "overflow plane fetches" in caplog.text  # fallback really ran
