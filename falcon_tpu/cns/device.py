"""Device (TPU) consensus engine: batched alignment+traceback on chip,
exact MSA/DP on host.

The fast-path replacement for the per-group host kernel in cns.runner
(reference call stack: consensus.py:102-158 -> falcon.c:562 per support:
kmer range + DW_banded align + tags + MSA).  Division of labor here:

  device   banded alignment WITH traceback of every (support, seed-range)
           pair of a chunk of seed groups, batched and length-bucketed
           (ops.align_tb); this is the FLOP-dominant part
  host     gapped-string reconstruction (vectorized cumsums) and the exact
           align-tag MSA + best-path DP (native C++ ftpu_cns_from_alns;
           ops.consensus_dp fallback), which is O(total aligned bases) with
           tiny constants

Alignment ranges come from the overlap records the driver already holds
(a_start..a_end on the seed, b_start..b_end on the support) instead of
re-seeding each support against its seed the way LA4Falcon-fed fc_consensus
must (reference consensus.py gets bare sequences over a pipe; we keep the
coordinates).  Range gates mirror generate_consensus (falcon.c:601-628):
>=100bp on both sides, <=5% indel imbalance, alignment >500bp and
dist/size < 1-min_idt.

This path is NOT bit-exact vs the reference (the device aligner is an
anti-diagonal banded edit DP, not the greedy O(ND) wavefront; see
ops.align_device's rationale) -- it is quality-validated by downstream
contig parity (tests/test_cns_device.py, bench_e2e).  The bit-exact host
path (cns.runner with ops.native) remains the default for stream inputs.
"""
import logging

import numpy as np

from ..ops import consensus_dp
from ..ops import native

LOG = logging.getLogger(__name__)

MAX_SEQ_LEN = 100000  # reference clip (consensus.py:178)

_CODE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate(b"ACGT"):
    _CODE[_c] = _i
    _CODE[ord(chr(_c).lower())] = _i


def seq_to_codes(seq):
    if isinstance(seq, np.ndarray):
        return seq
    return _CODE[np.frombuffer(seq.encode() if isinstance(seq, str)
                               else seq, dtype=np.uint8)]


_A = np.frombuffer(b"ACGT", dtype=np.uint8)


def seq_to_ascii(seq):
    """bytes of the sequence; accepts str or uint8 code arrays (group
    items carry raw ReadStore codes to avoid a decode+re-encode round
    trip per support)."""
    if isinstance(seq, np.ndarray):
        return _A[np.minimum(seq, 3)].tobytes()
    return seq.encode() if isinstance(seq, str) else bytes(seq)


def gate_group_ranged(seed_id, items, cfg):
    """The get_seq_data gates (reference consensus.py:161-209) over
    (read_id, seq, rng) items, keeping each support's alignment range.

    items: seed first; rng = (s1, e1, s2, e2) in (support, seed)
    coordinates on the seed's strand, or None (seed / unknown).
    Returns (seed_seq, [(seq, rng, is_seed_self), ...]) or None."""
    sups = []
    seed_seq = None
    seed_len = 0
    read_ids = set()
    read_cov = 0
    for read_id, seq, rng in items:
        if len(seq) > MAX_SEQ_LEN:
            seq = seq[:MAX_SEQ_LEN - 1]
            rng = None if rng is None else (
                min(rng[0], len(seq)), min(rng[1], len(seq)),
                rng[2], rng[3])
        if len(seq) < cfg.min_len_aln:
            continue
        if seed_seq is None:
            seed_seq = seq
            seed_len = len(seq)
        if read_id not in read_ids:
            sups.append((seq, rng, read_id == items[0][0]))
            read_ids.add(read_id)
            read_cov += len(seq)
    if seed_seq is None:
        return None
    if len(sups) + 1 < cfg.min_n_read or \
            read_cov // seed_len < cfg.min_cov_aln:
        return None
    # get_longest_reads (consensus.py:26-45): sort supports by length desc,
    # cap by count and by coverage of the seed
    sups.sort(key=lambda x: -len(x[0]))
    longest_n = cfg.max_n_read - 1
    if cfg.max_cov_aln > 0:
        n = 0
        cov = 0
        for seq, _, _ in sups:
            if cov // seed_len > cfg.max_cov_aln:
                break
            n += 1
            cov += len(seq)
        longest_n = min(n, cfg.max_n_read - 1)
    return seed_seq, sups[:longest_n]


def _clamp_range(rng, sup_len, seed_len):
    s1, e1, s2, e2 = rng
    s1 = max(0, min(s1, sup_len))
    e1 = max(s1, min(e1, sup_len))
    s2 = max(0, min(s2, seed_len))
    e2 = max(s2, min(e2, seed_len))
    return s1, e1, s2, e2


def _range_ok(rng):
    """generate_consensus range gates (falcon.c:605-612)."""
    s1, e1, s2, e2 = rng
    l1 = e1 - s1
    l2 = e2 - s2
    return (l1 >= 100 and l2 >= 100 and
            abs(l1 - l2) <= int(0.5 * 0.10 * (l1 + l2)))


class DeviceCns:
    """Chunked device consensus over gated groups."""

    def __init__(self, W=None, max_cells=None, chunk_tasks=None,
                 use_pallas=None, moves_budget=None, use_dp=None,
                 dp_delta_cap=None, dp_budget=None):
        import os
        from ..utils.jaxinit import setup_jax
        setup_jax()
        if max_cells is None or moves_budget is None:
            # TPU: big batches (B=256-1024 rows) amortize per-call
            # overheads; the trace store (2*L*B*W int8) is a jit-internal
            # intermediate so only ~1 is live.  CPU (tests): keep the
            # round-3 small shapes -- XLA-CPU compile time scales with
            # batch width and the suite pays it per shape.
            import jax
            on_cpu = jax.default_backend() == "cpu"
            if max_cells is None:
                max_cells = (1 << 19) if on_cpu else (1 << 22)
            if moves_budget is None:
                moves_budget = (1 << 30) if on_cpu else (1 << 31)
        if W is None:
            # the consensus aligner's band: supports start from overlap-
            # record ranges, so drift is the indel-imbalance random walk
            # (sigma ~ sqrt(err/1.5 * L) ~ 20 for 7kb at 16% combined
            # error).  The traceback kernel's move planes cost O(W) HBM
            # traffic -- the consensus phase's dominant share -- so the
            # band is configurable; 256 is the validated default
            # (reference band_tolerance=150 for consensus aligns,
            # falcon.c:626-628).
            W = int(os.environ.get("FTPU_CNS_W", "256"))
        self.W = W
        self.max_cells = max_cells      # B*L budget per device batch
        if use_pallas is None:
            use_pallas = os.environ.get("FTPU_USE_PALLAS", "1") != "0"
        self.use_pallas = use_pallas
        # device MSA+DP path (ops.cns_dp): tags, scoring and backtrack all
        # on chip; the host only decodes the final emission planes.
        # Round-4 measured it at 5.86M support-bases/s vs the host-MSA
        # hybrid's 7.78M on the tunneled v5e (0.75x; BASELINE.md round-4
        # table -- the gather-free tag decode closed most of the round-3
        # 4x gap).  Default OFF on single-host runs because the hybrid is
        # still faster there; it is the multi-chip scaling path (the
        # host-MSA stage cannot shard) and the default under multi-
        # process distribution, where per-host host-MSA would serialize
        # on the gather host.  Opt in/out with FTPU_CNS_DP.  (The
        # criterion is process_count, not device_count: the test env
        # fakes 8 CPU devices in one process and must keep the single-
        # host default.)
        if use_dp is None:
            env = os.environ.get("FTPU_CNS_DP", "")
            if env:
                use_dp = env == "1"
            else:
                try:
                    import jax
                    use_dp = jax.process_count() > 1
                except Exception:
                    use_dp = False
        self.use_dp = use_dp
        # MXU one-hot-matmul accumulate variant (bit-identical, ~10x
        # slower than the scatter at production shapes); resolved once
        # here like the sibling flags so mid-run env changes cannot
        # alter behavior between batches.
        self.use_mm = os.environ.get("FTPU_CNS_MM") == "1"
        # log-step max-plus prefix form of the scan's within-t delta
        # chain (bit-identical; tests/test_cns_dp.py): replaces D-1
        # dependent [G,5,6] mini-ops per scan step with ceil(log2(D-1))
        # map compositions -- the round-4 "tiny-op scan" residual.
        # Opt-in until measured on the real chip (FTPU_CNS_PREFIX=1).
        self.use_prefix = os.environ.get("FTPU_CNS_PREFIX") == "1"
        # path-walk backtrack (ops.cns_dp.backtrack_walk): one scan step
        # per path move instead of the [T, G, D] plane sweep + the
        # compact_emit binary search; identical emission stream
        # (tests/test_cns_dp.py).  Opt-in until measured
        # (FTPU_CNS_WALK=1).
        self.use_walk = os.environ.get("FTPU_CNS_WALK") == "1"
        # walk step budget as a fraction of 2T (1.0 = the n_emit bound;
        # smaller trades plane-fallback risk for scan steps -- test
        # hook, production default stays 1.0)
        self.walk_cap_frac = float(
            os.environ.get("FTPU_CNS_WALK_CAP_FRAC", "1.0"))
        from ..ops import cns_dp as _cdp
        self.dp_delta_cap = dp_delta_cap or int(
            os.environ.get("FTPU_CNS_DP_DELTA", str(_cdp.D_DEFAULT)))
        # HBM bytes for one DP batch's MSA count tensors.  Larger G per
        # batch is the lane-fill lever of the scan/backtrack stages
        # (their per-t step ops are [G, ...]-tiny; profiled round 4), so
        # the budget errs high: ~2 batches stay live (dispatch_chunk_dp
        # paces on the batch-before-last), bounding peak at ~2x this.
        self.dp_budget = dp_budget or int(float(
            os.environ.get("FTPU_CNS_DP_BUDGET", str(3e9))))
        # alignment tasks per pipeline chunk: the DP path benefits from
        # larger chunks (more groups per (T, G) batch -> fewer, fuller
        # scans); the host-MSA path keeps chunks small enough that the
        # finisher thread's host stage overlaps the device
        if chunk_tasks is None:
            env_ct = os.environ.get("FTPU_CNS_CHUNK_TASKS", "")
            if env_ct:
                chunk_tasks = int(env_ct)
            else:
                chunk_tasks = 32768 if self.use_dp else 8192
        self.chunk_tasks = chunk_tasks  # alignment tasks per chunk
        self.moves_budget = moves_budget  # HBM bytes for one batch's trace

    # -- device batching ----------------------------------------------------
    def _batch_for(self, L):
        """Batch size: bounded by the per-call [n_sb, 2SB, B, W] trace
        store (2*L*B*W int8 bytes; it is a jit-internal intermediate, so
        only ~1 is ever live regardless of how many calls are queued).
        Round-4 bump: B=64 at L=16k starved the align/accumulate stages
        with per-call overheads; 256 rows = one full pallas block."""
        B = max(1, min(self.max_cells,
                       self.moves_budget // (2 * self.W)) // max(L, 1))
        if self.use_pallas is not False:
            return max(64, min(1024, (B // 64) * 64))
        return max(8, 1 << int(np.floor(np.log2(min(B, 1024)))))

    def _align_tb(self, q, qlen, t, tlen, emit_base=False):
        """emit_base: also return the traceback base stream (5-tuple) --
        the DP path's gather-free tag decode input; only the pallas
        kernel produces it (callers fall back on 4-tuple outputs)."""
        import jax.numpy as jnp
        if self.use_pallas:
            try:
                from ..ops.align_tb_pallas import align_tb_batch_pallas
                B = q.shape[0]
                return align_tb_batch_pallas(
                    jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
                    jnp.asarray(tlen), W=self.W, block_b=min(256, B),
                    emit_base=emit_base)
            except Exception:
                LOG.warning("pallas traceback kernel failed; "
                            "falling back to XLA", exc_info=True)
                self.use_pallas = False
        from ..ops.align_tb import align_tb_batch
        return align_tb_batch(jnp.asarray(q), jnp.asarray(qlen),
                              jnp.asarray(t), jnp.asarray(tlen), W=self.W)

    def dispatch_tasks(self, tasks):
        """Queue all task batches on the device without blocking.

        tasks: [(q_codes, t_codes)].  Returns the in-flight handle list
        for collect_tasks; JAX async dispatch lets the device chew on
        these while the host does other work (the chunk pipeline)."""
        import time as _time
        # coarse ladder bucketing: each (B, L) shape pays a mosaic
        # remote-compile (minutes on this runtime); padded cells are
        # nearly free (see ops.align_device.LADDER)
        from ..ops.align_device import DeviceExtender as _DE
        buckets = {}
        for idx, (qc, tc) in enumerate(tasks):
            m = max(len(qc), len(tc), 1)
            L = next(r for r in _DE.LADDER if m <= r)
            buckets.setdefault(L, []).append(idx)
        inflight = []
        t_disp = _time.time()
        import jax.numpy as jnp
        from ..ops.align_device import _gather_pad2, _pack_tasks
        for L in sorted(buckets):
            idxs = buckets[L]
            # length-sort within the bucket: homogeneous 256-row tiles
            # let the traceback kernel's max_s guard kill trailing
            # super-blocks per tile (align_tb_pallas round-4 skip)
            idxs.sort(key=lambda i: len(tasks[i][0]) + len(tasks[i][1]))
            B = self._batch_for(L)
            for ofs in range(0, len(idxs), B):
                chunk = idxs[ofs:ofs + B]
                cat, qo, qlen, to_, tlen = _pack_tasks(tasks, chunk, B, L)
                # pad on device: one flat H2D + gather (the per-row host
                # padding loop costs seconds per chunk at scale)
                q, t = _gather_pad2(
                    jnp.asarray(cat), jnp.asarray(qo), jnp.asarray(qlen),
                    jnp.asarray(to_), jnp.asarray(tlen), L=L,
                    fill_q=4, fill_t=5)
                inflight.append((chunk, self._align_tb(q, qlen, t, tlen)))
        LOG.info("cns.device: dispatched %d aln tasks, %d buckets %s, "
                 "%d batches in %.1fs", len(tasks), len(buckets),
                 sorted(buckets), len(inflight), _time.time() - t_disp)
        return inflight

    def collect_tasks(self, tasks, inflight):
        """Block on dispatched batches; returns per-task
        (dist, n_cols, q_aln, t_aln) (ASCII bytes; n_cols == 0 when no
        alignment)."""
        import time as _time
        import jax
        from ..ops.align_tb import moves_to_alignment, unpack_moves
        results = [None] * len(tasks)
        t_coll = _time.time()
        t_host = 0.0
        # ONE batched device_get for every in-flight array: sequential
        # np.asarray costs a ~25ms tunnel round-trip each on a networked
        # chip (4 outputs x dozens of batches = seconds of pure RTT)
        fetched = jax.device_get([outs for _, outs in inflight])
        # free the device arrays NOW: the axon client releases fetched
        # buffers (and their host shadows) lazily, which grew RSS by
        # ~150-240MB per chunk at Dmel scale until the client wedged
        # (round-4 100Mb run); explicit deletes keep it flat
        for _, outs in inflight:
            for a in outs:
                try:
                    a.delete()
                except Exception:
                    pass
        use_native = native.available()
        for (chunk, _), (bi, bj, bd, mvp) in zip(inflight, fetched):
            _t0 = _time.time()
            if use_native:
                # one C++ pass over the batch's packed move plane
                alns = native.moves_to_alns(
                    mvp, np.arange(len(chunk), dtype=np.int32),
                    [tasks[idx][0] for idx in chunk],
                    [tasks[idx][1] for idx in chunk])
                for k, idx in enumerate(chunk):
                    ncols, qa, ta = alns[k]
                    results[idx] = (int(bd[k]), ncols, qa, ta)
            else:
                mv = unpack_moves(mvp)
                for k, idx in enumerate(chunk):
                    qc, tc = tasks[idx]
                    qa, ta = moves_to_alignment(qc, tc, mv[:, k])
                    results[idx] = (int(bd[k]), len(qa), qa, ta)
            t_host += _time.time() - _t0
        LOG.info("cns.device: collected %d aln tasks in %.1fs "
                 "(host reconstruct %.1fs)", len(tasks),
                 _time.time() - t_coll, t_host)
        return results

    def align_tasks(self, tasks):
        """tasks: [(q_codes, t_codes)] -> [(dist, n_cols, q_aln, t_aln)]
        (q_aln/t_aln ASCII bytes; n_cols == 0 when no alignment)."""
        return self.collect_tasks(tasks, self.dispatch_tasks(tasks))

    # -- per-chunk consensus --------------------------------------------------
    def dispatch_chunk(self, chunk, cfg):
        """Build and queue one chunk's alignment tasks (non-blocking).

        chunk: [(seed_id, seed_seq, sups)] from gate_group_ranged.
        Returns an opaque state for finish_chunk."""
        tasks = []
        task_of = []    # (group_idx, sup_idx, s1, s2)
        group_alns = [[] for _ in chunk]  # per group: (order, aln tuple)
        for gi, (seed_id, seed_seq, sups) in enumerate(chunk):
            seed_codes = seq_to_codes(seed_seq)
            for si, (sup, rng, is_self) in enumerate(sups):
                if is_self:
                    # identity alignment, no device work needed
                    ascii_ = seq_to_ascii(seed_seq)
                    group_alns[gi].append((si, (ascii_, ascii_, 0, 0)))
                    continue
                if rng is None:
                    rng = self._host_range(sup, seed_seq, cfg)
                    if rng is None:
                        continue
                rng = _clamp_range(rng, len(sup), len(seed_seq))
                if not _range_ok(rng):
                    continue
                s1, e1, s2, e2 = rng
                tasks.append((seq_to_codes(sup)[s1:e1],
                              seed_codes[s2:e2]))
                task_of.append((gi, si, s1, s2))
        inflight = self.dispatch_tasks(tasks)
        return (chunk, cfg, tasks, task_of, group_alns, inflight)

    def finish_chunk(self, state):
        """Collect one dispatched chunk and run the host MSA/DP.
        Returns [(seed_id, consensus_str)]."""
        chunk, cfg, tasks, task_of, group_alns, inflight = state
        max_diff = 1.0 - cfg.min_idt
        res = self.collect_tasks(tasks, inflight)
        for (gi, si, s1, s2), r in zip(task_of, res):
            dist, ncols, qa, ta = r
            if ncols > 500 and (float(dist) / float(ncols)) < max_diff:
                group_alns[gi].append((si, (qa, ta, s1, s2)))
        import time as _time
        from concurrent.futures import ThreadPoolExecutor
        t_msa = _time.time()

        def one(gi):
            seed_id, seed_seq, sups = chunk[gi]
            alns = [a for _, a in sorted(group_alns[gi], key=lambda x: x[0])]
            if not alns:
                return (seed_id, "")
            return (seed_id, self._msa(len(seed_seq), alns, cfg.min_cov))

        # the native MSA releases the GIL; two workers keep both host
        # cores busy while the device aligns the next chunk
        with ThreadPoolExecutor(2) as tpe:
            out = list(tpe.map(one, range(len(chunk))))
        LOG.info("cns.device: chunk of %d groups: msa %.1fs",
                 len(chunk), _time.time() - t_msa)
        return out

    def consensus_chunk(self, chunk, cfg):
        """chunk: [(seed_id, seed_seq, sups)] from gate_group_ranged.
        Returns [(seed_id, consensus_str)]."""
        if self.use_dp:
            return self.finish_chunk_dp(self.dispatch_chunk_dp(chunk, cfg))
        return self.finish_chunk(self.dispatch_chunk(chunk, cfg))

    # -- fully-device path: MSA + DP + backtrack on chip -------------------
    def _dp_group_cap(self, T):
        """Groups per DP batch under the MSA HBM budget.

        Models the TPU tiled layout: a trailing dim rounds up to 128
        lanes, so budget by padded bytes -- the [G,T,k] MSA buffers plus
        their [T,G,k] scan transposes, and the bp/emit planes (+flip)."""
        D = self.dp_delta_cap

        def lanes(k):
            return -(-k // 128) * 128

        msa = T * (lanes(5 * 16) + lanes((D - 1) * 5 * 6)) * 2
        planes = T * lanes(D * 5)
        bytes_per_group = 2 * msa + 3 * planes
        return max(4, int(self.dp_budget // bytes_per_group))

    def _dispatch_align_meta(self, tasks, gidx, s2):
        """dispatch_tasks, but keeps each batch's device q plane + task
        meta for the on-device tag accumulation.

        Returns [(q_dev, bd_outs, gidx_b, s2_b)] per align batch."""
        import jax.numpy as jnp
        from ..ops.align_device import DeviceExtender as _DE
        from ..ops.align_device import _gather_pad2, _pack_tasks
        buckets = {}
        for idx, (qc, tc) in enumerate(tasks):
            m = max(len(qc), len(tc), 1)
            L = next(r for r in _DE.LADDER if m <= r)
            buckets.setdefault(L, []).append(idx)
        out = []
        for L in sorted(buckets):
            idxs = buckets[L]
            # length-sort (see dispatch_tasks): tile-homogeneous batches
            # for the traceback kernel's max_s super-block skip
            idxs.sort(key=lambda i: len(tasks[i][0]) + len(tasks[i][1]))
            B = self._batch_for(L)
            for ofs in range(0, len(idxs), B):
                chunk = idxs[ofs:ofs + B]
                cat, qo, qlen, to_, tlen = _pack_tasks(tasks, chunk, B, L)
                q, t = _gather_pad2(
                    jnp.asarray(cat), jnp.asarray(qo), jnp.asarray(qlen),
                    jnp.asarray(to_), jnp.asarray(tlen), L=L,
                    fill_q=4, fill_t=5)
                gi_b = np.full(B, -1, np.int32)
                s2_b = np.zeros(B, np.int32)
                gi_b[:len(chunk)] = [gidx[i] for i in chunk]
                s2_b[:len(chunk)] = [s2[i] for i in chunk]
                outs = self._align_tb(q, qlen, t, tlen, emit_base=True)
                out.append((q, outs, jnp.asarray(gi_b), jnp.asarray(s2_b)))
        return out

    def _dispatch_dp_batch(self, chunk, sub, G, T, cfg):
        """One DP batch: self tags + align batches folded into the MSA
        buffers + forward scan + backtrack, all queued async on device.

        sub: indices into chunk (len <= G; padded groups stay empty)."""
        import jax.numpy as jnp
        from ..ops import cns_dp
        D = self.dp_delta_cap
        seeds = np.full((G, T), 4, np.int8)
        tlens = np.zeros(G, np.int32)
        tasks, gidx_l, s2_l = [], [], []
        for g, ci in enumerate(sub):
            seed_id, seed_seq, sups = chunk[ci]
            sc = seq_to_codes(seed_seq)
            seeds[g, :len(sc)] = np.minimum(sc, 4)
            tlens[g] = len(sc)
            for (sup, rng, is_self) in sups:
                if is_self:
                    continue   # covered exactly by add_self_tags
                if rng is None:
                    rng = self._host_range(sup, seed_seq, cfg)
                    if rng is None:
                        continue
                rng = _clamp_range(rng, len(sup), len(seed_seq))
                if not _range_ok(rng):
                    continue
                s1, e1, s2, e2 = rng
                tasks.append((seq_to_codes(sup)[s1:e1], sc[s2:e2]))
                gidx_l.append(g)
                s2_l.append(s2)
        msa = cns_dp.alloc_msa(G, T, D)
        msa = cns_dp.add_self_tags(msa, jnp.asarray(seeds),
                                   jnp.asarray(tlens), T)
        max_diff = 1.0 - cfg.min_idt
        # Default = the scatter path: measured 89ms vs 954ms/batch for
        # the matmul variant at production shapes (B=256, S=4096,
        # T=8192, G=32, warm) -- the XLA scatter-add is NOT the DP
        # path's bottleneck (round-3's ~1us/update attribution was
        # wrong; see BASELINE.md round-3 addendum).  self.use_mm
        # (FTPU_CNS_MM=1, resolved once in __init__) selects the MXU
        # one-hot-matmul variant (bit-identical on real move streams,
        # tests/test_cns_dp.py).
        use_mm = self.use_mm
        for (q, outs, gi_b, s2_b) in \
                self._dispatch_align_meta(tasks, gidx_l, s2_l):
            bd, mvp = outs[2], outs[3]
            if use_mm:
                msa = cns_dp.accumulate_tags_mm(
                    msa, mvp, q, bd, gi_b, s2_b,
                    np.float32(max_diff), T, D, G)
            elif len(outs) == 5:
                # pallas traceback: base stream rides along -> the
                # gather-free decode (3 fewer TPU gathers per batch,
                # ~70ms at production shapes; round-4 microbench)
                msa = cns_dp.accumulate_tags_planes(
                    msa, mvp, outs[4], bd, gi_b, s2_b,
                    np.float32(max_diff), T, D)
            else:
                msa = cns_dp.accumulate_tags(
                    msa, mvp, q, bd, gi_b, s2_b,
                    np.float32(max_diff), T, D)
        bp, cov, gb_s, gb_t, gb_d, gb_b = cns_dp.consensus_scan(
            msa, G, T, D, prefix=self.use_prefix)
        if self.use_walk:
            # path-walk backtrack: dense emission stream, no plane, no
            # compact search; `done` False (walk hit the step cap before
            # the path start) falls back to the plane path at collect
            cap = max(2, int(2 * T * self.walk_cap_frac)) & ~1
            packed, wdone = cns_dp.backtrack_walk(
                bp, cov, gb_s, gb_t, gb_d, gb_b,
                int(cfg.min_cov), G, T, D, cap=cap)
            return (sub, (bp, cov, gb_t, gb_d, gb_b, cfg.min_cov),
                    gb_s, len(tasks), packed, wdone, -1)
        emit = cns_dp.backtrack(bp, cov, gb_s, gb_t, gb_d, gb_b,
                                np.int32(cfg.min_cov), G, T, D)
        # compact on device: collect fetches [G, cap+1] rows instead of
        # the [T, G, D] planes (~D x fewer tunnel bytes); the full plane
        # stays live only as the rare overflow fallback
        cap = T + T // 4
        comp, counts = cns_dp.compact_emit(emit, cap=cap)
        return (sub, emit, gb_s, len(tasks), comp, counts, cap)

    def dispatch_chunk_dp(self, chunk, cfg):
        """Queue one chunk of gated groups through the full device path.
        Returns an opaque state for finish_chunk_dp."""
        import time as _time
        t0 = _time.time()
        buckets = {}
        for ci, (seed_id, seed_seq, sups) in enumerate(chunk):
            T = max(1024, 1 << int(np.ceil(np.log2(max(
                len(seed_seq), 2)))))
            buckets.setdefault(T, []).append(ci)
        batches = []
        n_tasks = 0
        for T in sorted(buckets):
            cis = buckets[T]
            Gmax = self._dp_group_cap(T)
            for ofs in range(0, len(cis), Gmax):
                sub = cis[ofs:ofs + Gmax]
                # pad G to a pow2 bucket of the actual group count: full
                # batches share one compiled shape, small tails don't pay
                # for Gmax-wide scans
                G = min(Gmax, max(8, 1 << int(np.ceil(np.log2(
                    max(len(sub), 2))))))
                st = self._dispatch_dp_batch(chunk, sub, G, T, cfg)
                n_tasks += st[3]
                batches.append(st)
                # bound live MSA buffers: wait for the scan of the
                # batch-before-last before queueing more.  A real sync
                # (1-element fetch) -- block_until_ready does not
                # reliably block on the axon remote runtime.
                if len(batches) > 2:
                    import jax as _jax
                    _jax.device_get(batches[-3][2][0:1])
        LOG.info("cns.device-dp: chunk of %d groups -> %d DP batches "
                 "(%d aln tasks, T buckets %s) dispatched in %.1fs",
                 len(chunk), len(batches), n_tasks,
                 sorted(buckets), _time.time() - t0)
        return (chunk, batches)

    def finish_chunk_dp(self, state):
        """Collect DP batches; host only decodes the COMPACTED emission
        rows (full [T, G, D] planes are fetched only for the rare group
        whose emission overflowed the compaction cap).
        Returns [(seed_id, consensus_str)] in chunk order."""
        import time as _time
        import jax
        from ..ops import cns_dp
        chunk, batches = state
        t0 = _time.time()
        out = [None] * len(chunk)
        fetched = jax.device_get(
            [(comp, counts) for (_, _, _, _, comp, counts, _) in batches])
        n_overflow = 0
        for (sub, emit, gbs, _, _, _, cap), (comp, counts) in \
                zip(batches, fetched):
            if cap == -1:
                # walk path: comp = packed stream rows, counts = done
                # flags; a False flag (walk overran its step cap before
                # the path start -- pathological dash chains) recomputes
                # the plane backtrack for that batch once
                plane = None
                for g, ci in enumerate(sub):
                    if counts[g]:
                        out[ci] = (chunk[ci][0],
                                   cns_dp.assemble_walk(comp[g]))
                    else:
                        n_overflow += 1
                        if plane is None:
                            bp, cov, gb_t, gb_d, gb_b, min_cov = emit
                            G, T = cov.shape
                            D = bp.shape[2] // 5
                            plane = cns_dp.backtrack(
                                bp, cov, gbs, gb_t, gb_d, gb_b,
                                np.int32(min_cov), G, T, D)
                        out[ci] = (chunk[ci][0],
                                   cns_dp.assemble_consensus(
                                       jax.device_get(
                                           plane[:, g, :])[:, None, :],
                                       0))
                continue
            for g, ci in enumerate(sub):
                cnt = int(counts[g])
                if cnt > cap:
                    n_overflow += 1
                    out[ci] = (chunk[ci][0],
                               cns_dp.assemble_consensus(
                                   jax.device_get(emit[:, g, :])[:, None, :],
                                   0))
                else:
                    out[ci] = (chunk[ci][0],
                               cns_dp.assemble_compacted(comp[g], cnt))
        # explicit device-buffer deletes (see collect_tasks: the axon
        # client frees fetched/retired buffers lazily)
        for st in batches:
            arrs = [st[2], st[4], st[5]]
            if isinstance(st[1], tuple):
                arrs.extend(st[1][:5])      # bp, cov, gb_t, gb_d, gb_b
            else:
                arrs.append(st[1])          # emit plane
            for a in arrs:
                try:
                    a.delete()
                except Exception:
                    pass
        LOG.info("cns.device-dp: collected %d groups in %.1fs"
                 "%s", len(chunk), _time.time() - t0,
                 " (%d overflow plane fetches)" % n_overflow
                 if n_overflow else "")
        return out

    def _msa(self, t_len, alns, min_cov):
        if native.available():
            return native.cns_from_alns(t_len, alns, min_cov)
        tag_seqs = [consensus_dp.get_align_tags(qa, ta, s1, s2, j, 0)
                    for j, (qa, ta, s1, s2) in enumerate(alns)]
        return consensus_dp.get_cns_from_align_tags(tag_seqs, t_len,
                                                    min_cov)

    def _host_range(self, sup, seed, cfg):
        """Range fallback when no overlap coordinates travel with the
        group (stream inputs): host k-mer chain, reference semantics."""
        from ..ops import kmer as _kmer
        if isinstance(seed, np.ndarray):
            seed = seq_to_ascii(seed).decode()
        if isinstance(sup, np.ndarray):
            sup = seq_to_ascii(sup).decode()
        lookup = _kmer.KmerLookup(seed, cfg.K)
        qp, tp = lookup.find_kmer_pos_for_seq(sup)
        if len(qp) == 0:
            return None
        r = _kmer.find_best_aln_range(qp, tp, cfg.K, cfg.K * 6, 5)
        return (r.s1, r.e1, r.s2, r.e2)


def run_consensus_device(groups, cfg, out, dev=None, progress_cb=None):
    """Device-path drop-in for cns.runner.run_consensus.

    groups: iterable of (seed_id, [(read_id, seq, rng), ...]) with the
    seed first (rng=None for it).  Writes pread FASTA to `out`; returns
    the number of sequences emitted.

    progress_cb(k): called after each chunk's output is fully written,
    with k = how many input groups are completely processed (gated-out
    groups between chunks count at the next chunk boundary).  Because
    emission order == dispatch order, the first k groups' output is
    durable once the callback fires -- the driver uses this for
    mid-phase checkpointing (the consensus phase is hours at >=100Mb
    scale and the remote-TPU client can wedge mid-run)."""
    from concurrent.futures import ThreadPoolExecutor
    from . import runner
    dev = dev or DeviceCns()
    emitted = 0
    chunk = []
    n_tasks = 0
    futs = []
    n_pulled = [0]       # groups pulled from the iterator
    chunk_mark = [0]     # n_pulled when the current chunk was cut

    finish_one = dev.finish_chunk_dp if dev.use_dp else dev.finish_chunk
    dispatch_one = dev.dispatch_chunk_dp if dev.use_dp else \
        dev.dispatch_chunk

    n_chunks = [0]

    def finish(state, mark):
        # single finisher thread: emission order == dispatch order, and
        # `out` is only ever written from here
        nonlocal emitted
        for seed_id, cns in finish_one(state):
            emitted += runner.format_output(cns, seed_id, cfg, out)
        if progress_cb is not None:
            progress_cb(mark)
        # break reference cycles holding retired jax arrays: combined
        # with the explicit deletes in collect, this keeps RSS flat on
        # long runs (the 100Mb e2e leaked ~130MB/chunk without it)
        n_chunks[0] += 1
        import gc
        gc.collect()
        if n_chunks[0] % 25 == 0:
            try:
                rss = int(open("/proc/self/statm").read().split()[1]) \
                    * 4096 // (1 << 20)
                LOG.info("cns.device: chunk %d, rss %d MB",
                         n_chunks[0], rss)
            except OSError:
                pass

    # Software pipeline, depth 2: the main thread gates groups and
    # dispatches device batches; the finisher thread blocks on collect
    # and runs reconstruction + MSA/DP (the C++ calls release the GIL).
    with ThreadPoolExecutor(1) as finisher:

        def flush():
            nonlocal chunk, n_tasks
            if not chunk:
                return
            state = dispatch_one(chunk, cfg)
            chunk = []
            n_tasks = 0
            futs.append(finisher.submit(finish, state, chunk_mark[0]))
            while len(futs) > 2:     # bound in-flight chunks (HBM/host RAM)
                futs.pop(0).result()

        import time as _time
        t_gate = 0.0
        t_gen = 0.0
        t0 = _time.time()
        groups = iter(groups)
        while True:
            t_gen -= _time.time()
            nxt = next(groups, None)
            t_gen += _time.time()
            if nxt is None:
                break
            n_pulled[0] += 1
            seed_id, items = nxt
            t_gate -= _time.time()
            gated = gate_group_ranged(seed_id, items, cfg)
            t_gate += _time.time()
            if gated is None:
                continue
            seed_seq, sups = gated
            chunk.append((seed_id, seed_seq, sups))
            chunk_mark[0] = n_pulled[0]
            n_tasks += len(sups)
            if n_tasks >= dev.chunk_tasks:
                flush()
        flush()
        if progress_cb is not None and n_pulled[0] > chunk_mark[0]:
            # trailing gated-out groups after the last chunk
            futs.append(finisher.submit(progress_cb, n_pulled[0]))
        for f in futs:
            f.result()
        LOG.info("cns.device: total %.1fs (group gen %.1fs, gate %.1fs)",
                 _time.time() - t0, t_gen, t_gate)
    return emitted
