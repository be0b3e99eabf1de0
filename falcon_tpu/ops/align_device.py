"""Batched banded alignment on device (JAX/XLA, TPU-first).

The overlap engine's extension step -- the FLOP-dominant loop of the whole
assembler (the role of the reference's O(ND) wavefront, src/c/
DW_banded.c:115) -- reformulated for the TPU's vector unit:

  * anti-diagonal banded edit-distance DP: the wavefront over s=i+j has no
    intra-step dependency, so each step is pure elementwise min/add over a
    [batch, band] tile; sequences are read with contiguous dynamic slices
    (no gathers, which TPUs hate)
  * the band window tracks the main diagonal (i ~ j); overlap extensions
    start from a chained seed anchor so residual diagonal drift is a random
    walk of the indel imbalance, far below the band radius
  * "extension" semantics: the DP runs until the band has passed every
    boundary cell (i == q_len or j == t_len); the best boundary cell under
    score = (i+j) - end_bonus*D is the overlap end, mirroring the greedy
    aligner's reach-either-end behavior
  * int16 distances in VMEM, one [B, W] tile per step; batch entries are
    independent, so forward and backward extensions of the same pair ride
    the same batch

Unlike ops.align (bit-exact vs the reference C, used where alignment
STRINGS feed consensus), this kernel only needs faithful end coordinates
and distances: the reference treats its overlapper as a black box and only
consumes overlap records (SURVEY.md "daligner semantics without daligner").
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = np.int32(1 << 20)


def _hb_tick():
    from ..utils.system import heartbeat_tick
    heartbeat_tick()


def _collect(entries, results, group=8):
    """device_get in groups, writing (i, j, d) results and beating the
    supervisor heartbeat between groups: one monolithic end-of-pair
    fetch gave no liveness signal for minutes on a big block pair, so a
    wedged device_get (the observed remote-client failure mode) was
    indistinguishable from a long healthy one.  The extra tunnel
    round-trips are ~25ms per group -- noise next to batch compute."""
    from ..utils.system import heartbeat_tick
    for s in range(0, len(entries), group):
        part = entries[s:s + group]
        fetched = jax.device_get([outs for _, outs in part])
        for (chunk, _), (bi, bj, bd) in zip(part, fetched):
            for k, idx in enumerate(chunk):
                results[idx] = (int(bi[k]), int(bj[k]), int(bd[k]))
        heartbeat_tick()


# Cap on dispatched-but-uncollected batches.  Unbounded dispatch (queue
# EVERY batch of a pair, then fetch) piled hundreds of H2D transfers +
# result buffers into the remote client at 100Mb scale -- the staging
# growth behind the observed RSS leak, and the state in which the
# client's device_get wedges.  16 in-flight batches still hides the
# tunnel round-trip behind device compute.
_INFLIGHT_CAP = int(__import__("os").environ.get(
    "FTPU_INFLIGHT_BATCHES", "16"))


def _maybe_drain(inflight, results):
    if len(inflight) > _INFLIGHT_CAP:
        n = len(inflight) - _INFLIGHT_CAP
        _collect(inflight[:n], results)
        del inflight[:n]


@functools.partial(jax.jit, static_argnames=("W", "end_bonus"))
def extend_batch_device(q, qlen, t, tlen, W=512, end_bonus=3):
    """Banded edit-distance extension for a batch of sequence pairs.

    q: [B, Lq] int8/int32 codes (0..3; pad with 4), qlen: [B] int32
    t: [B, Lt] int8/int32 codes (0..3; pad with 5), tlen: [B] int32
    (int8 inputs minimize host->device transfer; cast happens on device)
    Returns (best_i, best_j, best_d): per pair, the boundary cell
    (i == qlen or j == tlen) maximizing (i+j) - end_bonus*d, and its edit
    distance.  (0, 0, 0) means no extension.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    S_max = Lq + Lt

    # qpad1[x] == q[x-1] (left-shifted view for the i-1 char reads)
    qpad1 = jnp.pad(q.astype(jnp.int32), ((0, 0), (1, W + 2)),
                    constant_values=4)
    # reversed t so the antidiagonal's t-chars are an ascending slice
    rt = jnp.flip(t.astype(jnp.int32), axis=1)
    rtpad = jnp.pad(rt, ((0, 0), (W + 2, W + 2)), constant_values=5)

    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]          # [1, W]
    qlenc = qlen.astype(jnp.int32)[:, None]                   # [B, 1]
    tlenc = tlen.astype(jnp.int32)[:, None]

    def off_of(s):
        return jnp.maximum(0, s // 2 - W // 2)

    def shift(prev, delta):
        """prev: [B, W] -> out[l] = prev[l + delta], INF beyond the edges
        (delta in [-1, 2])."""
        p = jnp.pad(prev, ((0, 0), (2, 2)), constant_values=INF)
        return jax.lax.dynamic_slice(p, (0, delta + 2), (B, W))

    def body(carry, s):
        prev, prev2, best_score, best_i, best_j, best_d = carry
        o = off_of(s)
        o1 = off_of(s - 1)
        o2 = off_of(s - 2)
        d1 = o - o1
        d2 = o - o2

        i = o + lanes                                         # [B(1), W]
        j = s - i

        up = shift(prev, d1)          # D[i, j-1]  (prev at l + d1)
        left = shift(prev, d1 - 1)    # D[i-1, j]
        diag = shift(prev2, d2 - 1)   # D[i-1, j-1]

        # chars: q[i-1] = qpad1[o + l]
        qc_im1 = jax.lax.dynamic_slice(qpad1, (0, o), (B, W))
        # t[j-1] = rt[Lt - j] -> padded index (W+2) + Lt - j
        #        = (W+2) + Lt - s + o + l : ascending slice at offset
        tc_jm1 = jax.lax.dynamic_slice(rtpad, (0, (W + 2) + Lt - s + o),
                                       (B, W))

        sub = jnp.where(qc_im1 == tc_jm1, 0, 1)
        cand = jnp.minimum(jnp.minimum(up + 1, left + 1), diag + sub)

        # DP boundary rows/cols
        cand = jnp.where(i == 0, j, cand)
        cand = jnp.where(j == 0, i, cand)

        valid = (i >= 0) & (i <= qlenc) & (j >= 0) & (j <= tlenc)
        cur = jnp.where(valid, cand, INF)

        at_end = valid & ((i == qlenc) | (j == tlenc))
        score = jnp.where(at_end, (i + j) - end_bonus * cur, -INF)
        lane_best = jnp.argmax(score, axis=1)
        lane_score = jnp.take_along_axis(score, lane_best[:, None],
                                         axis=1)[:, 0]
        improved = lane_score > best_score
        li = jnp.take_along_axis(i + jnp.zeros_like(score),
                                 lane_best[:, None], axis=1)[:, 0]
        lj = jnp.take_along_axis(j + jnp.zeros_like(score),
                                 lane_best[:, None], axis=1)[:, 0]
        ld = jnp.take_along_axis(cur, lane_best[:, None], axis=1)[:, 0]
        best_score = jnp.where(improved, lane_score, best_score)
        best_i = jnp.where(improved, li, best_i)
        best_j = jnp.where(improved, lj, best_j)
        best_d = jnp.where(improved, ld, best_d)

        return (cur, prev, best_score, best_i, best_j, best_d), None

    zeros = jnp.zeros((B,), dtype=jnp.int32)
    # the s=0 antidiagonal holds D[0,0] = 0 at lane 0 (offset 0)
    prev0 = jnp.full((B, W), INF, jnp.int32).at[:, 0].set(0)
    init = (prev0,
            jnp.full((B, W), INF, jnp.int32),
            jnp.full((B,), -INF, jnp.int32), zeros, zeros, zeros)
    (prev, prev2, bs, bi, bj, bd), _ = jax.lax.scan(
        body, init, jnp.arange(1, S_max + 1, dtype=jnp.int32))
    found = bs > -INF
    return (jnp.where(found, bi, 0), jnp.where(found, bj, 0),
            jnp.where(found, bd, 0))


@functools.partial(jax.jit, static_argnames=("L", "fill_q", "fill_t"))
def _gather_pad2(cat, q_offs, q_lens, t_offs, t_lens, L, fill_q, fill_t):
    """Device-side batch padding: one flat int8 concat of all rows ->
    two [B, L] padded planes.  Replaces the per-row host padding loop
    (10^5+ python row writes per block at E. coli scale)."""
    import jax.numpy as jnp
    ar = jnp.arange(L, dtype=jnp.int32)[None, :]
    cap = cat.shape[0] - 1

    def one(offs, lens, fill):
        idx = jnp.minimum(offs[:, None] + ar, cap)
        return jnp.where(ar < lens[:, None], cat[idx], jnp.int8(fill))

    return one(q_offs, q_lens, fill_q), one(t_offs, t_lens, fill_t)


def _pack_tasks(tasks, idxs, B, L):
    """Host side of _gather_pad2: ONE np.concatenate of the B tasks'
    q/t slices into a fixed [2*B*L + 1] buffer + offset/length vectors
    (a single C call instead of 2B per-row copies)."""
    parts = []
    for idx in idxs:
        qc, tc = tasks[idx]   # uint8 code arrays (views are fine --
        parts.append(qc)      # np.concatenate strides through them)
        parts.append(tc)
    n = len(parts)
    lens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=n)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    cat = np.zeros(2 * B * L + 1, np.uint8)
    if n:
        np.concatenate(parts, out=cat[:offs[-1]])
    q_offs = offs[0:n:2].astype(np.int32)
    t_offs = offs[1:n:2].astype(np.int32)
    q_lens = lens[0::2].astype(np.int32)
    t_lens = lens[1::2].astype(np.int32)
    pad = B - len(q_offs)
    if pad:
        z = np.zeros(pad, np.int32)
        q_offs = np.concatenate([q_offs, z])
        t_offs = np.concatenate([t_offs, z])
        q_lens = np.concatenate([q_lens, z])
        t_lens = np.concatenate([t_lens, z])
    return cat.view(np.int8), q_offs, q_lens, t_offs, t_lens


@functools.partial(jax.jit,
                   static_argnames=("L", "fill_q", "fill_t"))
def _gather_specs2(flat, q_off, q_len, q_dir, t_off, t_len, t_dir,
                   L, fill_q, fill_t):
    """Spec-based device padding: rows are (offset, length, direction)
    slices of ONE resident flat code array (the block's packed reads,
    shipped to HBM once per block pair) -- no per-task bytes cross the
    tunnel at all.  dir=-1 reads the slice reversed (the backward
    extension of an anchor)."""
    import jax.numpy as jnp
    ar = jnp.arange(L, dtype=jnp.int32)[None, :]
    cap = flat.shape[0] - 1

    def one(off, ln, dr, fill):
        idx = jnp.clip(off[:, None] + ar * dr[:, None], 0, cap)
        return jnp.where(ar < ln[:, None], flat[idx], jnp.int8(fill))

    return one(q_off, q_len, q_dir, fill_q), one(t_off, t_len, t_dir,
                                                 fill_t)


def pack_flat_2bit(flat_u8):
    """Host: flat uint8 codes -> 2-bit packed uint32 words (16 bases per
    word, base i in bits 2*(i%16)).  Non-ACGT codes map to 3 -- the
    DAZZ_DB convention of substituting Ns is the same loss of
    information (2-bit DBs cannot carry N)."""
    n = len(flat_u8)
    pad = (-n) % 16
    d = np.empty(n + pad, np.uint32)
    d[:n] = np.where(flat_u8 < 4, flat_u8, 3)
    d[n:] = 0
    d = d.reshape(-1, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return (d << shifts).sum(axis=1, dtype=np.uint32)


def _gather_specs2_packed_ref(packed, q_off, q_len, q_dir, t_off, t_len,
                              t_dir, L, fill_q, fill_t):
    """Reference formulation of the packed spec gather (per-ELEMENT word
    gather).  Kept for the equivalence test of the word-level fast path
    below; not jitted/hot."""
    import jax.numpy as jnp
    ar = jnp.arange(L, dtype=jnp.int32)[None, :]
    nwords = packed.shape[0]
    cap = nwords * 16 - 1

    def one(off, ln, dr, fill):
        idx = jnp.clip(off[:, None] + ar * dr[:, None], 0, cap)
        w = packed[jnp.clip(idx >> 4, 0, nwords - 1)]
        b = (w >> (2 * (idx & 15)).astype(jnp.uint32)) & jnp.uint32(3)
        return jnp.where(ar < ln[:, None], b.astype(jnp.int8),
                         jnp.int8(fill))

    return one(q_off, q_len, q_dir, fill_q), one(t_off, t_len, t_dir,
                                                 fill_t)


@functools.partial(jax.jit,
                   static_argnames=("L", "fill_q", "fill_t"))
def _gather_specs2_packed(packed, q_off, q_len, q_dir, t_off, t_len,
                          t_dir, L, fill_q, fill_t):
    """_gather_specs2 over a 2-bit packed resident array: the block's
    codes live in HBM 4x denser (SURVEY section 7 step 9) and unpack on
    the fly during the task gather.

    WORD-LEVEL formulation: a per-element word gather cost 1.7x the
    extension kernel itself (profiled: 0.30s gather vs 0.18s kernel at
    B=2048/L=8192).  Every task row is an affine slice of the flat
    array, so (a) reversed rows (dir=-1) become a FORWARD gather from
    off-(L-1) followed by a cheap row flip, and (b) each 16-lane group
    then needs just TWO uint32 words (the group may straddle a word
    boundary), combined with a per-ROW-constant funnel shift -- 16x
    fewer gather lanes and 8x fewer gathered bytes than per-element."""
    import jax.numpy as jnp
    assert L % 16 == 0
    ar = jnp.arange(L, dtype=jnp.int32)[None, :]
    nwords = packed.shape[0]
    G = L // 16
    g = jnp.arange(G, dtype=jnp.int32)[None, :]
    sh16 = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]

    def one(off, ln, dr, fill):
        # forward start of the row's L-window; arithmetic >> floors and
        # & 15 is a true modulo for negative starts (two's complement)
        start = jnp.where(dr == 1, off, off - (L - 1))[:, None]  # [B,1]
        w0i = (start >> 4) + g                                   # [B,G]
        w0 = packed[jnp.clip(w0i, 0, nwords - 1)]
        w1 = packed[jnp.clip(w0i + 1, 0, nwords - 1)]
        s = (2 * (start & 15)).astype(jnp.uint32)                # [B,1]
        val = jnp.where(s == 0, w0, (w0 >> s) | (w1 << (32 - s)))
        codes = (val[:, :, None] >> sh16) & jnp.uint32(3)        # [B,G,16]
        F = codes.reshape(-1, L).astype(jnp.int8)
        out = jnp.where(dr[:, None] == 1, F, jnp.flip(F, axis=1))
        return jnp.where(ar < ln[:, None], out, jnp.int8(fill))

    return one(q_off, q_len, q_dir, fill_q), one(t_off, t_len, t_dir,
                                                 fill_t)


class DeviceExtender:
    """Length-bucketed batching front-end for extend_batch_device.

    Collects (q_codes, t_codes) extension tasks, pads them into power-of-2
    buckets and runs the device kernel; returns per-task (i, j, d).
    run_specs() is the zero-copy variant: tasks are (offset, len, dir)
    slices of one flat array resident on device.
    """

    def __init__(self, W=512, end_bonus=3, max_batch=128, use_pallas=None):
        from ..utils.jaxinit import setup_jax
        setup_jax()
        self.W = W
        self.end_bonus = end_bonus
        self.max_batch = max_batch
        # The pallas kernel is ~4x the XLA scan at steady state and costs
        # ~6s of mosaic compile per (L-bucket, W) shape; compiled
        # executables land in the persistent jax compilation cache, so
        # the cost is paid once per shape per HOST (keep batch shapes
        # stable -- see _batch_for).  FTPU_USE_PALLAS=0 opts out for
        # short-lived probe processes.
        if use_pallas is None:
            import os
            use_pallas = os.environ.get("FTPU_USE_PALLAS", "1") != "0"
        self.use_pallas = use_pallas
        import os as _os
        # 2-bit packed HBM residency for the spec path (4x denser block
        # transfer + storage; Ns degrade to a fixed base like DAZZ_DB)
        self.use_packed = _os.environ.get("FTPU_PACKED", "1") != "0"

    def _extend(self, q, qlen, t, tlen):
        import jax.numpy as jnp
        import jax
        if len(jax.devices()) > 1:
            # data-parallel over the device mesh (multi-chip path)
            from ..parallel.mesh import ShardedExtender
            if not hasattr(self, "_sharded"):
                self._sharded = ShardedExtender(
                    W=self.W, end_bonus=self.end_bonus,
                    use_pallas=self.use_pallas)
            return self._sharded.extend(np.asarray(q), np.asarray(qlen),
                                        np.asarray(t), np.asarray(tlen))
        if self.use_pallas:
            try:
                from .align_pallas import extend_batch_pallas
                B = q.shape[0]
                return extend_batch_pallas(
                    jnp.asarray(q.astype(np.int8, copy=False)),
                    jnp.asarray(qlen),
                    jnp.asarray(t.astype(np.int8, copy=False)),
                    jnp.asarray(tlen),
                    W=self.W, end_bonus=self.end_bonus,
                    block_b=min(256, B))
            except Exception:
                import logging
                logging.getLogger(__name__).warning(
                    "pallas extension kernel failed; falling back to XLA",
                    exc_info=True)
                self.use_pallas = False
        return extend_batch_device(
            jnp.asarray(q).astype(jnp.int32), jnp.asarray(qlen),
            jnp.asarray(t).astype(jnp.int32), jnp.asarray(tlen),
            W=self.W, end_bonus=self.end_bonus)

    def run(self, tasks):
        """tasks: list of (q_codes uint8, t_codes uint8).  Returns
        list of (i, j, d) per task."""
        if not tasks:
            return []
        results = [None] * len(tasks)
        # The extension stops at the first exhausted sequence, and the band
        # limits |i - j| to W/2, so the longer side can be truncated to
        # min(len) + W/2 + 8 without changing any result -- this collapses
        # bucket sizes (and padded compute) to ~2x the shorter side.
        cap_slack = self.W // 2 + 8
        trimmed = []
        for (qc, tc) in tasks:
            cap = min(len(qc), len(tc)) + cap_slack
            trimmed.append((qc[:cap], tc[:cap]))
        tasks = trimmed
        # bucket by max(len) on the coarse ladder (see LADDER)
        buckets = {}
        ladder_of = self._bucket_ladder(
            np.asarray([max(len(qc), len(tc), 1) for qc, tc in tasks]))
        for idx, L in enumerate(ladder_of):
            buckets.setdefault(int(L), []).append(idx)
        import logging, time as _time
        import jax
        _log = logging.getLogger(__name__)
        # Two-phase async pipeline: dispatch every batch first (JAX queues
        # the transfers + kernels without blocking), then collect.  This
        # hides the per-batch host->device->host round-trip latency (large
        # on a networked chip) behind device compute of other batches.
        # Each bucket uses ONE batch shape (B = batch cap for its L) so
        # there is exactly one compiled executable per L bucket.
        inflight = []  # (chunk_idxs, device results)
        _t_disp = _time.time()
        n_batches = 0
        import jax.numpy as jnp
        multi = len(jax.devices()) > 1
        for L in sorted(buckets):
            idxs = buckets[L]
            # length-sort within the bucket: homogeneous batch tiles let
            # the kernel's per-tile max_s guard skip trailing super-blocks
            idxs.sort(key=lambda i: len(tasks[i][0]) + len(tasks[i][1]))
            B = self._batch_for(L)
            for ofs in range(0, len(idxs), B):
                chunk = idxs[ofs:ofs + B]
                cat, qo, ql_, to_, tl_ = _pack_tasks(tasks, chunk, B, L)
                if multi:
                    # sharded path wants host arrays; pad on host
                    q = np.full((B, L), 4, dtype=np.int8)
                    t = np.full((B, L), 5, dtype=np.int8)
                    for bi_, idx in enumerate(chunk):
                        qc, tc = tasks[idx]
                        q[bi_, :len(qc)] = qc
                        t[bi_, :len(tc)] = tc
                    inflight.append((chunk, self._extend(q, ql_, t, tl_)))
                else:
                    # padding happens on device: one flat H2D + gather
                    qd, td = _gather_pad2(
                        jnp.asarray(cat), jnp.asarray(qo), jnp.asarray(ql_),
                        jnp.asarray(to_), jnp.asarray(tl_), L=L,
                        fill_q=4, fill_t=5)
                    inflight.append((chunk, self._extend(qd, ql_, td, tl_)))
                n_batches += 1
                _hb_tick()
                _maybe_drain(inflight, results)
        _t_coll = _time.time()
        # grouped device_get (NOT per-array np.asarray, which costs a
        # ~25ms tunnel round-trip each) with heartbeat ticks per group
        _collect(inflight, results)
        _log.info("extender: %d tasks, %d buckets, %d batches; "
                  "dispatch %.1fs collect %.1fs",
                  len(tasks), len(buckets), n_batches,
                  _t_coll - _t_disp, _time.time() - _t_coll)
        return results

    def run_specs(self, flat, q_off, q_len, q_dir, t_off, t_len, t_dir):
        """Zero-copy task path: every task row is an (offset, len, dir)
        slice of `flat` (uint8 codes), which is shipped to HBM once.

        Returns list of (i, j, d) per task, like run()."""
        n = len(q_off)
        if n == 0:
            return []
        import logging, time as _time
        import jax
        import jax.numpy as jnp
        _log = logging.getLogger(__name__)
        _t_disp = _time.time()
        multi = len(jax.devices()) > 1
        if multi and not self.use_packed:
            # the sharded spec path rides the packed gather; the
            # unpacked opt-out stays single-device
            self.use_packed = True
        if multi and not hasattr(self, "_mesh"):
            from ..parallel.mesh import make_mesh
            self._mesh = make_mesh()
            self._n_dev = int(np.prod(self._mesh.devices.shape))
            # mosaic kernels are TPU-only; the virtual CPU test mesh
            # rides the XLA extension kernel
            self._mesh_pallas = bool(self.use_pallas) and all(
                d.platform != "cpu" for d in self._mesh.devices.flat)
        # band cap: the longer side never advances past min(len) + W/2
        cap = np.minimum(q_len, t_len) + (self.W // 2 + 8)
        q_len = np.minimum(q_len, cap).astype(np.int32)
        t_len = np.minimum(t_len, cap).astype(np.int32)
        m = np.maximum(np.maximum(q_len, t_len), 1)
        Ls = self._bucket_ladder(m)
        if self.use_packed:
            # 2-bit packed residency: block codes sit in HBM 4x denser
            # and unpack on the fly inside the task gather
            words = pack_flat_2bit(flat)
            wl = 1 << int(np.ceil(np.log2(max(len(words), 2))))
            words_p = np.zeros(wl, np.uint32)
            words_p[:len(words)] = words
            flat_d = jnp.asarray(words_p)
            gather_fn = _gather_specs2_packed
        else:
            # resident flat, padded to a stable pow2 shape
            fl = 1 << int(np.ceil(np.log2(max(len(flat), 2))))
            flat_p = np.zeros(fl + 1, np.uint8)
            flat_p[:len(flat)] = flat
            flat_d = jnp.asarray(flat_p.view(np.int8))
            gather_fn = _gather_specs2
        specs = (q_off.astype(np.int32), q_len, q_dir.astype(np.int32),
                 t_off.astype(np.int32), t_len, t_dir.astype(np.int32))
        results = [None] * n
        inflight = []
        n_batches = 0
        n_buckets = 0
        for L in np.unique(Ls):
            idxs = np.nonzero(Ls == L)[0]
            # length-sort within the bucket (see run(): max_s skip)
            idxs = idxs[np.argsort((q_len + t_len)[idxs], kind="stable")]
            L = int(L)
            B = self._batch_for(L)
            if multi:
                # per-device shard must be a whole number of 256-row
                # pallas blocks
                tile = 256 * self._n_dev
                B = max(tile, (B // tile) * tile)
            n_buckets += 1
            self._account_cells(q_len[idxs] + t_len[idxs], B, L)
            for ofs in range(0, len(idxs), B):
                chunk = idxs[ofs:ofs + B]
                sel = np.zeros((6, B), np.int32)
                for c in range(6):
                    sel[c, :len(chunk)] = specs[c][chunk]
                # ONE H2D for all six spec vectors; rows sliced on device
                # (six small asarrays per batch were latency-bound on the
                # tunneled chip)
                if multi:
                    from ..parallel.mesh import sharded_specs_extend
                    outs = sharded_specs_extend(
                        self._mesh, flat_d, jnp.asarray(sel), L, self.W,
                        self.end_bonus, self._mesh_pallas)
                    inflight.append((chunk, outs))
                else:
                    sel_d = jnp.asarray(sel)
                    qd, td = gather_fn(
                        flat_d, sel_d[0], sel_d[1], sel_d[2], sel_d[3],
                        sel_d[4], sel_d[5], L=L, fill_q=4, fill_t=5)
                    inflight.append(
                        (chunk, self._extend(qd, sel_d[1], td, sel_d[4])))
                n_batches += 1
                _hb_tick()
                _maybe_drain(inflight, results)
        _t_coll = _time.time()
        _collect(inflight, results)
        _log.info("extender(specs): %d tasks, %d buckets, %d batches; "
                  "dispatch %.1fs collect %.1fs (occupancy %.2f cum)",
                  n, n_buckets, n_batches,
                  _t_coll - _t_disp, _time.time() - _t_coll,
                  self.occupancy() or 0.0)
        return results

    def _account_cells(self, s_true, B, L):
        """Track issued vs useful DP cells for one bucket's batches.

        The pallas kernel charges, per 256-row tile, W lanes x the
        tile's max anti-diagonal rounded up to a super-block (length-
        sorted rows make tiles near-homogeneous; align_pallas max_s
        skip).  'useful' counts each real task's own (ql+tl) sweep.
        Feeds the occupancy field bench.py reports (VERDICT r3 weak #2:
        short-task packing needs a measured bar from real mixes)."""
        from .align_pallas import SB as _SB
        tile = 256
        sb_span = 2 * _SB
        st = np.asarray(s_true, np.int64)
        useful = int(st.sum())
        issued = 0
        for ofs in range(0, len(st), tile):
            t = st[ofs:ofs + tile]
            max_s = min(int(t.max()) if len(t) else 0, 2 * L)
            issued += tile * (-(-max_s // sb_span)) * sb_span
        if not hasattr(self, "cells_issued"):
            self.cells_issued = 0
            self.cells_useful = 0
        self.cells_issued += issued
        self.cells_useful += useful
        return issued, useful

    def occupancy(self):
        """(useful / issued) anti-diagonal occupancy over every batch
        this extender dispatched (band width cancels)."""
        if not getattr(self, "cells_issued", 0):
            return None
        return self.cells_useful / self.cells_issued

    # Length ladder: pow2 with a 1024 floor.  Each distinct (B, L) shape
    # costs a ONE-TIME mosaic remote-compile (~3min on this runtime) that
    # then persists in the per-host cache, so steady-state throughput
    # (padded cells ~ L_pad/L_true, avg 1.33x at pow2 spacing) beats
    # fewer-but-coarser shapes: a 4x-spaced ladder measured ~2x slower
    # align+consensus phases at E. coli scale (tasks near a rung's floor
    # pay up to 4x).  The 1024 floor merges the numerous-but-cheap short
    # tasks into one shape.
    LADDER = tuple(1 << s for s in range(10, 19))  # 1024 .. 262144

    def _bucket_ladder(self, m):
        """Per-task padded length: smallest ladder rung >= max side."""
        Ls = np.full(len(m), self.LADDER[-1], np.int64)
        for rung in reversed(self.LADDER):
            Ls = np.where(m <= rung, rung, Ls)
        return Ls

    def _batch_for(self, L):
        """Batch size for one padded length: aim for a constant cell count
        per launch (fewer, fuller launches for short buckets)."""
        if self.use_pallas is not False:
            # the pallas kernel holds no per-batch move planes, so batch
            # size is bounded by in-flight input planes, not kernel
            # memory; fewer, fatter batches amortize the per-dispatch
            # host->device round-trips that dominate on a networked chip
            # (~38ms RTT x ~2000 batches ~= 100s at E. coli scale)
            target_cells = self.max_batch * 65536
            B = min(max(int(target_cells // max(L, 1)), 256), 4096)
            # one pallas grid block is 256 rows; keep B a multiple
            return max(256, (B // 256) * 256)
        target_cells = self.max_batch * 8192
        B = max(int(target_cells // max(L, 1)), self.max_batch)
        B = min(B, 4096)
        return max(8, 1 << int(np.ceil(np.log2(B))))
