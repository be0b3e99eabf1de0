"""Pallas TPU kernel: batched banded alignment extension.

Same results as ops.align_device.extend_batch_device (anti-diagonal banded
edit distance; best boundary cell under (i+j) - end_bonus*D), restructured
for the Mosaic compiler's memory rules (no dynamic lane indexing):

  * the scan over anti-diagonals is blocked into SUPER-BLOCKS of 128 steps;
    the grid is (batch_tiles, super_blocks) and the per-super-block
    character windows are pre-sliced on device and streamed into VMEM by
    the pallas pipeline (BlockSpec index maps), so every in-kernel slice
    offset is a compile-time constant of the unrolled 2-step body
  * the two wavefront carries (int32, INF-bordered) and the best-cell
    tracker live in VMEM scratch and persist across the super-block grid
    dimension (initialized at sb==0)
  * the window offset o(s) = s//2 - W//2 is left unclamped; lanes with
    i < 0 are masked, which computes exactly the same cell set as the
    clamped XLA formulation

Per 2-step pair (s odd then even) the carry shifts are constant
(delta1, delta2) = (0, 1) then (1, 1), and the q/t character windows
advance by one lane per pair -- all static slices of the staged windows.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF32 = np.int32(1 << 20)
NEG_INF32 = np.int32(-(1 << 30))
# NOTE on int16 carries: the wavefront values are bounded well inside
# int16 and halving the carry width would double VPU lane throughput, but
# this toolchain's mosaic legalizes almost no 16-bit vector ops on v5e
# (arith.minsi/muli/select on vector<...xi16> all fail; only add works),
# so the carries stay int32 and the roofline lever is the LEAN super-block
# class below instead (measured probe: round 3).
SB = 64          # 2-step pairs per super-block (2*SB anti-diagonals);
                 # deeper super-blocks amortize per-grid-step overhead
                 # (W=256, L=8192 sweep: SB=16 56M, SB=32 69.6M,
                 # SB=64 83.9M bases/s; L buckets are >= 256 so
                 # L % SB == 0 holds)
WINW = None      # window width = W + 2*SB (set per call)


STAMP_BIG = np.int32(1 << 30)


def _kernel(qwin_ref, twin_ref, qlen_ref, tlen_ref, minlen_ref,
            bi_ref, bj_ref, bd_ref,
            carry0_ref, carry1_ref, bs_ref, bstamp_ref, bdp_ref,
            W, end_bonus):
    BT = qlen_ref.shape[0]
    sb = pl.program_id(1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    qlen = qlen_ref[:]          # [BT, 1] int32
    tlen = tlen_ref[:]
    b = pl.program_id(0)
    min_q = minlen_ref[b, 0]    # per-tile min qlen / tlen (scalars)
    min_t = minlen_ref[b, 1]
    max_s = minlen_ref[b, 2]    # per-tile max qlen + tlen: no boundary
                                # cell (i == qlen or j == tlen) exists
                                # past s = i + j = qlen + tlen, so
                                # super-blocks starting beyond it are
                                # dead for every row of this tile

    @pl.when(sb == 0)
    def _init():
        # s=0 wavefront: D[0,0]=0 at lane (i=0 -> l = -o(0) = W/2)
        carry0_ref[:] = jnp.full((BT, W + 4), INF32, jnp.int32)
        carry1_ref[:] = jnp.full((BT, W + 4), INF32, jnp.int32)
        carry0_ref[:, 2 + W // 2] = jnp.zeros((BT,), jnp.int32)
        # per-lane best planes: score, stamp (= s*W + lane, the order
        # key that reproduces the XLA kernel's earliest-step-then-
        # lowest-lane tie-break), and the cell's distance.  Cross-lane
        # reductions happen ONCE per super-block instead of per
        # anti-diagonal (the in-loop argmax was ~50% of kernel time).
        bs_ref[:] = jnp.full((BT, W), NEG_INF32, jnp.int32)
        bstamp_ref[:] = jnp.full((BT, W), STAMP_BIG, jnp.int32)
        bdp_ref[:] = jnp.zeros((BT, W), jnp.int32)

    o_base = SB * sb - W // 2   # o at the first (odd) step of this block

    def do_step(s_off, o_rel, rel_q, rel_t, d1, prev_ref, prev2cur_ref,
                mode):
        """One anti-diagonal.  s = 2*SB*sb + s_off; o = o_base + o_rel.
        All slice offsets (rel_q, rel_t, d1) are python ints.

        mode selects the per-class op diet:
          "boundary": full path -- DP row/column-0 writes + i>=0 / j>=0
            mask terms.  Only super-blocks whose first step is <= W+1
            can touch row/column 0.
          "fast": drops the boundary writes (interior blocks have i >= 1
            and j >= 2 for free) but keeps the sequence-end validity
            mask and the scalar-guarded best tracking.
          "lean": the bulk of the scan -- the block-level scalar guard
            proved NO lane of ANY row in this tile can reach i == qlen
            or j == tlen inside this super-block, so every lane is a
            valid DP cell: no mask, no INF clamp (int32 headroom makes
            +1 drift from INF harmless), no tracking.  ~6 VPU ops/cell
            instead of ~12."""
        o = o_base + o_rel
        s = 2 * SB * sb + s_off

        up = prev_ref[:, 2 + d1:2 + d1 + W]
        left = prev_ref[:, 1 + d1:1 + d1 + W]
        diag = prev2cur_ref[:, 2:2 + W]     # delta2 == 1 -> offset 1+1

        qc = qwin_ref[0, :, rel_q:rel_q + W].astype(jnp.int32)
        tc = twin_ref[0, :, rel_t:rel_t + W].astype(jnp.int32)
        # avoid i1 vectors from int8 compares and absi (mosaic gaps):
        # mismatch cost as min((qc - tc)^2, 1)
        d = qc - tc
        sub = jnp.minimum(d * d, jnp.int32(1))

        cand = jnp.minimum(jnp.minimum(up, left) + jnp.int32(1), diag + sub)
        if mode == "lean":
            prev2cur_ref[:, 2:2 + W] = cand
            return
        if mode == "fast":
            # i <= qlen  <=>  lanes <= qlen - o;  j <= tlen  <=>
            # lanes >= (s - o) - tlen  (both rhs are [BT, 1] columns)
            valid = ((lanes <= qlen - jnp.int32(o)) &
                     (lanes >= jnp.int32(s - o) - tlen))
        else:
            i = o + lanes
            j = s - i
            # DP boundary rows/cols
            bnd_j = jnp.minimum(j, INF32)
            bnd_i = jnp.minimum(i, INF32)
            cand = jnp.where(i == 0, bnd_j, cand)
            cand = jnp.where(j == 0, bnd_i, cand)
            valid = (i >= 0) & (i <= qlen) & (j >= 0) & (j <= tlen)
        cur = jnp.where(valid, jnp.minimum(cand, INF32), INF32)

        # boundary cells (i == qlen or j == tlen) can only exist in this
        # window when the band reaches the shortest pair's ends; skip the
        # whole tracking block otherwise (scalar-guarded, big step saving)
        @pl.when((o + W >= min_q) | (s - o >= min_t))
        def _track():
            i = o + lanes
            j = s - i
            at_end = valid & ((i == qlen) | (j == tlen)) & (cur < INF32)
            score = jnp.where(at_end,
                              (i + j) - end_bonus * cur,
                              NEG_INF32)
            # per-lane update only (strict >: per lane, the earliest
            # step keeps its stamp); no cross-lane ops in the hot loop
            upd = score > bs_ref[:]
            bs_ref[:] = jnp.where(upd, score, bs_ref[:])
            bstamp_ref[:] = jnp.where(upd, jnp.int32(s * W) + lanes,
                                      bstamp_ref[:])
            bdp_ref[:] = jnp.where(upd, cur, bdp_ref[:])

        prev2cur_ref[:, 2:2 + W] = cur

    def steps(mode):
        for m in range(SB):
            # odd step s = 2*SB*sb + 2m + 1: o_rel = m; (d1, d2) = (0, 1)
            do_step(2 * m + 1, m, m, SB - m, 0, carry0_ref, carry1_ref,
                    mode)
            # even step: o_rel = m + 1; (d1, d2) = (1, 1)
            do_step(2 * m + 2, m + 1, m + 1, SB - m, 1, carry1_ref,
                    carry0_ref, mode)

    # super-blocks whose first step s0 = 2*SB*sb + 1 <= W + 1 may touch
    # DP row/column 0 and need the guarded body; the rest take the fast
    # path, and of those, blocks proven (per batch-tile, via the minlen
    # scalars) unable to reach any sequence end take the lean path:
    #   max i in block = o_base + SB + (W - 1)  <  min qlen, and
    #   max j in block = max (s - o) = SB*(sb + 1) + W/2  <  min tlen
    # (strict: i == qlen / j == tlen are exactly the boundary cells the
    # tracker must see, so lean blocks must not contain them either).
    NBB = W // (2 * SB) + 1
    lean_ok = ((o_base + SB + W - 1 < min_q) &
               (SB * (sb + 1) + W // 2 < min_t))
    alive = 2 * SB * sb + 1 <= max_s   # first step of this super-block

    @pl.when(alive & (sb < NBB))
    def _boundary_blocks():
        steps("boundary")

    @pl.when(alive & (sb >= NBB) & ~lean_ok)
    def _interior_blocks():
        steps("fast")

    @pl.when(alive & (sb >= NBB) & lean_ok)
    def _lean_blocks():
        steps("lean")

    # one cross-lane reduction per super-block visit: global max score,
    # then among max-score lanes the smallest stamp (earliest step, then
    # lowest lane = the XLA kernel's tie-break); i/j reconstruct from the
    # stamp since o(s) = s//2 - W//2
    @pl.when(sb == pl.num_programs(1) - 1)
    def _finish():
        bsc = bs_ref[:]
        m = jnp.max(bsc, axis=1)                              # [BT]
        is_max = bsc == m[:, None]
        stamp = jnp.min(jnp.where(is_max, bstamp_ref[:], STAMP_BIG),
                        axis=1)
        sel = bstamp_ref[:] == stamp[:, None]
        d = jnp.min(jnp.where(sel & is_max, bdp_ref[:], INF32), axis=1)
        s_win = stamp // W
        lane_win = stamp - s_win * W
        i = (s_win // 2 - W // 2) + lane_win
        j = s_win - i
        found = m > NEG_INF32
        bi_ref[:, 0] = jnp.where(found, i, 0)
        bj_ref[:, 0] = jnp.where(found, j, 0)
        bd_ref[:, 0] = jnp.where(found, d, 0)


@functools.partial(jax.jit, static_argnames=("W", "end_bonus", "block_b",
                                              "interpret"))
def extend_batch_pallas(q, qlen, t, tlen, W=256, end_bonus=3, block_b=256,
                        interpret=False):
    """Same contract as align_device.extend_batch_device (int8 inputs).

    q: [B, L] int8 codes (pad 4); t: [B, L] int8 codes (pad 5).
    B must be a multiple of block_b; L a multiple of 64.
    interpret=True runs the kernel in pallas interpret mode (CPU parity
    tests; mosaic is TPU-only).
    """
    B, L = q.shape
    assert t.shape == (B, L)
    assert B % block_b == 0 and L % SB == 0
    n_sb = (L + SB - 1) // SB
    winw = W + 2 * SB

    # q_ext[x] = q[x - W/2 - 1]; window sb covers ext indices
    # [SB*sb, SB*sb + winw)
    left_q = W // 2 + 1
    need_q = SB * (n_sb - 1) + winw
    q_ext = jnp.pad(q.astype(jnp.int8), ((0, 0),
                    (left_q, max(0, need_q - (L + left_q)))),
                    constant_values=4)
    # rt_ext[x] = rt[x - C], rt = reversed t; in-kernel index base
    # C + L - s + o with C = W/2 + SB + 1; window sb starts at
    # tbase(sb) = C + L - SB*sb - (SB + 1) - W/2 = L - SB*sb
    C = W // 2 + SB + 1
    rt = jnp.flip(t.astype(jnp.int8), axis=1)
    need_t = L + winw  # max ext index: tbase(0) + winw = L + winw
    rt_ext = jnp.pad(rt, ((0, 0), (C, max(0, need_t - (L + C)))),
                     constant_values=5)

    # materialize per-super-block sliding windows with a constant-size
    # graph (lax.scan of dynamic slices; a python loop of slices made the
    # XLA graph O(n_sb) and compile time explode)
    def q_slices(_, start):
        return 0, jax.lax.dynamic_slice(q_ext, (0, start), (B, winw))

    def t_slices(_, start):
        return 0, jax.lax.dynamic_slice(rt_ext, (0, start), (B, winw))

    _, qwin = jax.lax.scan(
        q_slices, 0, SB * jnp.arange(n_sb, dtype=jnp.int32))
    _, twin = jax.lax.scan(
        t_slices, 0, L - SB * jnp.arange(n_sb, dtype=jnp.int32))

    qlen2 = qlen.astype(jnp.int32)[:, None]
    tlen2 = tlen.astype(jnp.int32)[:, None]
    # per batch-tile [min qlen, min tlen] for the tracking guard; lengths 0
    # (empty pad rows) would disable the guard, so treat them as L
    nb_ = B // block_b
    qv = jnp.where(qlen2[:, 0] > 0, qlen2[:, 0], L).reshape(nb_, block_b)
    tv = jnp.where(tlen2[:, 0] > 0, tlen2[:, 0], L).reshape(nb_, block_b)
    # max_s uses the RAW lengths (pad rows contribute 0): callers sort
    # tasks by qlen+tlen so tiles are length-homogeneous and trailing
    # super-blocks go dead for whole tiles (~25-40% of the sweep at pow2
    # bucket spacing)
    sv = (qlen2[:, 0] + tlen2[:, 0]).reshape(nb_, block_b)
    minlen = jnp.stack([jnp.min(qv, axis=1), jnp.min(tv, axis=1),
                        jnp.max(sv, axis=1)],
                       axis=1).astype(jnp.int32)       # [nb, 3]

    nb = B // block_b
    kern = functools.partial(_kernel, W=W, end_bonus=end_bonus)
    out_shape = [jax.ShapeDtypeStruct((B, 1), jnp.int32)] * 3
    bi, bj, bd = pl.pallas_call(
        kern,
        grid=(nb, n_sb),
        in_specs=[
            pl.BlockSpec((1, block_b, winw), lambda b, sb: (sb, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, winw), lambda b, sb: (sb, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda b, sb: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda b, sb: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((block_b, 1), lambda b, sb: (b, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_b, W + 4), jnp.int32),  # wavefront carries
            pltpu.VMEM((block_b, W + 4), jnp.int32),
            pltpu.VMEM((block_b, W), jnp.int32),   # per-lane best score
            pltpu.VMEM((block_b, W), jnp.int32),   # per-lane stamp
            pltpu.VMEM((block_b, W), jnp.int32),   # per-lane distance
        ],
        interpret=interpret,
    )(qwin, twin, qlen2, tlen2, minlen)
    return bi[:, 0], bj[:, 0], bd[:, 0]
