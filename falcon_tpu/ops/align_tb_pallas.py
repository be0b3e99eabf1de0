"""Pallas TPU kernels: batched banded alignment WITH traceback.

Same contract as ops.align_tb.align_tb_batch, restructured for Mosaic the
way ops.align_pallas restructures the extension kernel:

  forward    anti-diagonal banded edit DP in super-blocks of 2*SB steps;
             carries live in VMEM scratch across the super-block grid dim;
             every step ALSO stores a [B, W] plane of move codes
             (0=diag, 1=up/q-gap, 2=left/t-gap) into an HBM-resident
             [n_sb, 2*SB, B, W] int8 tensor via the output pipeline
  backward   a second kernel streams those move planes in REVERSE grid
             order (BlockSpec index maps run sb = n_sb-1 .. 0) and walks
             each pair's path end -> (0,0); per anti-diagonal the pair's
             lane is read with a one-hot masked max (no gathers); per-pair
             cursors (i, j, done) persist in VMEM scratch; emits the
             [S, B] move stream 16 anti-diagonals per grid step

The XLA-scan fallback (ops.align_tb) pays ~1-3 microseconds of dispatch
per anti-diagonal; these kernels run the same recurrence in-kernel at
vector-unit speed, which is what makes device-side consensus alignment
faster than the host C++ aligner rather than slower.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF32 = np.int32(1 << 20)
NEG_INF32 = np.int32(-(1 << 30))
SB = 16  # 2-step pairs per super-block (2*SB anti-diagonals); deeper
         # super-blocks amortize grid-step overhead (VMEM-capped at 16
         # here: the move-plane block is [2*SB, block_b, W] int8)
STAMP_BIG = np.int32(1 << 30)


def _fwd_kernel(qwin_ref, twin_ref, qlen_ref, tlen_ref, minlen_ref,
                bi_ref, bj_ref, bd_ref, mv_ref,
                carry0_ref, carry1_ref, bs_ref, bstamp_ref, bdp_ref,
                W, end_bonus):
    BT = qlen_ref.shape[0]
    sb = pl.program_id(1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    qlen = qlen_ref[:]
    tlen = tlen_ref[:]
    b = pl.program_id(0)
    min_q = minlen_ref[b, 0]
    min_t = minlen_ref[b, 1]
    max_s = minlen_ref[b, 2]

    @pl.when(sb == 0)
    def _init():
        carry0_ref[:] = jnp.full((BT, W + 4), INF32, jnp.int32)
        carry1_ref[:] = jnp.full((BT, W + 4), INF32, jnp.int32)
        carry0_ref[:, 2 + W // 2] = jnp.zeros((BT,), jnp.int32)
        # per-lane best planes (see align_pallas: the in-loop cross-lane
        # argmax dominated kernel time; stamp = s*W + lane reproduces
        # the earliest-step-then-lowest-lane tie-break exactly)
        bs_ref[:] = jnp.full((BT, W), NEG_INF32, jnp.int32)
        bstamp_ref[:] = jnp.full((BT, W), STAMP_BIG, jnp.int32)
        bdp_ref[:] = jnp.zeros((BT, W), jnp.int32)

    o_base = SB * sb - W // 2

    def do_step(s_off, o_rel, rel_q, rel_t, d1, prev_ref, prev2cur_ref):
        o = o_base + o_rel
        s = 2 * SB * sb + s_off
        i = o + lanes
        j = s - i

        up = prev_ref[:, 2 + d1:2 + d1 + W]        # D[i, j-1]
        left = prev_ref[:, 1 + d1:1 + d1 + W]      # D[i-1, j]
        diag = prev2cur_ref[:, 2:2 + W]            # D[i-1, j-1]

        qc = qwin_ref[0, :, rel_q:rel_q + W].astype(jnp.int32)
        tc = twin_ref[0, :, rel_t:rel_t + W].astype(jnp.int32)
        d = qc - tc
        sub = jnp.minimum(d * d, jnp.int32(1))

        v_diag = diag + sub
        v_up = up + jnp.int32(1)
        v_left = left + jnp.int32(1)
        cand = jnp.minimum(jnp.minimum(v_up, v_left), v_diag)
        mv = jnp.where(v_diag == cand, jnp.int32(0),
                       jnp.where(v_up == cand, jnp.int32(1), jnp.int32(2)))

        bnd_j = jnp.minimum(j, INF32)
        bnd_i = jnp.minimum(i, INF32)
        cand = jnp.where(i == 0, bnd_j, cand)
        cand = jnp.where(j == 0, bnd_i, cand)
        mv = jnp.where(i == 0, jnp.int32(1), mv)   # row 0: up chain
        mv = jnp.where(j == 0, jnp.int32(2), mv)   # col 0: left chain
        # pack the q char q[i-1] into bits 2-4 of the trace plane (same
        # int8, no extra HBM traffic); the backward walk extracts it so
        # the consensus tag decode needs NO host-visible q gather
        # (ops.cns_dp.accumulate_tags_planes)
        mv_ref[0, s_off - 1] = (mv | (jnp.minimum(qc, 4) << 2)) \
            .astype(jnp.int8)
        valid = (i >= 0) & (i <= qlen) & (j >= 0) & (j <= tlen)
        cur = jnp.where(valid, jnp.minimum(cand, INF32), INF32)

        @pl.when((o + W >= min_q) | (s - o >= min_t))
        def _track():
            at_end = valid & ((i == qlen) | (j == tlen)) & (cur < INF32)
            score = jnp.where(at_end, (i + j) - end_bonus * cur, NEG_INF32)
            upd = score > bs_ref[:]
            bs_ref[:] = jnp.where(upd, score, bs_ref[:])
            bstamp_ref[:] = jnp.where(upd, jnp.int32(s * W) + lanes,
                                      bstamp_ref[:])
            bdp_ref[:] = jnp.where(upd, cur, bdp_ref[:])

        prev2cur_ref[:, 2:2 + W] = cur

    # whole-tile dead-super-block skip (align_pallas max_s semantics):
    # length-sorted batches make tiles near-homogeneous, so trailing
    # super-blocks past the tile's longest task sweep go fully dead --
    # once dead, all later sb are dead too, so the carries are never
    # needed again.  Their (unwritten) trace planes are never read: the
    # backward walk starts at i+j <= max_s and its own any_here skip
    # covers the same range.
    @pl.when(2 * SB * sb + 1 <= max_s)
    def _sweep():
        for m in range(SB):
            # odd step s = 2*SB*sb + 2m + 1: o_rel = m; (d1,d2) = (0,1)
            do_step(2 * m + 1, m, m, SB - m, 0, carry0_ref, carry1_ref)
            # even step: o_rel = m + 1; (d1, d2) = (1, 1)
            do_step(2 * m + 2, m + 1, m + 1, SB - m, 1, carry1_ref,
                    carry0_ref)

    @pl.when(sb == pl.num_programs(1) - 1)
    def _finish():
        bsc = bs_ref[:]
        m_ = jnp.max(bsc, axis=1)
        is_max = bsc == m_[:, None]
        stamp = jnp.min(jnp.where(is_max, bstamp_ref[:], STAMP_BIG),
                        axis=1)
        sel = bstamp_ref[:] == stamp[:, None]
        d_ = jnp.min(jnp.where(sel & is_max, bdp_ref[:], INF32), axis=1)
        s_win = stamp // W
        lane_win = stamp - s_win * W
        i_ = (s_win // 2 - W // 2) + lane_win
        j_ = s_win - i_
        found = m_ > NEG_INF32
        bi_ref[:, 0] = jnp.where(found, i_, 0)
        bj_ref[:, 0] = jnp.where(found, j_, 0)
        bd_ref[:, 0] = jnp.where(found, d_, 0)


def _bwd_kernel(mv_ref, bi_ref, bj_ref, out_ref, base_ref, st_ref, W,
                n_sb):
    BT = bi_ref.shape[0]
    g = pl.program_id(1)
    sb = n_sb - 1 - g
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)

    @pl.when(g == 0)
    def _init():
        i0 = bi_ref[:, 0]
        j0 = bj_ref[:, 0]
        st_ref[:, 0] = i0
        st_ref[:, 1] = j0
        st_ref[:, 2] = ((i0 == 0) & (j0 == 0)).astype(jnp.int32)

    i = st_ref[:, 0]
    j = st_ref[:, 1]
    done = st_ref[:, 2]
    # whole super-block inert when every live path is below it
    s_lo = 2 * SB * sb + 1
    any_here = jnp.max(jnp.where(done == 1, jnp.int32(0), i + j)) >= s_lo

    @pl.when(~any_here)
    def _skip():
        out_ref[0, :, :] = jnp.full((2 * SB, BT), 3, jnp.int8)
        base_ref[0, :, :] = jnp.full((2 * SB, BT), 4, jnp.int8)

    @pl.when(any_here)
    def _walk():
        ii = i
        jj = j
        dd = done
        for slot in range(2 * SB - 1, -1, -1):
            s = 2 * SB * sb + slot + 1
            # forward stores plane s at lanes i = o + l with the UNCLAMPED
            # window o = s//2 - W//2 (see _fwd_kernel o_base/o_rel)
            o = s // 2 - W // 2
            act = (ii + jj == s) & (dd == 0)
            plane = mv_ref[0, slot, :, :].astype(jnp.int32)   # [BT, W]
            lane = ii - o
            sel = (lanes1 == lane[:, None]) & act[:, None]
            pk = jnp.max(jnp.where(sel, plane, jnp.int32(0)), axis=1)
            m = pk & 3
            mv = jnp.where(act, m, jnp.int32(3))
            out_ref[0, slot, :] = mv.astype(jnp.int8)
            # q[i-1] travels in bits 2-4 of the trace plane; a consensus
            # tag column's base is it when the move consumes q
            # (diag/left), '-' (4) on deletions
            qc = pk >> 2
            base_ref[0, slot, :] = jnp.where(
                act & (m != 1), qc, jnp.int32(4)).astype(jnp.int8)
            di = ((mv == 0) | (mv == 2)).astype(jnp.int32)
            dj = ((mv == 0) | (mv == 1)).astype(jnp.int32)
            ii = ii - jnp.where(act, di, 0)
            jj = jj - jnp.where(act, dj, 0)
            dd = jnp.where((ii == 0) & (jj == 0), jnp.int32(1), dd)
        st_ref[:, 0] = ii
        st_ref[:, 1] = jj
        st_ref[:, 2] = dd


@functools.partial(jax.jit, static_argnames=("W", "end_bonus", "block_b",
                                              "interpret", "emit_base"))
def align_tb_batch_pallas(q, qlen, t, tlen, W=256, end_bonus=3,
                          block_b=256, interpret=False, emit_base=False):
    """Pallas version of ops.align_tb.align_tb_batch (int8 inputs).

    q: [B, L] int8 codes (pad 4); t: [B, L] int8 codes (pad 5).
    B a multiple of block_b; L a multiple of 2*SB.
    interpret=True runs both kernels in pallas interpret mode (CPU
    parity tests; mosaic is TPU-only).
    Returns (best_i, best_j, best_d, moves[S, B] int8 end->start order);
    with emit_base also the per-column q-base stream [S, B] int8 in
    START->END order (the consensus tag decode's gather-free input).
    """
    B, L = q.shape
    assert t.shape == (B, L)
    assert B % block_b == 0 and L % SB == 0
    n_sb = (L + SB - 1) // SB
    winw = W + 2 * SB

    left_q = W // 2 + 1
    need_q = SB * (n_sb - 1) + winw
    q_ext = jnp.pad(q.astype(jnp.int8), ((0, 0),
                    (left_q, max(0, need_q - (L + left_q)))),
                    constant_values=4)
    C = W // 2 + SB + 1
    rt = jnp.flip(t.astype(jnp.int8), axis=1)
    need_t = L + winw
    rt_ext = jnp.pad(rt, ((0, 0), (C, max(0, need_t - (L + C)))),
                     constant_values=5)

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
    nb = B // block_b
    qv = jnp.where(qlen2[:, 0] > 0, qlen2[:, 0], L).reshape(nb, block_b)
    tv = jnp.where(tlen2[:, 0] > 0, tlen2[:, 0], L).reshape(nb, block_b)
    # max_s uses RAW lengths (pad rows contribute 0): callers sort tasks
    # by qlen+tlen so trailing super-blocks die for whole tiles
    sv = (qlen2[:, 0] + tlen2[:, 0]).reshape(nb, block_b)
    minlen = jnp.stack([jnp.min(qv, axis=1), jnp.min(tv, axis=1),
                        jnp.max(sv, axis=1)],
                       axis=1).astype(jnp.int32)

    fkern = functools.partial(_fwd_kernel, W=W, end_bonus=end_bonus)
    out_shape = [jax.ShapeDtypeStruct((B, 1), jnp.int32)] * 3 + [
        jax.ShapeDtypeStruct((n_sb, 2 * SB, B, W), jnp.int8)]
    bi, bj, bd, planes = pl.pallas_call(
        fkern,
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
                                memory_space=pltpu.VMEM)] * 3 + [
            pl.BlockSpec((1, 2 * SB, block_b, W),
                         lambda b, sb: (sb, 0, b, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_b, W + 4), jnp.int32),
            pltpu.VMEM((block_b, W + 4), jnp.int32),
            pltpu.VMEM((block_b, W), jnp.int32),   # per-lane best score
            pltpu.VMEM((block_b, W), jnp.int32),   # per-lane stamp
            pltpu.VMEM((block_b, W), jnp.int32),   # per-lane distance
        ],
        interpret=interpret,
    )(qwin, twin, qlen2, tlen2, minlen)

    bkern = functools.partial(_bwd_kernel, W=W, n_sb=n_sb)
    sbspec = pl.BlockSpec((1, 2 * SB, block_b),
                          lambda b, g: (n_sb - 1 - g, 0, b),
                          memory_space=pltpu.VMEM)
    moves, bases = pl.pallas_call(
        bkern,
        grid=(nb, n_sb),
        in_specs=[
            pl.BlockSpec((1, 2 * SB, block_b, W),
                         lambda b, g: (n_sb - 1 - g, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda b, g: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda b, g: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[sbspec, sbspec],
        out_shape=[jax.ShapeDtypeStruct((n_sb, 2 * SB, B), jnp.int8),
                   jax.ShapeDtypeStruct((n_sb, 2 * SB, B), jnp.int8)],
        scratch_shapes=[pltpu.VMEM((block_b, 4), jnp.int32)],
        interpret=interpret,
    )(planes, bi[:, 0:1], bj[:, 0:1])

    # [n_sb, 2*SB, B] with s-1 = 2*SB*sb + slot ascending -> [S, B]
    # descending (end->start), packed 4-per-byte for the host transfer,
    # matching the XLA fallback's output contract
    from .align_tb import pack_moves
    moves_sb = moves.reshape(n_sb * 2 * SB, B)[::-1]
    if emit_base:
        # base stream in START->END order (the tag-decode's frame), one
        # int8 per alignment column; stays on device
        # (ops.cns_dp.accumulate_tags_planes)
        return (bi[:, 0], bj[:, 0], bd[:, 0], pack_moves(moves_sb),
                bases.reshape(n_sb * 2 * SB, B))
    return bi[:, 0], bj[:, 0], bd[:, 0], pack_moves(moves_sb)
