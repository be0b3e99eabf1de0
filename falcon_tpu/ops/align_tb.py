"""Batched banded alignment WITH traceback on device (JAX/XLA, TPU).

The consensus engine's alignment step: each support read must be aligned
to its seed over a pre-found range and the full alignment PATH recovered
(the reference does this on host, src/c/DW_banded.c:115 with get_aln_str=1,
called from falcon.c:626-628).  Device formulation:

  forward   anti-diagonal banded edit-distance DP (same recurrence as
            ops.align_device.extend_batch_device); every step additionally
            emits a [B, W] plane of 2-bit move codes (0=diag, 1=up/q-gap,
            2=left/t-gap) which lax.scan stacks into an HBM-resident
            [S, B, W] tensor -- the band makes trace memory O(S*W), not
            O(S^2)
  backward  a second scan walks the move planes from each pair's best
            boundary cell to (0, 0), synchronized across the batch on the
            global anti-diagonal index: a pair acts only on steps where its
            current cell lies on that anti-diagonal.  Lane selection is a
            one-hot dot over the band (TPUs do masked reductions well,
            gathers poorly).  Output is a [S, B] int8 move stream in
            end->start order; 3 = inactive step.

Only the tiny (ends, dist, move-stream) tensors leave the device; the
O(S*W) trace never does.  The move stream is packed 4-per-byte on device
(pack_moves) before the host transfer -- on a networked chip the transfer
is comparable to the DP itself, so this is a direct 4x on collect time.
Host post-processing unpacks (unpack_moves) and reconstructs gapped
alignment strings with cumsum indexing (see moves_to_alignment).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = np.int32(1 << 20)


def pack_moves(moves):
    """[S, B] int8 move codes (0..3) -> [ceil(S/4), B] uint8, four moves
    per byte, earliest stream index in the low bits (device-side jnp)."""
    S, B = moves.shape
    pad = (-S) % 4
    if pad:
        moves = jnp.pad(moves, ((0, pad), (0, 0)), constant_values=3)
    m = moves.astype(jnp.uint8).reshape(-1, 4, B)
    return m[:, 0] | (m[:, 1] << 2) | (m[:, 2] << 4) | (m[:, 3] << 6)


def unpack_moves(packed):
    """Host (numpy) inverse of pack_moves: [P, B] uint8 -> [4P, B] int8.
    Stream padding unpacks as 3 (inactive), which every consumer skips."""
    P, B = packed.shape
    m = np.empty((P * 4, B), np.int8)
    m[0::4] = packed & 3
    m[1::4] = (packed >> 2) & 3
    m[2::4] = (packed >> 4) & 3
    m[3::4] = (packed >> 6) & 3
    return m


@functools.partial(jax.jit, static_argnames=("W", "end_bonus"))
def align_tb_batch(q, qlen, t, tlen, W=256, end_bonus=3):
    """Banded edit-distance alignment + traceback for a batch of pairs.

    q: [B, L] int8/int32 codes (0..3, pad 4), qlen: [B] int32
    t: [B, L] int8/int32 codes (0..3, pad 5), tlen: [B] int32
    Returns (best_i, best_j, best_d, moves):
      best_i/j: the boundary cell (i == qlen or j == tlen) maximizing
                (i+j) - end_bonus*d; (0, 0) if none reachable in band
      best_d:   its edit distance
      moves:    [ceil(S/4), B] uint8 PACKED move stream (pack_moves) in
                END->START order (0=diag, 1=up consumes t[j-1] / gap in q,
                 2=left consumes q[i-1] / gap in t, 3=inactive step)
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    S_max = Lq + Lt

    qpad1 = jnp.pad(q.astype(jnp.int32), ((0, 0), (1, W + 2)),
                    constant_values=4)
    rt = jnp.flip(t.astype(jnp.int32), axis=1)
    rtpad = jnp.pad(rt, ((0, 0), (W + 2, W + 2)), constant_values=5)

    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]
    qlenc = qlen.astype(jnp.int32)[:, None]
    tlenc = tlen.astype(jnp.int32)[:, None]

    def off_of(s):
        return jnp.maximum(0, s // 2 - W // 2)

    def shift(prev, delta):
        p = jnp.pad(prev, ((0, 0), (2, 2)), constant_values=INF)
        return jax.lax.dynamic_slice(p, (0, delta + 2), (B, W))

    def fwd_body(carry, s):
        prev, prev2, best_score, best_i, best_j, best_d = carry
        o = off_of(s)
        d1 = o - off_of(s - 1)
        d2 = o - off_of(s - 2)

        i = o + lanes
        j = s - i

        up = shift(prev, d1)          # D[i, j-1]
        left = shift(prev, d1 - 1)    # D[i-1, j]
        diag = shift(prev2, d2 - 1)   # D[i-1, j-1]

        qc_im1 = jax.lax.dynamic_slice(qpad1, (0, o), (B, W))
        tc_jm1 = jax.lax.dynamic_slice(rtpad, (0, (W + 2) + Lt - s + o),
                                       (B, W))
        sub = jnp.where(qc_im1 == tc_jm1, 0, 1)

        v_diag = diag + sub
        v_up = up + 1
        v_left = left + 1
        cand = jnp.minimum(jnp.minimum(v_up, v_left), v_diag)
        # move: prefer diag, then up, then left (ties -> fewer gaps)
        mv = jnp.where(v_diag == cand, 0,
                       jnp.where(v_up == cand, 1, 2)).astype(jnp.int8)

        cand = jnp.where(i == 0, j, cand)
        cand = jnp.where(j == 0, i, cand)
        mv = jnp.where(i == 0, jnp.int8(1), mv)   # row 0: up chain
        mv = jnp.where(j == 0, jnp.int8(2), mv)   # col 0: left chain

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

        return (cur, prev, best_score, best_i, best_j, best_d), mv

    zeros = jnp.zeros((B,), dtype=jnp.int32)
    prev0 = jnp.full((B, W), INF, jnp.int32).at[:, 0].set(0)
    init = (prev0,
            jnp.full((B, W), INF, jnp.int32),
            jnp.full((B,), -INF, jnp.int32), zeros, zeros, zeros)
    ss = jnp.arange(1, S_max + 1, dtype=jnp.int32)
    (_, _, bs, bi, bj, bd), move_planes = jax.lax.scan(fwd_body, init, ss)
    found = bs > -INF
    bi = jnp.where(found, bi, 0)
    bj = jnp.where(found, bj, 0)
    bd = jnp.where(found, bd, 0)

    # ---- backward: walk the move planes end -> (0, 0) ----------------
    # move_planes[s-1] is the plane of anti-diagonal s.
    def bwd_body(carry, s):
        i, j, done = carry
        cs = i + j
        act = (cs == s) & ~done
        plane = jax.lax.dynamic_slice(
            move_planes, (s - 1, 0, 0), (1, B, W))[0]      # [B, W]
        o = off_of(s)
        lane = i - o
        onehot = (lanes == lane[:, None])
        m = jnp.max(jnp.where(onehot, plane.astype(jnp.int32), 0), axis=1)
        m = jnp.where(act, m, 3)
        di = jnp.where(m == 0, 1, jnp.where(m == 2, 1, 0))
        dj = jnp.where(m == 0, 1, jnp.where(m == 1, 1, 0))
        i = i - jnp.where(act, di, 0)
        j = j - jnp.where(act, dj, 0)
        done = done | ((i == 0) & (j == 0))
        return (i, j, done), m.astype(jnp.int8)

    init_b = (bi, bj, (bi == 0) & (bj == 0))
    ss_down = jnp.arange(S_max, 0, -1, dtype=jnp.int32)
    _, moves = jax.lax.scan(bwd_body, init_b, ss_down)
    return bi, bj, bd, pack_moves(moves)


def moves_to_alignment(q_codes, t_codes, move_stream):
    """Host reconstruction of one pair's gapped alignment strings.

    q_codes/t_codes: uint8 base codes (0..3) of the aligned ranges.
    move_stream: int8 array in END->START order with 3 = inactive
    (one pair's column of align_tb_batch's `moves`).
    Returns (q_aln, t_aln) ASCII bytes ('ACGT-'), or (b"", b"") if empty.
    """
    m = move_stream[move_stream != 3][::-1]          # start -> end
    if len(m) == 0:
        return b"", b""
    A = np.frombuffer(b"ACGT", dtype=np.uint8)
    gap = np.uint8(ord("-"))
    qi = np.cumsum(m != 1) - 1                        # q index per column
    tj = np.cumsum(m != 2) - 1
    qa = np.where(m == 1, gap, A[np.minimum(q_codes[np.maximum(qi, 0)], 3)])
    ta = np.where(m == 2, gap, A[np.minimum(t_codes[np.maximum(tj, 0)], 3)])
    return qa.astype(np.uint8).tobytes(), ta.astype(np.uint8).tobytes()
