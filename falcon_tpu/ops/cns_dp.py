"""Device-side consensus MSA + best-path DP (JAX/XLA, TPU).

This moves the falcon_sense hot loop -- align-tag accumulation, forward
scoring, backtrack (reference: src/c/falcon.c:308-558) -- onto the chip.
The host kernel (ops.consensus_dp / native C++) remains the bit-exact
reference; this path is the throughput engine, quality-validated by
consensus-identity and downstream contig tests (like the device aligner,
see cns.device's rationale).

Formulation
-----------
Tags (t_pos, delta, q_base, pred) are never materialized as a list: they
are computed DENSELY from each alignment's move stream (ops.align_tb
packed moves) with cumsums, then scatter-added into per-group MSA count
tensors:

  L0[g, t, b, pc]        delta==0 columns; pc in [0,16) encodes the
                         predecessor (pred_delta_class in {0,1,>=2} x
                         pred_base in [0,5)), 15 = path start
  Ld[g, t, d-1, b, pb]   delta==d>=1 columns; pred is exactly
                         (t, d-1, pb), pb in [0,5), 5 = path start

coverage[g, t] = sum over L0[g, t] (every delta-0 tag counts coverage,
falcon.c update/coverage semantics).

The forward DP (score = pred_score + link_count - 0.5*coverage,
falcon.c:441-444) runs as ONE lax.scan over t for a whole batch of G
groups: per step the delta-0 transition takes a max over the 16 pred
classes, then the within-t delta chain unrolls D-1 small [G,5,6]
max-reduce steps.  Every column's best predecessor is emitted as a uint8
code; the backtrack is a second (reverse) scan that walks those codes and
emits base codes, so only the final [T, G, D] emission plane crosses to
the host.

Approximations vs the bit-exact host kernel (documented, tested):
  * delta-0 links with pred_delta >= 2 are aggregated per (pred_base)
    class; scoring uses max over the class (the reference keeps one link
    per exact pred_delta).  Mixed-delta predecessors are rare (<<1% of
    columns at PacBio error rates).
  * tie-breaks among a column's links follow pred-code order, not link
    insertion order.
  * delta (insertion offset) is capped at D-1 (default 13) instead of
    255; a tag stream truncates at the cap exactly like the reference
    truncates at 255 (falcon.c get_align_tags break).
  * the reference's first emitted backtrack base is the best column's
    link INDEX used as a base code (a quirk, see ops.consensus_dp); here
    it is the best column's own base.  Affects only the final character.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

D_DEFAULT = 14   # delta capacity (max insertion offset + 1)
NPC0 = 16        # delta-0 pred classes: 3 delta classes x 5 bases + start
NPCD = 6         # delta-d pred classes: 5 bases + start
NOEMIT = 15
# scan/backtrack step bodies are tiny ([G, D*5]-sized ops); unrolling
# amortizes the per-step loop overhead of the T-long lax.scans (the
# residual DP-vs-hostmsa gap named in BASELINE.md round-4 notes).
# Math-identical at any value; env-tunable for profiling.
import os as _os
_SCAN_UNROLL = int(_os.environ.get("FTPU_CNS_UNROLL", "4"))


def l0_size(G, T):
    return G * T * 5 * NPC0


def ld_size(G, T, D):
    return G * T * (D - 1) * 5 * NPCD


def msa_size(G, T, D):
    """[L0 region | Ld region | 1 dump slot for masked-out tags]."""
    return l0_size(G, T) + ld_size(G, T, D) + 1


def alloc_msa(G, T, D):
    """Fresh combined count buffer for one DP batch (see msa_size)."""
    return jnp.zeros(msa_size(G, T, D), jnp.uint16)


def _msa_views(msa, G, T, D):
    """(L0 [G, T, 5*NPC0], Ld [G, T, (D-1)*5*NPCD]) views."""
    L0SZ = l0_size(G, T)
    return (msa[:L0SZ].reshape(G, T, 5 * NPC0),
            msa[L0SZ:L0SZ + ld_size(G, T, D)].reshape(
                G, T, (D - 1) * 5 * NPCD))


@functools.partial(jax.jit, static_argnames=("T", "D"),
                   donate_argnums=(0,))
def accumulate_tags(msa, mvp, q, bd, gidx, s2, max_diff, T, D):
    """Scatter one align batch's tags into the combined MSA count buffer.

    msa:  flat uint16 buffer from alloc_msa (combined L0|Ld|dump layout:
          ONE scatter per batch instead of two -- the scatter's cost is
          ~linear in issued updates, so merging the delta-0 and
          insertion scatters halves the accumulate stage, profiled
          round 4)
    mvp:  [P, B] uint8 packed move stream (align_tb, end->start order)
    q:    [B, Lq] int8 support-slice codes (pad 4)
    bd:   [B] int32 edit distance (the keep gate: ncols>500 and
          dist/ncols < max_diff, reference falcon.c:629)
    gidx: [B] int32 group row of this DP batch (-1 = dead/pad task)
    s2:   [B] int32 seed-range start (t offset of the alignment)

    The tag decode + gating lives in _column_tags (shared with
    accumulate_tags_mm so both paths gate identically by construction);
    key/cls encode exactly the flat MSA indices:
      delta-0 column:  (gidx*T + tpos) * 5*NPC0 + cls
      insertion col:   L0SZ + ((gidx*T + tpos)*(D-1) + delta-1)*5*NPCD
                              + cls
    """
    G = _g_of(msa.shape[0], T, D)
    L0SZ = l0_size(G, T)
    key, cls, adv = _column_tags(mvp, q, bd, gidx, s2, max_diff, T, D)
    live = key >= 0
    tpos = key // D            # garbage on dead lanes; masked below
    delta = key - tpos * D
    gT = gidx[:, None].astype(jnp.int32) * T + jnp.clip(tpos, 0, T - 1)

    idx0 = gT * (5 * NPC0) + cls
    idxd = L0SZ + (gT * (D - 1) + jnp.clip(delta - 1, 0, D - 2)) \
        * (5 * NPCD) + cls
    idx = jnp.where(live & adv, idx0,
                    jnp.where(live, idxd, msa.shape[0] - 1))
    return msa.at[idx.reshape(-1)].add(1)


def _g_of(msa_len, T, D):
    """Recover G from the combined buffer length (T, D static)."""
    per_g = T * 5 * NPC0 + T * (D - 1) * 5 * NPCD
    return (msa_len - 1) // per_g


def _column_tags_planes(mvp, basep, bd, gidx, s2, max_diff, T, D):
    """Gather-free _column_tags: per-column q-bases come from the
    traceback kernel's base stream instead of a q gather, and the
    predecessor class from a cummax latch instead of two more gathers.

    The three take_along_axis gathers were ~100ms of the 106ms decode at
    production shapes (round-4 microbenchmark, ~18ns per gathered
    element on TPU); everything left is elementwise + log-step cumsums.

    mvp:   [P, B] uint8 packed move stream (end->start order)
    basep: [S, B] int8 q-base per column in START->END order
           (align_tb_batch_pallas emit_base: q[i-1] where the move
           consumes q, else 4)
    Returns (key, cls, adv) with identical semantics to _column_tags.
    """
    P, B = mvp.shape
    S = P * 4
    m = jnp.stack([mvp & 3, (mvp >> 2) & 3, (mvp >> 4) & 3,
                   (mvp >> 6) & 3], axis=1)
    ms = jnp.flip(m.reshape(S, B), axis=0).T.astype(jnp.int32)  # [B, S]
    valid = ms != 3
    consq = (ms == 0) | (ms == 2)
    adv = (ms == 0) | (ms == 1)

    ncols = valid.sum(axis=1).astype(jnp.int32)
    keep = (ncols > 500) & (bd.astype(jnp.float32) <
                            max_diff * ncols.astype(jnp.float32))
    keep = keep & (gidx >= 0)

    base = basep.T.astype(jnp.int32)                            # [B, S]

    cq = jnp.cumsum(consq.astype(jnp.int32), axis=1)
    advcum = jnp.cumsum(adv.astype(jnp.int32), axis=1)
    tpos = s2[:, None] - 1 + advcum
    cq_at_adv = jax.lax.cummax(jnp.where(adv, cq, 0), axis=1)
    delta = jnp.where(adv, 0, cq - cq_at_adv)

    bad = valid & ((delta >= D) | (tpos < 0))
    ok = valid & (jnp.cumsum(bad.astype(jnp.int32), axis=1) == 0) & \
        keep[:, None]

    # predecessor latch: enc packs (s, delta, base) of each kept column;
    # cummax + shift yields the previous kept column's fields without a
    # gather (s strictly increasing makes cummax = last-kept)
    ar = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    enc = jnp.where(ok, (ar << 7) | (delta << 3) | base, -1)
    lat = jax.lax.cummax(enc, axis=1)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), lat[:, :-1]], axis=1)
    p_exists = prev >= 0
    p_base = prev & 7
    p_delta = (prev >> 3) & 15

    pc0 = jnp.where(p_exists, jnp.minimum(p_delta, 2) * 5 + p_base,
                    NPC0 - 1)
    pcd = jnp.where(p_exists, p_base, NPCD - 1)
    cls = jnp.where(adv, base * NPC0 + pc0, base * NPCD + pcd)
    in_t = (tpos >= 0) & (tpos < T)
    key = jnp.where(ok & in_t, tpos * D + delta, -1)
    return key, cls, adv


@functools.partial(jax.jit, static_argnames=("T", "D"),
                   donate_argnums=(0,))
def accumulate_tags_planes(msa, mvp, basep, bd, gidx, s2, max_diff, T, D):
    """accumulate_tags with the gather-free decode (_column_tags_planes);
    requires the traceback kernel's base stream.  Bit-identical counts
    to accumulate_tags (tests/test_cns_dp.py::test_planes_parity)."""
    G = _g_of(msa.shape[0], T, D)
    L0SZ = l0_size(G, T)
    key, cls, adv = _column_tags_planes(mvp, basep, bd, gidx, s2,
                                        max_diff, T, D)
    live = key >= 0
    tpos = key // D
    delta = key - tpos * D
    gT = gidx[:, None].astype(jnp.int32) * T + jnp.clip(tpos, 0, T - 1)
    idx0 = gT * (5 * NPC0) + cls
    idxd = L0SZ + (gT * (D - 1) + jnp.clip(delta - 1, 0, D - 2)) \
        * (5 * NPCD) + cls
    idx = jnp.where(live & adv, idx0,
                    jnp.where(live, idxd, msa.shape[0] - 1))
    return msa.at[idx.reshape(-1)].add(1)


def _column_tags(mvp, q, bd, gidx, s2, max_diff, T, D):
    """Shared per-column tag decode: move stream -> (key, cls, adv)
    [B, S] arrays.

    key = tpos*D + delta for kept in-range tags, -1 otherwise (folds the
    ok/keep/in_t gates into one comparable).  cls = the MSA class code:
    base*NPC0+pred0 (0..79) at delta-0 columns, base*NPCD+predd (0..29)
    at insertion columns.  adv = the column advances t (delta == 0)."""
    P, B = mvp.shape
    S = P * 4
    m = jnp.stack([mvp & 3, (mvp >> 2) & 3, (mvp >> 4) & 3,
                   (mvp >> 6) & 3], axis=1)
    ms = jnp.flip(m.reshape(S, B), axis=0).T.astype(jnp.int32)  # [B, S]
    valid = ms != 3
    consq = (ms == 0) | (ms == 2)
    adv = (ms == 0) | (ms == 1)

    ncols = valid.sum(axis=1).astype(jnp.int32)
    keep = (ncols > 500) & (bd.astype(jnp.float32) <
                            max_diff * ncols.astype(jnp.float32))
    keep = keep & (gidx >= 0)

    cq = jnp.cumsum(consq.astype(jnp.int32), axis=1)
    qi = jnp.clip(cq - 1, 0, q.shape[1] - 1)
    qb = jnp.take_along_axis(q.astype(jnp.int32), qi, axis=1)
    base = jnp.where(consq, jnp.minimum(qb, 4), 4)

    advcum = jnp.cumsum(adv.astype(jnp.int32), axis=1)
    tpos = s2[:, None] - 1 + advcum
    cq_at_adv = jax.lax.cummax(jnp.where(adv, cq, 0), axis=1)
    delta = jnp.where(adv, 0, cq - cq_at_adv)

    bad = valid & ((delta >= D) | (tpos < 0))
    ok = valid & (jnp.cumsum(bad.astype(jnp.int32), axis=1) == 0) & \
        keep[:, None]

    ar = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    pv = jax.lax.cummax(jnp.where(ok, ar, -1), axis=1)
    pidx = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), pv[:, :-1]], axis=1)
    p_exists = pidx >= 0
    pcl = jnp.clip(pidx, 0, S - 1)
    p_base = jnp.minimum(jnp.take_along_axis(base, pcl, axis=1), 4)
    p_delta = jnp.take_along_axis(delta, pcl, axis=1)

    pc0 = jnp.where(p_exists, jnp.minimum(p_delta, 2) * 5 + p_base,
                    NPC0 - 1)
    pcd = jnp.where(p_exists, p_base, NPCD - 1)
    cls = jnp.where(adv, base * NPC0 + pc0, base * NPCD + pcd)
    in_t = (tpos >= 0) & (tpos < T)
    key = jnp.where(ok & in_t, tpos * D + delta, -1)
    return key, cls, adv


_T_CHUNK = 2048   # t-tile for the one-hot planes (bounds live HBM)


@functools.partial(jax.jit, static_argnames=("T", "D", "G"),
                   donate_argnums=(0,))
def accumulate_tags_mm(msa, mvp, q, bd, gidx, s2, max_diff,
                       T, D, G):
    """accumulate_tags without the scatter: gather-inversion + one-hot
    matmuls (MXU path).

    Historical motivation: round-3 notes inferred the XLA scatter-add in
    accumulate_tags serialized at ~1us/update; the direct microbenchmark
    (BASELINE.md round-3 addendum) DISPROVED that -- the scatter runs at
    ~44ns/column-slot (89ms/batch at production shapes) and this matmul
    variant loses ~10x to it on HBM traffic for its one-hot planes.  It
    stays available (FTPU_CNS_MM=1) as the MXU formulation and a parity
    cross-check.  It produces identical counts by inverting the map:
    each tag column's
    key = tpos*D + delta is STRICTLY increasing over kept tag columns
    (tpos is nondecreasing; within a t, delta-0 precedes delta 1,2,..),
    so for each (read, t) a binary search on cummax(key) locates the
    delta-0 column; a read's delta-d insertion columns sit contiguously
    right after it in the move stream (left-moves consume one
    anti-diagonal each -- no interleaved inactive steps, unlike diag
    moves).  Counts then become
        L[g, t, c] = sum_b M[g, b] * onehot(cls[b, t, d] == c)
    -- int8 one-hot x group-membership matmuls that ride the MXU
    instead of the scatter unit.  Bit-identical to accumulate_tags
    (tests/test_cns_dp.py::test_accumulate_tags_mm_parity)."""
    S = mvp.shape[0] * 4
    B = mvp.shape[1]
    key, cls, _adv = _column_tags(mvp, q, bd, gidx, s2, max_diff, T, D)
    M = (gidx[None, :] ==
         jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)).astype(jnp.int8)

    L0, Ld = _msa_views(msa, G, T, D)

    keymono = jax.lax.cummax(key, axis=1)       # nondecreasing [B, S]
    nbits = max(1, (S + 1).bit_length())
    cls8 = cls.astype(jnp.int16)
    l0_chunks = []
    ld_chunks = []
    for t0 in range(0, T, min(_T_CHUNK, T)):
        Tc = min(_T_CHUNK, T - t0)   # clamp the last (ragged) chunk
        # binary search: lo[b, t] = first s with keymono[b, s] >= t*D
        want0 = (jnp.arange(t0, t0 + Tc, dtype=jnp.int32) * D)[None, :]
        lo = jnp.zeros((B, Tc), jnp.int32)
        hi = jnp.full((B, Tc), S, jnp.int32)
        for _ in range(nbits):
            mid = (lo + hi) >> 1
            v = jnp.take_along_axis(keymono, jnp.clip(mid, 0, S - 1),
                                    axis=1)
            less = v < want0
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        # lo is the delta-0 column for t when one exists; when t has
        # only insertions (a leading-insertion run: no adv column), lo
        # lands on the delta-1 column, so step back one to keep
        # pos = s_adv + d aligned
        k0 = jnp.take_along_axis(key, jnp.clip(lo, 0, S - 1), axis=1)
        s_adv = jnp.where(k0 == want0, lo, lo - 1)
        pos = s_adv[:, :, None] + jnp.arange(D, dtype=jnp.int32)
        posc = jnp.clip(pos, 0, S - 1).reshape(B, Tc * D)
        gkey = jnp.take_along_axis(key, posc, axis=1).reshape(B, Tc, D)
        gcls = jnp.take_along_axis(cls8, posc.astype(jnp.int32),
                                   axis=1).reshape(B, Tc, D)
        want = (want0[0][None, :, None]
                + jnp.arange(D, dtype=jnp.int32)[None, None, :])
        hit = gkey == want
        # d = 0 plane: classes 0..79
        oh0 = ((gcls[:, :, 0, None] ==
                jax.lax.broadcasted_iota(jnp.int16, (1, 1, 5 * NPC0), 2))
               & hit[:, :, 0, None]).astype(jnp.int8)
        add0 = jax.lax.dot_general(
            M, oh0.reshape(B, Tc * 5 * NPC0),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        l0_chunks.append(add0.reshape(G, Tc, 5 * NPC0))
        # d >= 1 planes: classes 0..29 each
        ohd = ((gcls[:, :, 1:, None] ==
                jax.lax.broadcasted_iota(jnp.int16, (1, 1, 1, 5 * NPCD),
                                         3))
               & hit[:, :, 1:, None]).astype(jnp.int8)
        addd = jax.lax.dot_general(
            M, ohd.reshape(B, Tc * (D - 1) * 5 * NPCD),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        ld_chunks.append(addd.reshape(G, Tc, (D - 1) * 5 * NPCD))
    L0 = L0 + jnp.concatenate(l0_chunks, axis=1).astype(jnp.uint16)
    Ld = Ld + jnp.concatenate(ld_chunks, axis=1).astype(jnp.uint16)
    return jnp.concatenate([L0.reshape(-1), Ld.reshape(-1), msa[-1:]])


@functools.partial(jax.jit, static_argnames=("T",), donate_argnums=(0,))
def add_self_tags(msa, seeds, tlens, T):
    """The seed's identity alignment as delta-0 tags (dense one-hot add
    into the combined buffer's L0 region; cns.device includes the seed
    itself as a support)."""
    G = seeds.shape[0]
    L0SZ = G * T * 5 * NPC0
    c = jnp.minimum(seeds.astype(jnp.int32), 4)
    prev = jnp.concatenate(
        [jnp.zeros((G, 1), jnp.int32), c[:, :-1]], axis=1)
    t_ar = jax.lax.broadcasted_iota(jnp.int32, (G, T), 1)
    pc = jnp.where(t_ar == 0, NPC0 - 1, prev)    # pred class 0*5+prev
    code = c * NPC0 + pc
    valid = t_ar < tlens[:, None]
    oh = (code[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, 5 * NPC0), 2))
    upd = (oh & valid[:, :, None]).astype(jnp.uint16)
    return msa.at[:L0SZ].add(upd.reshape(-1))


def _delta_chain_prefix(S0, ld, half_cov, G, D):
    """Within-t insertion chain as a log-step max-plus prefix scan.

    The sequential recurrence S_d = f_d(S_{d-1}) with
      f_d(x)[b] = exists_d[b] ? max(max_pb(x[pb] + M_d[b,pb]),
                                    c_d[b]) : -1.0
    is affine in (max, +): folding the per-level -half_cov into M/c and
    encoding the no-link rows as the constant map (M = NEG, c = -1.0)
    makes every f_d representable as (M, c), and composition
      (f âˆ˜ g) = (M_f âŠ— M_g, max(M_f âŠ— c_g, c_f))
    associative.  A Hillis-Steele scan over the D-1 levels yields all
    prefixes F_d = f_d âˆ˜ ... âˆ˜ f_1 in ceil(log2(D-1)) rounds; S_d =
    F_d(S0).  Best-pred codes are recovered afterwards with ONE batched
    argmax per step, using cand arrays built exactly like the
    sequential path's (same values, same tie order).

    Exactness: counts are uint16, half_cov a multiple of 0.5 < 2^22,
    path sums stay far below 2^23, so float32 adds are exact in any
    association; NEG-contaminated entries stay near -1e9, 4 orders
    below any reachable score.

    S0: [G, 5], ld: [G, D-1, 5, NPCD] float32 counts, half_cov: [G].
    Returns (S_t [G, D, 5], codes_d [G, D-1, 5] int32).
    """
    NEG = jnp.float32(-1e9)
    h = half_cov[:, None, None]
    pres = ld > 0                                     # [G, D-1, 5, 6]
    exists = jnp.any(pres, axis=3)                    # [G, D-1, 5]
    M = jnp.where(pres[..., :5], ld[..., :5] - h[..., None], NEG)
    c = jnp.where(pres[..., 5], ld[..., 5] - h, NEG)
    M = jnp.where(exists[..., None], M, NEG)
    c = jnp.where(exists, c, jnp.float32(-1.0))

    # identity map for the shifted-in prefix slots
    eye = jnp.where(jnp.eye(5, dtype=bool), jnp.float32(0), NEG)

    def shift(a, s, fill):
        pad = jnp.broadcast_to(fill, a[:, :s].shape)
        return jnp.concatenate([pad, a[:, :-s]], axis=1)

    s = 1
    while s < D - 1:
        Mp = shift(M, s, eye)
        cp = shift(c, s, NEG)
        # F_d ∘ F_{d-s}: M' = M ⊗ Mp, c' = max(M ⊗ cp, c)
        Mn = jnp.max(M[:, :, :, :, None] + Mp[:, :, None, :, :], axis=3)
        cn = jnp.maximum(jnp.max(M + cp[:, :, None, :], axis=3), c)
        M, c = Mn, cn
        s *= 2

    # S_d = F_d(S0) = max(max_pb(M[d] + S0[pb]), c[d])
    Sd = jnp.maximum(
        jnp.max(M + S0[:, None, None, :], axis=3), c)     # [G, D-1, 5]
    S_t = jnp.concatenate([S0[:, None, :], Sd], axis=1)   # [G, D, 5]

    # codes: one batched argmax with the sequential path's exact cands
    qv = jnp.concatenate(
        [S_t[:, :-1, :],
         jnp.zeros((G, D - 1, 1), jnp.float32)], axis=2)  # [G, D-1, 6]
    cand = jnp.where(pres, qv[:, :, None, :] + ld, NEG)
    arg = jnp.argmax(cand, axis=3).astype(jnp.int32)      # [G, D-1, 5]
    codes_d = jnp.where((arg == NPCD - 1) | ~exists, 255, 128 + arg)
    return S_t, codes_d


@functools.partial(jax.jit, static_argnames=("G", "T", "D", "prefix"))
def consensus_scan(msa, G, T, D, prefix=False):
    """Forward DP over t (falcon.c:405-477 as one scan for G groups).

    Returns (bp [T, G, D*5] uint8 best-pred codes, cov [G, T] int32,
    gb_score, gb_t, gb_d, gb_b [G]).

    Pred codes: <128 = jump to (t-1, code//5, code%5); 128..249 = stay at
    (t, d-1, code-128); 254/255 = path start (stop).

    prefix=True replaces the sequential within-t delta chain (D-1
    dependent [G,5,6] mini-ops per scan step -- the "tiny-op" residual
    named in BASELINE.md round 4) with a log-step affine max-plus prefix
    composition: each level d is the map f_d(x) = max(M_d x, c_d) in
    (max, +) algebra (M_d = link counts - half_cov, NEG-masked; rows
    with no links compose as the constant map -1.0), and a Hillis-
    Steele scan over d composes all prefixes in ceil(log2(D-1)) rounds
    of [G, D-1, 5, 5] map products.  Best-pred codes then come from ONE
    batched argmax over all levels.  Bit-identical to the sequential
    chain: every score is a multiple of 0.5 with |.| << 2^23, so float32
    addition is exact in any association (tests/test_cns_dp.py::
    test_consensus_scan_prefix_parity).
    """
    # TPU layout note: keep the big [*, T, *] tensors 3-D with a LARGE
    # trailing dim.  A [G,T,D-1,5,6] materialization tiles its minor
    # (5,6) dims to (8,128) on TPU -- a 34x HBM blowup (21.6GB at
    # G=99,T=8192,D=14).  Flat [.., 390]/[.., 80] trailing dims pad to
    # 512/128 only; the per-step [G, k] slices inside the scan are tiny
    # and safe to reshape.
    L0, Ld = _msa_views(msa, G, T, D)
    cov = L0.astype(jnp.int32).sum(axis=2)
    L0t = jnp.moveaxis(L0, 1, 0)
    Ldt = jnp.moveaxis(Ld, 1, 0)
    covt = cov.T
    NEG = jnp.float32(-1e9)

    def step(carry, xs):
        S_prev, gb_s, gb_t, gb_d, gb_b, t_idx = carry
        l0u, ldu, cv = xs
        l0 = l0u.astype(jnp.float32).reshape(G, 5, NPC0)
        ld = ldu.astype(jnp.float32).reshape(G, D - 1, 5, NPCD)
        half_cov = 0.5 * cv.astype(jnp.float32)
        s2p = jnp.max(S_prev[:, 2:, :], axis=1)
        a2 = jnp.argmax(S_prev[:, 2:, :], axis=1).astype(jnp.int32) + 2
        P = jnp.concatenate(
            [S_prev[:, 0, :], S_prev[:, 1, :], s2p,
             jnp.zeros((G, 1), jnp.float32)], axis=1)       # [G, 16]
        cand0 = jnp.where(l0 > 0, P[:, None, :] + l0, NEG)
        best0 = jnp.max(cand0, axis=2)
        arg0 = jnp.argmax(cand0, axis=2).astype(jnp.int32)  # [G, 5]
        exists0 = jnp.any(l0 > 0, axis=2)
        S0 = jnp.where(exists0, best0 - half_cov[:, None],
                       jnp.float32(-1.0))
        pb0 = arg0 % 5
        cls0 = arg0 // 5
        pd0 = jnp.where(cls0 == 0, 0,
                        jnp.where(cls0 == 1, 1,
                                  jnp.take_along_axis(a2, pb0, axis=1)))
        code0 = jnp.where((arg0 == NPC0 - 1) | ~exists0, 254,
                          pd0 * 5 + pb0)
        if not prefix:
            S_list = [S0]
            code_list = [code0]
            for d in range(1, D):
                qv = jnp.concatenate(
                    [S_list[d - 1], jnp.zeros((G, 1), jnp.float32)],
                    axis=1)
                ldd = ld[:, d - 1]                           # [G, 5, 6]
                cand = jnp.where(ldd > 0, qv[:, None, :] + ldd, NEG)
                best = jnp.max(cand, axis=2)
                arg = jnp.argmax(cand, axis=2).astype(jnp.int32)
                exists = jnp.any(ldd > 0, axis=2)
                Sd = jnp.where(exists, best - half_cov[:, None],
                               jnp.float32(-1.0))
                code = jnp.where((arg == NPCD - 1) | ~exists, 255,
                                 128 + arg)
                S_list.append(Sd)
                code_list.append(code)
            S_t = jnp.stack(S_list, axis=1)                  # [G, D, 5]
            codes_all = jnp.stack(code_list, axis=1)
        else:
            S_t, codes_d = _delta_chain_prefix(S0, ld, half_cov, G, D)
            codes_all = jnp.concatenate([code0[:, None, :], codes_d],
                                        axis=1)
        # emit the pred plane flat [G, D*5]: a [T,G,D,5] stack would
        # tile-pad (D,5)->(16,128) on TPU (1.66GB of uint8 at T=8192)
        codes = codes_all.astype(jnp.uint8).reshape(G, D * 5)
        flat = S_t.reshape(G, D * 5)
        mbest = jnp.max(flat, axis=1)
        am = jnp.argmax(flat, axis=1).astype(jnp.int32)
        upd = mbest > gb_s                 # strict: earlier t wins ties
        gb_s = jnp.where(upd, mbest, gb_s)
        gb_t = jnp.where(upd, t_idx, gb_t)
        gb_d = jnp.where(upd, am // 5, gb_d)
        gb_b = jnp.where(upd, am % 5, gb_b)
        return (S_t, gb_s, gb_t, gb_d, gb_b, t_idx + 1), codes

    init = (jnp.full((G, D, 5), -1.0, jnp.float32),
            jnp.full((G,), -1.0, jnp.float32),
            jnp.zeros((G,), jnp.int32), jnp.zeros((G,), jnp.int32),
            jnp.zeros((G,), jnp.int32), jnp.int32(0))
    (S_last, gb_s, gb_t, gb_d, gb_b, _), bp = jax.lax.scan(
        step, init, (L0t, Ldt, covt), unroll=_SCAN_UNROLL)
    return bp, cov, gb_s, gb_t, gb_d, gb_b


@functools.partial(jax.jit, static_argnames=("G", "T", "D"))
def backtrack(bp, cov, gb_s, gb_t, gb_d, gb_b, min_cov, G, T, D):
    """Walk best-pred codes end -> start (falcon.c:493-540 semantics).

    Emits per (t, visit-slot) a 4-bit code: base 0..3 (+5 if lowercase,
    coverage <= min_cov), NOEMIT=15 = nothing.  Host assembly reverses
    the stream (assemble_consensus).
    """
    covt = cov.T
    iota_db = jax.lax.broadcasted_iota(jnp.int32, (G, D * 5), 1)

    def step(carry, xs):
        t_cur, d_cur, b_cur, ck, done, n_emit = carry
        bpt, cvt, t = xs
        emits = []
        bpt_i = bpt.astype(jnp.int32)         # [G, D*5]
        lower = cvt <= min_cov
        for _ in range(D):
            act = (~done) & (t_cur == t)
            oh = iota_db == (d_cur * 5 + b_cur)[:, None]
            code = jnp.max(jnp.where(oh, bpt_i, 0), axis=1)
            is_start = code >= 250
            can = act & ~is_start
            # the start column emits nothing: the reference's backtrack
            # drops the path's first base too (falcon.c:493-540 emits via
            # the predecessor walk; verified vs ops.consensus_dp -- an
            # identical-support group yields seed[1:])
            ev = jnp.where(can & (ck != 4) & (n_emit < 2 * T),
                           (ck + 5 * lower).astype(jnp.uint8),
                           jnp.uint8(NOEMIT))
            n_emit = n_emit + (ev != NOEMIT).astype(jnp.int32)
            emits.append(ev)
            jump = can & (code < 128)
            stay = can & (code >= 128)
            step_b = jnp.where(jump, code % 5,
                               jnp.where(stay, code - 128, b_cur))
            d_cur = jnp.where(jump, code // 5,
                              jnp.where(stay, d_cur - 1, d_cur))
            b_cur = step_b
            ck = jnp.where(jump | stay, step_b, ck)
            t_cur = jnp.where(jump, t_cur - 1, t_cur)
            done = done | (act & is_start) | (n_emit >= 2 * T)
        return (t_cur, d_cur, b_cur, ck, done, n_emit), \
            jnp.stack(emits, axis=1)

    init = (gb_t, gb_d, gb_b, gb_b, gb_s == -1.0,
            jnp.zeros((G,), jnp.int32))
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    _, emit = jax.lax.scan(step, init,
                           (jnp.flip(bp, axis=0), jnp.flip(covt, axis=0),
                            ts), unroll=_SCAN_UNROLL)
    return emit     # [T, G, D] uint8


@functools.partial(jax.jit,
                   static_argnames=("min_cov", "G", "T", "D", "cap"))
def backtrack_walk(bp, cov, gb_s, gb_t, gb_d, gb_b, min_cov, G, T, D,
                   cap):
    """Path-walk backtrack: one scan step per path position instead of
    the [T, G, D] plane sweep (backtrack) + compact_emit search.

    The plane formulation executes T scan steps x D unrolled inner
    iterations (most inactive: each group visits a t once) and then a
    17-round binary search to compact ~T emissions out of T*D slots.
    This walk executes `cap` steps, each performing exactly one path
    move for every group (two [G] gathers from bp/cov + a handful of
    [G] selects), and writes the emission stream densely: no
    compaction, ~D x fewer scan-body operations, and the same D2H
    volume packed 2 codes/byte.

    Emits the identical code sequence as backtrack+compact_emit
    (tests/test_cns_dp.py::test_backtrack_walk_parity): per step the
    4-bit code of the column left behind (NOEMIT for dash-suppressed or
    inactive steps).

    Returns (packed [G, cap//2] uint8 two-codes-per-byte in step order,
    done [G] bool -- False means the walk hit `cap` before the path
    start and the caller must fall back to the plane path for that
    group).
    """
    bpf = bp.reshape(T * G * D * 5).astype(jnp.int32)
    covf = cov.reshape(G * T)
    g_ar = jnp.arange(G, dtype=jnp.int32)

    def step(carry, _):
        t_cur, d_cur, b_cur, ck, done, n_emit = carry
        tc = jnp.clip(t_cur, 0, T - 1)
        code = jnp.take(bpf, (tc * G + g_ar) * (D * 5) + d_cur * 5
                        + b_cur)
        lower = jnp.take(covf, g_ar * T + tc) <= min_cov
        is_start = code >= 250
        can = (~done) & ~is_start
        ev = jnp.where(can & (ck != 4) & (n_emit < 2 * T),
                       (ck + 5 * lower).astype(jnp.uint8),
                       jnp.uint8(NOEMIT))
        n_emit = n_emit + (ev != NOEMIT).astype(jnp.int32)
        jump = can & (code < 128)
        stay = can & (code >= 128)
        step_b = jnp.where(jump, code % 5,
                           jnp.where(stay, code - 128, b_cur))
        d_cur = jnp.where(jump, code // 5,
                          jnp.where(stay, d_cur - 1, d_cur))
        b_cur = step_b
        ck = jnp.where(jump | stay, step_b, ck)
        t_cur = jnp.where(jump, t_cur - 1, t_cur)
        done = done | is_start | (t_cur < 0) | (n_emit >= 2 * T)
        return (t_cur, d_cur, b_cur, ck, done, n_emit), ev

    init = (gb_t, gb_d, gb_b, gb_b, gb_s == jnp.float32(-1.0),
            jnp.zeros((G,), jnp.int32))
    (_, _, _, _, done, _), emits = jax.lax.scan(
        step, init, None, length=cap, unroll=_SCAN_UNROLL)
    e = emits.T                                          # [G, cap]
    packed = e[:, 0::2] | (e[:, 1::2] << 4)
    return packed, done


def assemble_walk(packed_row):
    """Host: one group's packed walk stream -> consensus string."""
    row = np.asarray(packed_row)
    codes = np.empty(row.shape[0] * 2, np.uint8)
    codes[0::2] = row & 15
    codes[1::2] = row >> 4
    sel = codes[codes != NOEMIT][::-1]
    return _LUT[np.minimum(sel, 9)].tobytes().decode()


_LUT = np.frombuffer(b"ACGT-acgt-", np.uint8)


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_emit(emit, cap):
    """Device-side compaction of the emission planes: [T, G, D] uint8
    (mostly NOEMIT) -> (out [G, cap+1] dense codes in emission order,
    counts [G]).  The emitted stream is ~1 code per seed base, so
    fetching the compacted rows costs ~D x fewer D2H bytes than the full
    planes -- the device-DP path's dominant tunnel cost (BASELINE.md
    round-2 "Consensus back-ends": 9.4MB/batch at 24-31 MB/s).  Slots
    past a group's count are unspecified; callers detect counts > cap
    and fall back to fetching that group's full plane.

    Formulated as a gather-inversion (binary search on the emission
    cumsum), NOT a scatter: the previous [G, T*D]-wide 2-D scatter cost
    a pathological 117s XLA compile per (T, G) shape (profiled round 4,
    tools/profile_cns_dp.py) -- the dominant cold-start cost of the
    whole DP path."""
    T, G, D = emit.shape
    flat = emit.transpose(1, 0, 2).reshape(G, T * D)
    mask = flat != NOEMIT
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1)   # 1-based rank
    counts = pos[:, -1]
    N = T * D
    # out[g, k] = flat[g, first s with pos[g, s] == k+1 and mask[g, s]]
    want = jnp.arange(1, cap + 2, dtype=jnp.int32)[None, :]   # [1, cap+1]
    lo = jnp.zeros((G, cap + 1), jnp.int32)
    hi = jnp.full((G, cap + 1), N, jnp.int32)
    for _ in range(max(1, N.bit_length())):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(pos, jnp.clip(mid, 0, N - 1), axis=1)
        less = v < want
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    got = jnp.take_along_axis(flat, jnp.clip(lo, 0, N - 1), axis=1)
    out = jnp.where(want <= counts[:, None], got, jnp.uint8(0))
    return out, counts


def assemble_consensus(emit, g):
    """Host: one group's emission plane -> consensus string."""
    codes = np.asarray(emit[:, g, :]).reshape(-1)
    sel = codes[codes != NOEMIT][::-1]
    return _LUT[np.minimum(sel, 9)].tobytes().decode()


def assemble_compacted(row, count):
    """Host: one group's compacted emission row -> consensus string."""
    sel = np.asarray(row[:count])[::-1]
    return _LUT[np.minimum(sel, 9)].tobytes().decode()


def consensus_batch_host(emit, n_groups):
    return [assemble_consensus(emit, g) for g in range(n_groups)]
