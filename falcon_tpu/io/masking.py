"""Soft-mask tracks: low-complexity (dust) + tandem-repeat intervals.

TPU-native replacement for the reference's DBdust + datander/TANmask/
Catrack chain, which it runs on every read DB before daligner
(reference: falcon_kit/bash.py:164-213 builds `DBdust raw_reads` and the
`HPC.TANmask` plan into every rdb script; falcon_kit/mains/dazzler.py:
220-338 tan-split/apply/combine; masks are then passed to daligner as
`-mdust -mtan`).  The masks are SOFT: they only suppress seed k-mers in
the overlap engine -- alignment and consensus always see the real bases,
exactly like daligner's `-m` masks only gate seed hits.

Algorithms (linear-time, vectorized; same role, not a port):

  dust    a base is low-complexity when most triplets in its 64bp window
          recur at short range: for each triplet position, compute the
          distance to the previous occurrence of the same triplet; a
          window whose fraction of triplets with distance <= 8 exceeds
          min_frac is masked.  Catches homopolymers and short-period
          (1-8bp) microsatellites -- the DBdust content class.
  tandem  a k-mer recurring within max_period bases ON THE SAME READ is
          tandem evidence; the span between the two occurrences is
          masked (the datander/TANmask interval semantics: self-overlap
          off the main diagonal).

Both run over the store's flat code array with read-boundary
invalidation, so one pass handles the whole DB.
"""
import logging

import numpy as np

LOG = logging.getLogger(__name__)


def _prev_occurrence_dist(keys, ok):
    """For each position, distance to the previous position with the
    same key (both must be ok); 1<<30 where none."""
    n = len(keys)
    big = np.int64(1 << 30)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    pos = np.arange(n, dtype=np.int64)
    kv = np.where(ok, keys, -1 - pos)     # invalid keys never match
    order = np.lexsort((pos, kv))
    ks = kv[order]
    ps = pos[order]
    d = np.full(n, big, dtype=np.int64)
    same = ks[1:] == ks[:-1]
    d[ps[1:][same]] = ps[1:][same] - ps[:-1][same]
    return d


def _read_of(offsets, n):
    pos = np.arange(n, dtype=np.int64)
    return np.searchsorted(offsets, pos, side="right") - 1


def _kmer_keys(codes, K):
    c = codes.astype(np.int64)
    n = len(c)
    if n < K:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool)
    bad = c > 3
    c = np.where(bad, 0, c)
    acc = np.zeros(n - K + 1, dtype=np.int64)
    ok = np.ones(n - K + 1, dtype=bool)
    for i in range(K):
        acc = acc * 4 + c[i:n - K + 1 + i]
        ok &= ~bad[i:n - K + 1 + i]
    return acc, ok


def dust_mask(codes, offsets, window=64, max_dist=8, min_frac=0.7):
    """Per-base low-complexity mask over a flat code array."""
    n = len(codes)
    mask = np.zeros(n, dtype=bool)
    if n < 3:
        return mask
    keys, ok = _kmer_keys(codes, 3)
    # invalidate triplets spanning read boundaries
    ro = _read_of(offsets, len(keys))
    ok &= np.arange(len(keys), dtype=np.int64) + 3 <= offsets[ro + 1]
    d = _prev_occurrence_dist(keys, ok)
    # prev occurrence must be on the same read
    d = np.where(np.arange(len(keys)) - d >= offsets[ro], d, 1 << 30)
    rep = ((d <= max_dist) & ok).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(rep)])
    w = min(window, len(keys))
    if w < 8:
        return mask
    # windowed repeat fraction; window [i, i+w) of triplet positions
    cnt = cs[w:] - cs[:-w]                       # [len(keys)-w+1]
    hot = cnt >= min_frac * w
    # a hot window masks its whole base span [i, i+w+2)
    if hot.any():
        dif = np.zeros(n + 1, dtype=np.int64)
        hi = np.flatnonzero(hot)
        np.add.at(dif, hi, 1)
        np.add.at(dif, np.minimum(hi + w + 2, n), -1)
        mask = np.cumsum(dif[:-1]) > 0
        # clip each masked run to its read (hot windows never span reads
        # because boundary triplets are invalid, but be safe)
    return mask


def tandem_mask(codes, offsets, k=12, max_period=500):
    """Per-base tandem-repeat mask: spans between same-read k-mer
    recurrences with period in [k, max_period]."""
    n = len(codes)
    mask = np.zeros(n, dtype=bool)
    keys, ok = _kmer_keys(codes, k)
    if len(keys) == 0:
        return mask
    ro = _read_of(offsets, len(keys))
    ok &= np.arange(len(keys), dtype=np.int64) + k <= offsets[ro + 1]
    d = _prev_occurrence_dist(keys, ok)
    pos = np.arange(len(keys), dtype=np.int64)
    same_read = (pos - d) >= offsets[ro]
    hit = ok & same_read & (d >= k) & (d <= max_period)
    if not hit.any():
        return mask
    # confirmation: a lone k-mer recurrence is not tandem evidence (a
    # random 12-mer collision would mask up to max_period bases); require
    # an adjacent hit with a consistent period, which true tandems give
    # at every position (TANmask's extended-self-alignment role)
    hp = pos[hit]
    hd = d[hit]
    conf = np.zeros(len(hp), dtype=bool)
    if len(hp) > 1:
        near = (hp[1:] - hp[:-1] <= 2 * k) & \
            (np.abs(hd[1:] - hd[:-1]) <= 8)
        conf[:-1] |= near
        conf[1:] |= near
    hp, hd = hp[conf], hd[conf]
    if len(hp) == 0:
        return mask
    starts = hp - hd
    ends = np.minimum(hp + k, n)
    dif = np.zeros(n + 1, dtype=np.int64)
    np.add.at(dif, starts, 1)
    np.add.at(dif, ends, -1)
    return np.cumsum(dif[:-1]) > 0


def build_mask(codes, offsets, dust=True, tandem=True, **kw):
    """Combined per-base soft mask for a flat store (bool array)."""
    m = np.zeros(len(codes), dtype=bool)
    if dust:
        m |= dust_mask(codes, offsets)
    if tandem:
        m |= tandem_mask(codes, offsets)
    LOG.info("masking: %d/%d bases soft-masked (%.2f%%)",
             int(m.sum()), len(m), 100.0 * m.sum() / max(1, len(m)))
    return m


def apply_seed_mask(codes, mask):
    """Seeding view of a code array: masked bases become 255 (invalid
    for k-mer keys), leaving the original array untouched for
    alignment."""
    if mask is None:
        return codes
    return np.where(mask, np.uint8(255), codes)
