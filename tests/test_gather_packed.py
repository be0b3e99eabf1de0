"""Word-level packed spec gather == per-element reference gather.

The production gather (ops.align_device._gather_specs2_packed) fetches
two uint32 words per 16-lane group with a per-row funnel shift and
handles dir=-1 by forward-gather + row flip; this pins it against the
straightforward per-element formulation on random specs including
reversed rows, zero lengths, and boundary offsets."""
import numpy as np
import jax.numpy as jnp

from falcon_tpu.ops import align_device as ad


def _mk(seed, n=5000, B=64, L=256):
    rng = np.random.RandomState(seed)
    flat = rng.randint(0, 4, n).astype(np.uint8)
    words = ad.pack_flat_2bit(flat)
    wp = np.zeros(1 << int(np.ceil(np.log2(len(words)))), np.uint32)
    wp[:len(words)] = words
    off = rng.randint(0, n, B).astype(np.int32)
    ln = rng.randint(0, L + 1, B).astype(np.int32)
    dr = np.where(rng.rand(B) < 0.5, 1, -1).astype(np.int32)
    # in-range slices, as real callers guarantee
    for b in range(B):
        if dr[b] == 1:
            ln[b] = min(ln[b], n - off[b])
        else:
            ln[b] = min(ln[b], off[b] + 1)
    # edge rows: zero-length, start-of-flat, end-of-flat
    off[0], ln[0], dr[0] = 0, L, 1
    ln[0] = min(L, n)
    off[1], ln[1] = 0, 0
    off[2], ln[2], dr[2] = n - 1, min(L, n), -1
    return jnp.asarray(wp), off, ln, dr


def test_word_gather_matches_reference():
    for seed in (1, 2, 3):
        packed, off, ln, dr = _mk(seed)
        off2, ln2, dr2 = off[::-1].copy(), ln[::-1].copy(), dr[::-1].copy()
        args = (packed, jnp.asarray(off), jnp.asarray(ln),
                jnp.asarray(dr), jnp.asarray(off2), jnp.asarray(ln2),
                jnp.asarray(dr2))
        qr, tr = ad._gather_specs2_packed_ref(*args, L=256,
                                              fill_q=4, fill_t=5)
        qf, tf = ad._gather_specs2_packed(*args, L=256,
                                          fill_q=4, fill_t=5)
        np.testing.assert_array_equal(np.asarray(qr), np.asarray(qf))
        np.testing.assert_array_equal(np.asarray(tr), np.asarray(tf))


def test_bucket_ladder():
    ext = ad.DeviceExtender.__new__(ad.DeviceExtender)  # no jax init
    m = np.array([1, 256, 1024, 1025, 5000, 16384, 16385, 300000])
    Ls = ext._bucket_ladder(m)
    assert Ls.tolist() == [1024, 1024, 1024, 2048, 8192, 16384, 32768,
                           262144]
