"""Pallas extension kernel vs the XLA kernel, in interpret mode (CPU).

The mosaic-compiled path only runs on real TPU; interpret mode executes
the same kernel logic lane-for-lane, so this is the CI-side parity net
for align_pallas (including the boundary/interior super-block split).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _pairs(B, L, err, seed):
    rng = np.random.RandomState(seed)
    q = np.full((B, L), 4, np.int8)
    t = np.full((B, L), 5, np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b in range(B):
        n = rng.randint(L // 3, int(L * 0.95))
        tt = rng.randint(0, 4, n).astype(np.int8)
        keep = rng.rand(n) >= err / 2
        qq = tt[keep].copy()
        sub = rng.rand(len(qq)) < err / 2
        qq[sub] = (qq[sub] + rng.randint(1, 4, sub.sum())) % 4
        m = min(len(qq), L)
        q[b, :m] = qq[:m]
        t[b, :n] = tt
        qlen[b] = m
        tlen[b] = n
    return q, qlen, t, tlen


# (64, 512) exercises the LEAN super-block class: with min len ~460 the
# scalar guard proves blocks sb=2..12 boundary-free, so the mask-free
# no-clamp body runs and must still match the XLA kernel exactly
@pytest.mark.parametrize("W,L", [(64, 128), (64, 256), (64, 512)])
def test_pallas_interpret_matches_xla(W, L):
    import jax.numpy as jnp
    from falcon_tpu.ops.align_device import extend_batch_device
    from falcon_tpu.ops.align_pallas import extend_batch_pallas

    B = 8
    q, qlen, t, tlen = _pairs(B, L, err=0.15, seed=3)
    ref = extend_batch_device(jnp.asarray(q.astype(np.int32)),
                              jnp.asarray(qlen),
                              jnp.asarray(t.astype(np.int32)),
                              jnp.asarray(tlen), W=W)
    got = extend_batch_pallas(jnp.asarray(q), jnp.asarray(qlen),
                              jnp.asarray(t), jnp.asarray(tlen),
                              W=W, block_b=B, interpret=True)
    for name, a, b in zip("i j d".split(), ref, got):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg="best_%s differs" % name)


def test_pallas_interpret_empty_rows():
    # zero-length pad rows must return (0, 0, 0) and not poison the batch
    import jax.numpy as jnp
    from falcon_tpu.ops.align_pallas import extend_batch_pallas

    B, L, W = 8, 128, 64
    q, qlen, t, tlen = _pairs(B, L, err=0.1, seed=5)
    qlen[3:] = 0
    tlen[3:] = 0
    q[3:] = 4
    t[3:] = 5
    bi, bj, bd = extend_batch_pallas(jnp.asarray(q), jnp.asarray(qlen),
                                     jnp.asarray(t), jnp.asarray(tlen),
                                     W=W, block_b=B, interpret=True)
    assert np.all(np.asarray(bi)[3:] == 0)
    assert np.all(np.asarray(bj)[3:] == 0)
    assert np.all(np.asarray(bd)[3:] == 0)
    assert np.asarray(bi)[0] > 0 or np.asarray(bj)[0] > 0


@pytest.mark.parametrize("W,L", [(64, 128)])
def test_tb_pallas_interpret_matches_xla(W, L):
    import jax.numpy as jnp
    from falcon_tpu.ops.align_tb import align_tb_batch
    from falcon_tpu.ops import align_tb_pallas as tbp

    B = 8
    q, qlen, t, tlen = _pairs(B, L, err=0.15, seed=7)
    ref = align_tb_batch(jnp.asarray(q), jnp.asarray(qlen),
                         jnp.asarray(t), jnp.asarray(tlen), W=W)
    got = tbp.align_tb_batch_pallas(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
        jnp.asarray(tlen), W=W, block_b=B, interpret=True)
    for name, a, b in zip("i j d moves".split(), ref, got):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg="tb %s differs" % name)
