"""Sharded overlap extension on a multi-device mesh (virtual CPU)."""
import jax
import numpy as np
import pytest

from falcon_tpu.parallel.mesh import ShardedExtender, make_mesh


def mk(B, L, err=0.15, seed=0):
    rng = np.random.RandomState(seed)
    q = np.full((B, L), 4, np.int32)
    t = np.full((B, L), 5, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b in range(B):
        n = int(L * 0.8)
        tt = rng.randint(0, 4, n).astype(np.int32)
        qq = tt.copy()
        sub = rng.rand(n) < err
        qq[sub] = (qq[sub] + 1) % 4
        q[b, :n] = qq
        t[b, :n] = tt
        qlen[b] = n
        tlen[b] = n
    return q, qlen, t, tlen


@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason="needs multiple devices; run via `make test`")
def test_sharded_matches_single():
    from falcon_tpu.ops.align_device import extend_batch_device
    import jax.numpy as jnp
    q, qlen, t, tlen = mk(40, 512)
    mesh = make_mesh()
    ext = ShardedExtender(mesh=mesh, W=128, use_pallas=False)
    bi, bj, bd = ext.extend(q, qlen, t, tlen)
    ri, rj, rd = [np.asarray(x) for x in extend_batch_device(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
        jnp.asarray(tlen), W=128)]
    assert (bi == ri).all() and (bj == rj).all() and (bd == rd).all()
    # substitution-only pairs extend to (or within a mismatch of) the ends
    assert ((bi == qlen) | (bj == tlen)).all()
    assert (bi >= qlen - 2).all() and (bj >= tlen - 2).all()


@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason="needs multiple devices; run via `make test`")
def test_sharded_uneven_batch_padding():
    q, qlen, t, tlen = mk(13, 256, seed=3)
    ext = ShardedExtender(W=128, use_pallas=False)
    bi, bj, bd = ext.extend(q, qlen, t, tlen)
    assert bi.shape == (13,)
    assert (bi > 0).all()


def test_device_extender_run_batching():
    """DeviceExtender.run: bucketed async batching returns per-task results
    identical to the one-shot kernel on each task alone."""
    from falcon_tpu.ops.align_device import DeviceExtender, \
        extend_batch_device
    import jax.numpy as jnp
    rng = np.random.RandomState(7)
    tasks = []
    for n in [30, 100, 300, 517, 1200, 40, 0, 5]:
        tt = rng.randint(0, 4, n).astype(np.uint8)
        qq = tt.copy()
        if n:
            sub = rng.rand(n) < 0.1
            qq[sub] = (qq[sub] + 1) % 4
        tasks.append((qq, tt))
    ext = DeviceExtender(W=128, max_batch=4, use_pallas=False)
    got = ext.run(tasks)
    assert len(got) == len(tasks)
    for (qc, tc), (i, j, d) in zip(tasks, got):
        L = max(len(qc), len(tc), 8)
        q = np.full((1, L), 4, np.int32)
        t = np.full((1, L), 5, np.int32)
        q[0, :len(qc)] = qc
        t[0, :len(tc)] = tc
        ri, rj, rd = extend_batch_device(
            jnp.asarray(q), jnp.asarray([len(qc)], dtype=np.int32),
            jnp.asarray(t), jnp.asarray([len(tc)], dtype=np.int32), W=128)
        assert (int(ri[0]), int(rj[0]), int(rd[0])) == (i, j, d)
