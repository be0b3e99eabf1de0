"""Micro-profile of the overlap extension path on the TPU.

Splits one production-shaped batch into its device stages to attribute
the engine's `collect` time: (a) the spec gather (packed-word gather +
unpack -> [B, L] planes), (b) the pallas extension kernel on resident
planes (includes its own [n_sb, B, winw] window staging), (c) the fused
chain as the engine runs it.  Drives each stage `iters` times with 4
calls in flight (the engine's dispatch pattern).

Usage: python tools/profile_extender.py [B] [L]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, iters=3, pipe=4):
    import jax
    jax.device_get(fn())
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(pipe)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / pipe)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    import jax
    import jax.numpy as jnp
    from falcon_tpu.utils.jaxinit import setup_jax
    setup_jax()
    from falcon_tpu.ops import align_device as ad

    rng = np.random.RandomState(0)
    n_flat = 64 << 20                       # 64 Mb flat block
    flat = rng.randint(0, 4, n_flat).astype(np.uint8)
    words = ad.pack_flat_2bit(flat)
    wl = 1 << int(np.ceil(np.log2(len(words))))
    wp = np.zeros(wl, np.uint32)
    wp[:len(words)] = words
    flat_d = jax.device_put(jnp.asarray(wp))

    sel = np.zeros((6, B), np.int32)
    sel[0] = rng.randint(0, n_flat - L, B)      # q_off
    sel[1] = rng.randint(L // 2, L, B)          # q_len
    sel[2] = 1
    sel[3] = rng.randint(0, n_flat - L, B)      # t_off
    sel[4] = rng.randint(L // 2, L, B)          # t_len
    sel[5] = 1
    sel_d = jax.device_put(jnp.asarray(sel))

    gather = lambda: ad._gather_specs2_packed(
        flat_d, sel_d[0], sel_d[1], sel_d[2], sel_d[3], sel_d[4],
        sel_d[5], L=L, fill_q=4, fill_t=5)
    t_gather = timeit(gather)

    qd, td = gather()
    qd, td = jax.device_put(np.asarray(qd)), jax.device_put(np.asarray(td))
    qlen_d = jax.device_put(sel[1])
    tlen_d = jax.device_put(sel[4])
    from falcon_tpu.ops.align_pallas import extend_batch_pallas
    kern = lambda: extend_batch_pallas(qd, qlen_d, td, tlen_d,
                                       W=256, block_b=256)
    t_kern = timeit(kern)

    def chain():
        q, t = gather()
        return extend_batch_pallas(q, sel_d[1], t, sel_d[4],
                                   W=256, block_b=256)
    t_chain = timeit(chain)

    cells = B * 2 * L * 256
    bases = float(np.minimum(sel[1], sel[4]).sum())
    print("B=%d L=%d: gather %.3fs | kernel %.3fs (%.1fM bases/s) | "
          "chain %.3fs" % (B, L, t_gather, t_kern, bases / t_kern / 1e6,
                           t_chain))


if __name__ == "__main__":
    main()
