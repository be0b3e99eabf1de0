"""Microbenchmark of MSA tag-accumulation variants at production shapes.

Variants:
  scatter   ops.cns_dp.accumulate_tags (combined-buffer single scatter)
  mm        ops.cns_dp.accumulate_tags_mm (gather-inversion + one-hot
            matmuls)
Shapes mirror what dispatch_chunk_dp produces at E. coli scale:
B tasks of ~L bases against T-column groups.

Usage: python tools/bench_accumulate.py [--B 64] [--L 16384] [--T 16384]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=64)
    p.add_argument("--L", type=int, default=16384)
    p.add_argument("--T", type=int, default=16384)
    p.add_argument("--G", type=int, default=32)
    p.add_argument("--D", type=int, default=14)
    p.add_argument("--err", type=float, default=0.12)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from falcon_tpu.utils.jaxinit import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from falcon_tpu.ops import align_tb, cns_dp
    from falcon_tpu.ops.align_tb_pallas import align_tb_batch_pallas

    B, L, T, G, D = args.B, args.L, args.T, args.G, args.D
    rng = np.random.RandomState(5)
    qs = np.full((B, L), 4, np.int8)
    ts = np.full((B, L), 5, np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    gidx = np.sort(rng.randint(0, G, B)).astype(np.int32)
    s2 = np.zeros(B, np.int32)
    for b in range(B):
        n = rng.randint(int(L * 0.55), int(L * 0.95))
        t_arr = rng.randint(0, 4, n).astype(np.uint8)
        # noisy copy
        keep = rng.rand(n) > args.err / 3
        q_arr = t_arr[keep]
        qs[b, :len(q_arr)] = q_arr
        ts[b, :n] = t_arr
        qlen[b] = len(q_arr)
        tlen[b] = n
    t0 = time.time()
    outs = align_tb_batch_pallas(
        jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
        jnp.asarray(tlen), W=256, block_b=min(256, B))
    jax.block_until_ready(outs)
    bi, bj, bd, mvp = outs
    print("align: %.2fs, mvp %s" % (time.time() - t0, mvp.shape),
          file=sys.stderr)
    max_diff = np.float32(0.5)

    res = {"B": B, "L": L, "T": T, "G": G,
           "updates_per_call": int(B * mvp.shape[0] * 4)}

    def timeit(name, fn):
        out = fn(cns_dp.alloc_msa(G, T, D))    # compile
        jax.block_until_ready(out)
        ts_ = []
        for _ in range(args.reps):
            m = cns_dp.alloc_msa(G, T, D)
            jax.block_until_ready(m)
            t0 = time.time()
            out = fn(m)
            jax.block_until_ready(out)
            ts_.append(time.time() - t0)
        res[name + "_s"] = round(min(ts_), 4)
        return out

    ga = jnp.asarray(gidx)
    s2a = jnp.asarray(s2)
    qsa = jnp.asarray(qs)

    a = timeit("scatter", lambda m: cns_dp.accumulate_tags(
        m, mvp, qsa, bd, ga, s2a, max_diff, T, D))
    b_ = timeit("mm", lambda m: cns_dp.accumulate_tags_mm(
        m, mvp, qsa, bd, ga, s2a, max_diff, T, D, G))
    same = bool(np.array_equal(np.asarray(a)[:-1], np.asarray(b_)[:-1]))
    res["mm_parity"] = same
    kept = int(np.asarray(a)[:-1].sum())
    res["kept_columns"] = kept
    res["scatter_ns_per_slot"] = round(
        res["scatter_s"] * 1e9 / res["updates_per_call"], 2)
    res["scatter_ns_per_kept"] = round(res["scatter_s"] * 1e9 /
                                       max(kept, 1), 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
