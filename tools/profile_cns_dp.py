"""Stage-by-stage profile of the device consensus-DP path (FTPU_CNS_DP)
on real hardware, to attribute its gap vs the host-MSA hybrid
(VERDICT r3 weak #1: 1.03M vs 4.0M support-bases/s warm).

Measures, per DP batch, with block_until_ready barriers between stages:
  align     traceback alignment of the batch's support tasks
  acc       accumulate_tags scatter per align batch
  scan      consensus_scan forward DP
  bt        backtrack reverse scan
  compact   compact_emit + device_get of the compacted rows
plus the number of distinct jit shapes hit per stage and total compile
time (jax_log_compiles).

Usage: python tools/profile_cns_dp.py [--genome-size N] [--repeat N]
"""
import argparse
import collections
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--genome-size", type=int, default=300_000)
    p.add_argument("--coverage", type=float, default=24)
    p.add_argument("--error", type=float, default=0.08)
    p.add_argument("--repeat", type=int, default=2)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    from falcon_tpu.utils.jaxinit import setup_jax
    setup_jax()
    import jax
    jax.config.update("jax_log_compiles", True)

    # count compiles via the logging hook
    compiles = []

    class H(logging.Handler):
        def emit(self, rec):
            msg = rec.getMessage()
            if "Compiling" in msg or "compile" in msg.lower():
                compiles.append((time.time(), msg[:160]))

    h = H()
    logging.getLogger("jax").addHandler(h)
    logging.getLogger("jax._src.interpreters.pxla").addHandler(h)
    logging.getLogger("jax._src.dispatch").addHandler(h)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, "/root/repo")
    from bench_consensus import build_groups
    groups, cfg = build_groups(args.genome_size, args.coverage,
                               args.error, seed=11)
    total_bases = sum(sum(len(s) for _, s, _ in items)
                      for _, items in groups)
    print("groups: %d, support bases: %.1fM" %
          (len(groups), total_bases / 1e6), file=sys.stderr)

    from falcon_tpu.cns.device import DeviceCns, gate_group_ranged
    from falcon_tpu.ops import cns_dp
    import numpy as np
    import jax.numpy as jnp

    dev = DeviceCns(use_dp=True)

    # gate everything up front
    chunk = []
    for seed_id, items in groups:
        g = gate_group_ranged(seed_id, items, cfg)
        if g is not None:
            chunk.append((seed_id, g[0], g[1]))

    stage_t = collections.Counter()
    stage_n = collections.Counter()
    shapes = collections.defaultdict(set)

    def hard_sync(out):
        # block_until_ready does not reliably block on the axon remote
        # runtime (round-4 finding); fetching one element of a leaf
        # does.  Index (not reshape: reshaping a tiled [T,G,D] device
        # array costs a 165s one-time XLA compile) a single scalar.
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf[(0,) * leaf.ndim])

    def timed(name, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        hard_sync(out)
        stage_t[name] += time.time() - t0
        stage_n[name] += 1
        return out

    D = dev.dp_delta_cap

    for rep in range(args.repeat):
        if rep == args.repeat - 1:
            stage_t.clear()
            stage_n.clear()
            n_compiles_warm = len(compiles)
        t_rep = time.time()
        # mirror dispatch_chunk_dp's batching exactly
        buckets = {}
        for ci, (seed_id, seed_seq, sups) in enumerate(chunk):
            T = max(1024, 1 << int(np.ceil(np.log2(max(
                len(seed_seq), 2)))))
            buckets.setdefault(T, []).append(ci)
        n_batches = 0
        for T in sorted(buckets):
            cis = buckets[T]
            Gmax = dev._dp_group_cap(T)
            for ofs in range(0, len(cis), Gmax):
                sub = cis[ofs:ofs + Gmax]
                G = min(Gmax, max(8, 1 << int(np.ceil(np.log2(
                    max(len(sub), 2))))))
                n_batches += 1
                # --- rebuild _dispatch_dp_batch with stage barriers ---
                seeds = np.full((G, T), 4, np.int8)
                tlens = np.zeros(G, np.int32)
                tasks, gidx_l, s2_l = [], [], []
                t0 = time.time()
                for g, ci in enumerate(sub):
                    seed_id, seed_seq, sups = chunk[ci]
                    from falcon_tpu.cns.device import (
                        seq_to_codes, _clamp_range, _range_ok)
                    sc = seq_to_codes(seed_seq)
                    seeds[g, :len(sc)] = np.minimum(sc, 4)
                    tlens[g] = len(sc)
                    for (sup, rng, is_self) in sups:
                        if is_self or rng is None:
                            continue
                        rng = _clamp_range(rng, len(sup), len(seed_seq))
                        if not _range_ok(rng):
                            continue
                        s1, e1, s2v, e2 = rng
                        tasks.append((seq_to_codes(sup)[s1:e1],
                                      sc[s2v:e2]))
                        gidx_l.append(g)
                        s2_l.append(s2v)
                stage_t["hostprep"] += time.time() - t0
                msa = timed("alloc", cns_dp.alloc_msa, G, T, D)
                msa = timed("selftags", cns_dp.add_self_tags, msa,
                            jnp.asarray(seeds), jnp.asarray(tlens), T)
                max_diff = 1.0 - cfg.min_idt
                t0 = time.time()
                metas = dev._dispatch_align_meta(tasks, gidx_l, s2_l)
                for m_ in metas:
                    hard_sync(m_[1])
                stage_t["align"] += time.time() - t0
                stage_n["align"] += len(metas)
                for (q, outs, gi_b, s2_b) in metas:
                    bd, mvp = outs[2], outs[3]
                    shapes["acc"].add((mvp.shape, q.shape, T))
                    if len(outs) == 5:
                        msa = timed(
                            "acc", cns_dp.accumulate_tags_planes, msa,
                            mvp, outs[4], bd, gi_b, s2_b,
                            np.float32(max_diff), T, D)
                    else:
                        msa = timed(
                            "acc", cns_dp.accumulate_tags, msa, mvp, q,
                            bd, gi_b, s2_b, np.float32(max_diff), T, D)
                shapes["scan"].add((G, T))
                out_scan = timed("scan", cns_dp.consensus_scan,
                                 msa, G, T, D)
                bp, cov, gb_s, gb_t, gb_d, gb_b = out_scan
                emit = timed("bt", cns_dp.backtrack, bp, cov, gb_s,
                             gb_t, gb_d, gb_b, np.int32(cfg.min_cov),
                             G, T, D)
                cap = T + T // 4
                comp, counts = timed("compact", cns_dp.compact_emit,
                                     emit, cap=cap)
                t0 = time.time()
                comp_h, counts_h = jax.device_get((comp, counts))
                stage_t["fetch"] += time.time() - t0
                t0 = time.time()
                for g in range(len(sub)):
                    cns_dp.assemble_compacted(comp_h[g], int(counts_h[g]))
                stage_t["hostasm"] += time.time() - t0
        print("rep %d: %.2fs (%d batches)" %
              (rep, time.time() - t_rep, n_batches), file=sys.stderr)

    wall = sum(stage_t.values())
    result = {
        "metric": "cns_dp_profile",
        "support_mbases": round(total_bases / 1e6, 2),
        "stages_s": {k: round(v, 3) for k, v in
                     sorted(stage_t.items(), key=lambda x: -x[1])},
        "stage_calls": dict(stage_n),
        "distinct_acc_shapes": len(shapes["acc"]),
        "distinct_scan_shapes": len(shapes["scan"]),
        "compiles_total": len(compiles),
        "compiles_last_rep": len(compiles) - n_compiles_warm,
        "sum_stage_s": round(wall, 2),
        "eff_support_bases_per_s": round(total_bases / max(wall, 1e-9), 0),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
