"""Benchmark: overlap-extension alignment throughput on one chip.

Measures the assembler's FLOP-dominant kernel -- batched banded overlap
extension (falcon_tpu.ops.align_pallas / align_device) -- on realistic
noisy long-read pairs, and reports aligned bases/second on the current
accelerator.

Self-diagnosing methodology (round 3): the chip is reached through a
shared tunnel whose contention once made a healthy kernel read 24x slow
(BENCH_r02 2.75M vs 65M bases/s; see BASELINE.md "Bench environment").
So the bench now:
  * emits an ENVIRONMENT PREAMBLE -- tunnel round-trip latency, H2D and
    D2H bandwidth, and a trivial reduction kernel's achieved HBM
    bandwidth -- so a contended capture is visibly a contended capture;
  * times MULTIPLE WINDOWS and reports the best window (plus per-window
    means), because contention is bursty and the best quiet window is
    the property of the code;
  * reports BOTH the pipelined number (async-queued calls, one batched
    fetch -- how the production engine drives the device) and the
    per-call sync latency including the round-trip, as separate fields;
  * reports both the pallas and the XLA kernel in one JSON line.

vs_baseline: ratio against the reference implementation's aligner (the
banded O(ND) C kernel from /root/reference/src/c/DW_banded.c, compiled
out-of-tree and timed on the same pairs on one host core).  If the
reference checkout is unavailable, a previously measured constant for
this host is used.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# measured on this container (2-core host) if the live oracle is missing:
FALLBACK_C_BASES_PER_S = 1.1e6


def make_pairs(B, L, err, seed=0):
    rng = np.random.RandomState(seed)
    q = np.full((B, L), 4, np.int32)
    t = np.full((B, L), 5, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b in range(B):
        n = int(L * 0.9)
        tt = rng.randint(0, 4, n).astype(np.uint8)
        r = rng.rand(n)
        keep = r >= err / 3
        qq = tt[keep].copy()
        sub = rng.rand(len(qq)) < err / 3
        qq[sub] = (qq[sub] + rng.randint(1, 4, sub.sum())) % 4
        ins = rng.rand(len(qq)) < err / 3
        out = np.insert(qq, np.nonzero(ins)[0], rng.randint(0, 4, ins.sum()))
        qq = out[:L]
        q[b, :len(qq)] = qq
        t[b, :n] = tt
        qlen[b] = len(qq)
        tlen[b] = n
    return q, qlen, t, tlen


# -- roofline denominators ---------------------------------------------------
# The extension kernel is VPU-bound (int elementwise min/add/select over
# [block_b, W] wavefront tiles; no matmuls).  Speed of light is therefore the
# VPU integer issue rate, not the MXU:
#   v5e TensorCore clock ~1.5GHz (197e12 bf16 FLOP/s / (4 MXUs*128*128*2));
#   VPU = 8 sublanes x 128 lanes x 4 ALUs -> ~6.1e12 int32 ops/s.
# Per DP cell the kernel's fast path issues ~12 VPU ops (2 min + 2 add for
# the recurrence, sub-cost d*d+min, compares for the validity mask,
# where+clamp) -- counted from align_pallas._kernel.do_step.
VPU_PEAK_OPS = {"v5e": 6.1e12, "v5p": 9.1e12, "v4": 3.8e12}
OPS_PER_CELL = 12.0


def chip_kind():
    import jax
    d = jax.devices()[0]
    kind = (getattr(d, "device_kind", "") or "").lower()
    for k in VPU_PEAK_OPS:
        if k in kind:
            return k
    plat = getattr(d, "platform", "")
    if plat in ("tpu", "axon"):
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        return gen if gen in VPU_PEAK_OPS else "v5e"
    return None


def probe_env():
    """Environment health preamble: tunnel RTT, H2D/D2H bandwidth, and a
    trivial kernel's achieved HBM read bandwidth.  Cheap (~1s) and run
    before/after the timed windows so a contended capture is labeled."""
    import jax
    import jax.numpy as jnp
    out = {}
    # round-trip latency: sync device_get of a scalar, median of 20
    x = jnp.zeros((), jnp.int32) + 1
    jax.block_until_ready(x)
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.device_get(x)
        ts.append(time.perf_counter() - t0)
    out["rtt_ms"] = round(float(np.median(ts)) * 1e3, 2)
    # H2D: device_put 16 MB
    h = np.zeros(4 << 20, np.int32)
    jax.block_until_ready(jax.device_put(h))  # warm any setup path
    t0 = time.perf_counter()
    d = jax.device_put(h)
    jax.block_until_ready(d)
    out["h2d_mb_s"] = round(h.nbytes / (time.perf_counter() - t0) / 2**20, 1)
    # D2H: device_get the same 16 MB
    t0 = time.perf_counter()
    jax.device_get(d)
    out["d2h_mb_s"] = round(h.nbytes / (time.perf_counter() - t0) / 2**20, 1)
    # trivial kernel: sum-reduce 64 MB int32 resident in HBM; the achieved
    # read bandwidth sanity-checks device dispatch independent of this
    # repo's kernels (v5e HBM ~ 819 GB/s)
    big = jax.device_put(np.ones(16 << 20, np.int32))
    f = jax.jit(lambda a: jnp.sum(a))
    jax.block_until_ready(f(big))
    t0 = time.perf_counter()
    for _ in range(8):
        r = f(big)
    jax.block_until_ready(r)
    gb = 8 * big.nbytes / 2**30
    out["reduce_gb_s"] = round(gb / (time.perf_counter() - t0), 1)
    return out


def bench_kernel(kind, q, qlen, t, tlen, W=256, windows=3, iters=5,
                 pipe=4):
    """Time one kernel ('pallas'|'xla').  Returns dict with:
      pipelined_s: per-call time with `pipe` async calls in flight per
        fetch (how the production engine drives the device);
      sync_s: per-call time with a blocking fetch each call (includes
        the full tunnel round trip);
      window_means_s: pipelined per-call mean of each window (bursty-
        contention diagnostic; `pipelined_s` is the BEST window).
    """
    import jax
    import jax.numpy as jnp
    from falcon_tpu.utils.jaxinit import setup_jax
    setup_jax()

    if kind == "pallas":
        from falcon_tpu.ops.align_pallas import extend_batch_pallas
        args = (jnp.asarray(q.astype(np.int8)), jnp.asarray(qlen),
                jnp.asarray(t.astype(np.int8)), jnp.asarray(tlen))
        fn = lambda: extend_batch_pallas(*args, W=W, block_b=256)
    else:
        from falcon_tpu.ops.align_device import extend_batch_device
        args = (jnp.asarray(q.astype(np.int32)), jnp.asarray(qlen),
                jnp.asarray(t.astype(np.int32)), jnp.asarray(tlen))
        fn = lambda: extend_batch_device(*args, W=W)
    t0 = time.perf_counter()
    _ = jax.device_get(fn())  # compile (or cache hit) + force
    compile_s = time.perf_counter() - t0

    window_means = []
    for _w in range(windows):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(pipe)]
            _ = jax.device_get(outs)
            times.append((time.perf_counter() - t0) / pipe)
        window_means.append(float(np.mean(times)))
    # per-call sync latency (blocking fetch each call)
    sync_times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = jax.device_get(fn())
        sync_times.append(time.perf_counter() - t0)
    best = min(window_means)
    return {
        "pipelined_s": best,
        "sync_s": float(np.median(sync_times)),
        "window_means_s": [round(w, 4) for w in window_means],
        "window_cv": round(float(np.std(window_means) /
                                 np.mean(window_means)), 4),
        "compile_s": round(compile_s, 1),
    }


def bench_reference_c(q, qlen, t, tlen, max_pairs=8):
    """Time the reference C aligner (oracle .so) on a sample of the same
    pairs; returns bases/s or None."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        import oracle
        oracle.get_lib()
    except Exception:
        return None
    A = np.frombuffer(b"ACGT", np.uint8)
    total_bases = 0
    t0 = time.time()
    for b in range(min(max_pairs, len(qlen))):
        qs = A[np.minimum(q[b, :qlen[b]], 3)].tobytes()
        ts = A[np.minimum(t[b, :tlen[b]], 3)].tobytes()
        oracle.oracle_align(qs, ts, 256, False)
        total_bases += min(len(qs), len(ts))
    dt = time.time() - t0
    return total_bases / dt if dt > 0 else None


def mix_occupancy(genome_size=2_000_000, coverage=16):
    """Anti-diagonal occupancy of the extension path on a REAL e2e task
    mix: simulate a genome, run the overlap engine's seeding+chaining to
    get true extension candidates, and run the extender's cell
    accounting over their spec lengths (host-only; no device work).
    This is the occupancy bar VERDICT r3 asked bench.py to carry -- the
    synthetic B x L batch below is length-homogeneous and cannot see
    short-task padding."""
    try:
        from falcon_tpu.io import readstore
        from falcon_tpu.overlap import engine, table as T
        from falcon_tpu.ops.align_device import DeviceExtender
        from falcon_tpu.utils import sim
        genome = sim.random_genome(genome_size, seed=77)
        reads = sim.simulate_reads(genome, coverage=coverage,
                                   mean_len=9000, min_len=2000,
                                   error=0.08, seed=78, fast=True)
        store = readstore.ReadStore.from_seqs([s for _, s in reads])
        rids = np.arange(len(store), dtype=np.int64)
        params = engine.OverlapParams(k=14, min_hits=4,
                                      band_tolerance=250, stride=4,
                                      min_overlap=1000, min_idt=0.70)
        ext = DeviceExtender(W=256)
        cap_slack = ext.W // 2 + 8

        def capture(store_, index, rids_a, cands, params_):
            if not cands:
                return T.empty(0)
            c = np.asarray(cands, dtype=np.int64)
            qa, ta = c[:, 3], c[:, 4]
            a_len = store_.lengths[rids_a[c[:, 0]]].astype(np.int64)
            blen = index.lens[c[:, 1]].astype(np.int64)
            q_len = np.concatenate([a_len - qa, qa])
            t_len = np.concatenate([blen - ta, ta])
            cap = np.minimum(q_len, t_len) + cap_slack
            q_len = np.minimum(q_len, cap)
            t_len = np.minimum(t_len, cap)
            m = np.maximum(np.maximum(q_len, t_len), 1)
            Ls = ext._bucket_ladder(m)
            for L in np.unique(Ls):
                idxs = np.nonzero(Ls == L)[0]
                s = (q_len + t_len)[idxs]
                ext._account_cells(np.sort(s), ext._batch_for(int(L)),
                                   int(L))
            return T.empty(0)

        engine.overlap_blocks(store, rids, rids, params,
                              aligner=capture, same_block=True)
        return ext.occupancy()
    except Exception:
        return None


def bench_consensus_paths(genome_size=300_000, coverage=24, error=0.08):
    """Warm consensus throughput of both back-ends on one synthetic
    workload (bench_consensus.build_groups); returns the JSON fields for
    the headline record."""
    import io
    import time
    from bench_consensus import build_groups
    from falcon_tpu.cns.device import DeviceCns, run_consensus_device

    groups, cfg = build_groups(genome_size, coverage, error, seed=11)
    total_bases = sum(sum(len(s) for _, s, _ in items)
                      for _, items in groups)
    out = {}
    for label, use_dp in (("hostmsa", False), ("dp", True)):
        dev = DeviceCns(use_dp=use_dp)
        # warm with the FULL workload so no compiles pollute the window
        run_consensus_device(iter(groups), cfg, io.StringIO(), dev=dev)
        t0 = time.time()
        run_consensus_device(iter(groups), cfg, io.StringIO(), dev=dev)
        out["consensus_%s_bases_per_s" % label] = round(
            total_bases / (time.time() - t0), 1)
    best = max(("hostmsa", "dp"),
               key=lambda k: out["consensus_%s_bases_per_s" % k])
    out["consensus_support_bases_per_s"] = \
        out["consensus_%s_bases_per_s" % best]
    out["consensus_path"] = best
    out["consensus_support_bases"] = total_bases
    return out


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--no-consensus", action="store_true")
    p.add_argument("--cns-genome-size", type=int, default=300_000)
    args = p.parse_args()

    from falcon_tpu.utils.jaxinit import setup_jax
    setup_jax()

    B, L, W, err = 512, 8192, 256, 0.2
    q, qlen, t, tlen = make_pairs(B, L, err)
    bases = float(np.minimum(qlen, tlen).sum())
    cells = float(B) * 2.0 * L * W

    env_pre = probe_env()

    kernels = {}
    try:
        kernels["pallas"] = bench_kernel(
            "pallas", q, qlen, t, tlen, W=W,
            windows=args.windows, iters=args.iters)
    except Exception as e:  # mosaic is TPU-only; CPU runs use XLA
        kernels["pallas_error"] = repr(e)[:200]
    kernels["xla"] = bench_kernel(
        "xla", q, qlen, t, tlen, W=W,
        windows=args.windows, iters=args.iters)

    env_post = probe_env()

    # consensus throughput (VERDICT r4 #6: the driver's BENCH capture
    # was overlap-only, so consensus progress was invisible round over
    # round).  Same workload/methodology as bench_consensus.py at a
    # modest size: warm with the full workload (compiles out of the
    # timed window), then time both back-ends.
    cns = {}
    if not args.no_consensus:
        try:
            cns = bench_consensus_paths(args.cns_genome_size)
        except Exception as e:
            cns = {"consensus_error": repr(e)[:200]}

    ref_bps = bench_reference_c(q, qlen, t, tlen)
    if ref_bps is None:
        ref_bps = FALLBACK_C_BASES_PER_S

    # headline = best kernel's best quiet window (pipelined)
    best_kind = "pallas" if "pallas" in kernels else "xla"
    dt = kernels[best_kind]["pipelined_s"]
    if "pallas" in kernels and \
            kernels["xla"]["pipelined_s"] < dt:
        best_kind, dt = "xla", kernels["xla"]["pipelined_s"]
    dev_bps = bases / dt
    cells_per_s = cells / dt
    kind = chip_kind()
    vpu_peak = VPU_PEAK_OPS.get(kind)

    rec = {
        "metric": "overlap_align_bases_per_s_per_chip",
        "value": round(dev_bps, 1),
        "unit": "bases/s",
        "vs_baseline": round(dev_bps / ref_bps, 3),
        "kernel": best_kind,
        "cells_per_s": round(cells_per_s, 1),
        "chip": kind or "cpu",
        # methodology: value = best of N windows of `iters` pipelined
        # repeats; sync_bases_per_s = per-call latency incl. the tunnel
        # round-trip (the engine amortizes this by queuing batches)
        "n_windows": args.windows,
        "n_iters": args.iters,
        "sync_bases_per_s": round(bases / kernels[best_kind]["sync_s"], 1),
        "env_pre": env_pre,
        "env_post": env_post,
    }
    for k in ("pallas", "xla"):
        if k in kernels:
            rec[k + "_bases_per_s"] = round(
                bases / kernels[k]["pipelined_s"], 1)
            rec[k + "_window_means_s"] = kernels[k]["window_means_s"]
            rec[k + "_window_cv"] = kernels[k]["window_cv"]
            rec[k + "_compile_s"] = kernels[k]["compile_s"]
    if "pallas_error" in kernels:
        rec["pallas_error"] = kernels["pallas_error"]
    if vpu_peak:
        # fraction of the VPU integer roofline at ~12 ops/cell; and band
        # occupancy = useful cells (within the band of real, unmasked
        # pairs) over issued cells
        rec["mfu_vpu"] = round(cells_per_s * OPS_PER_CELL / vpu_peak, 4)
        rec["sol_cells_per_s"] = round(vpu_peak / OPS_PER_CELL, 1)
        util = float(np.minimum(qlen, tlen).sum()) * 2.0 * W / cells
        rec["band_occupancy"] = round(util, 4)
        occ = mix_occupancy()
        if occ:
            # anti-diagonal occupancy of a REAL e2e candidate mix
            # (short fwd/bwd extension tasks, ladder padding, tile
            # max_s granularity) -- the short-task-packing bar
            rec["mix_occupancy"] = round(occ, 4)
        # environment degradation flag: a capture where the trivial
        # reduce kernel runs far below this tunnel's HEALTHY level is a
        # contended tunnel/device, not a kernel property.  Healthy
        # levels measured 2026-08-21 (the day the 65.6M bases/s capture
        # was taken): reduce ~15 GB/s (dispatch-overhead-bound through
        # the tunnel, NOT chip HBM), d2h ~31 MB/s, rtt ~0.01 ms.
        degraded = (min(env_pre["reduce_gb_s"],
                        env_post["reduce_gb_s"]) < 3 or
                    min(env_pre["d2h_mb_s"], env_post["d2h_mb_s"]) < 8 or
                    max(env_pre["rtt_ms"], env_post["rtt_ms"]) > 20)
        rec["env_degraded"] = bool(degraded)
    rec.update(cns)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
