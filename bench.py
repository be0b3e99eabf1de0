"""Benchmark: overlap-extension alignment throughput on one chip.

Measures the assembler's FLOP-dominant kernel -- batched banded overlap
extension (falcon_tpu.ops.align_device) -- on realistic noisy long-read
pairs, and reports aligned bases/second on the current accelerator.

vs_baseline: ratio against the reference implementation's aligner (the
banded O(ND) C kernel from /root/reference/src/c/DW_banded.c, compiled
out-of-tree and timed on the same pairs on one host core).  If the
reference checkout is unavailable, a previously measured constant for this
host is used.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
# The extension kernel is VPU-bound (int32 elementwise min/add/select over
# [block_b, W] wavefront tiles; no matmuls).  Speed of light is therefore the
# VPU integer issue rate, not the MXU:
#   v5e TensorCore clock ~1.5GHz (197e12 bf16 FLOP/s / (4 MXUs*128*128*2));
#   VPU = 8 sublanes x 128 lanes x 4 ALUs -> ~6.1e12 int ops/s.
# Per DP cell the kernel's fast path issues ~12 VPU ops (2 min + 2 add for
# the recurrence, sub-cost d*d+min, 4 compare/and for the validity mask,
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
        import os
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        return gen if gen in VPU_PEAK_OPS else "v5e"
    return None


def bench_device(q, qlen, t, tlen, W=256, iters=3):
    import jax
    import jax.numpy as jnp
    from falcon_tpu.utils.jaxinit import setup_jax
    setup_jax()

    # The XLA kernel's executables hit the persistent compile cache
    # across processes on this runtime; the pallas kernel (~3x faster at
    # steady state) recompiles per process, so use it only when asked.
    import os
    if os.environ.get("FTPU_USE_PALLAS") == "1":
        from falcon_tpu.ops.align_pallas import extend_batch_pallas
        args = (jnp.asarray(q.astype(np.int8)), jnp.asarray(qlen),
                jnp.asarray(t.astype(np.int8)), jnp.asarray(tlen))
        fn = lambda: extend_batch_pallas(*args, W=W, block_b=256)
    else:
        from falcon_tpu.ops.align_device import extend_batch_device
        args = (jnp.asarray(q.astype(np.int32)), jnp.asarray(qlen),
                jnp.asarray(t.astype(np.int32)), jnp.asarray(tlen))
        fn = lambda: extend_batch_device(*args, W=W)
    import jax
    _ = jax.device_get(fn())  # compile (or cache hit) + force
    # Two timings per repeat: pipelined (async-queue `pipe` calls, one
    # batched fetch -- how the production engine drives the device) and
    # per-call latency including the sync round-trip.  On a tunneled
    # chip the sync RTT (~40ms) would otherwise dominate the kernel.
    pipe = 4
    times = []
    for _ in range(iters):
        t0 = time.time()
        outs = [fn() for _ in range(pipe)]
        _ = jax.device_get(outs)
        times.append((time.time() - t0) / pipe)
    bases = float(np.minimum(qlen, tlen).sum())
    return bases, times


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


def main():
    import argparse
    import subprocess
    p = argparse.ArgumentParser()
    p.add_argument("--kernel", choices=("auto", "pallas", "xla"),
                   default="auto")
    args = p.parse_args()

    if args.kernel == "auto":
        # The pallas kernel is ~3-4x the XLA scan but must recompile in
        # every process (its executables bypass the persistent cache on
        # this runtime).  Try it in a time-boxed subprocess; fall back to
        # the reliably-cached XLA kernel.
        env = dict(os.environ, FTPU_USE_PALLAS="1")
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--kernel", "pallas"],
                env=env, capture_output=True, timeout=540, text=True)
            if out.returncode == 0 and out.stdout.strip():
                print(out.stdout.strip().splitlines()[-1])
                return
        except subprocess.TimeoutExpired:
            pass

    B, L, W, err = 512, 8192, 256, 0.2
    q, qlen, t, tlen = make_pairs(B, L, err)
    # methodology: 1 warmup (compile/cache), n=5 timed repeats on the same
    # resident arrays; report mean and run-to-run CV (see BASELINE.md)
    bases, times = bench_device(q, qlen, t, tlen, W=W, iters=5)
    dt = float(np.mean(times))
    cv = float(np.std(times) / dt) if dt > 0 else 0.0
    dev_bps = bases / dt
    ref_bps = bench_reference_c(q, qlen, t, tlen)
    if ref_bps is None:
        ref_bps = FALLBACK_C_BASES_PER_S
    # roofline: the kernel computes 2*L anti-diagonals x W lanes per pair
    # (every lane of every step, masked or not, costs VPU issue slots)
    cells = float(B) * 2.0 * L * W
    cells_per_s = cells / dt
    kind = chip_kind()
    vpu_peak = VPU_PEAK_OPS.get(kind)
    rec = {
        "metric": "overlap_align_bases_per_s_per_chip",
        "value": round(dev_bps, 1),
        "unit": "bases/s",
        "vs_baseline": round(dev_bps / ref_bps, 3),
        "kernel": "pallas" if os.environ.get("FTPU_USE_PALLAS") == "1"
        else "xla",
        "cells_per_s": round(cells_per_s, 1),
        "run_cv": round(cv, 4),
        "n_runs": len(times),
        "chip": kind or "cpu",
    }
    if vpu_peak:
        # fraction of the VPU integer roofline at ~12 ops/cell; and band
        # occupancy = useful cells (within the band of real, unmasked
        # pairs) over issued cells
        rec["mfu_vpu"] = round(cells_per_s * OPS_PER_CELL / vpu_peak, 4)
        rec["sol_cells_per_s"] = round(vpu_peak / OPS_PER_CELL, 1)
        util = float(np.minimum(qlen, tlen).sum()) * 2.0 * W / cells
        rec["band_occupancy"] = round(util, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
