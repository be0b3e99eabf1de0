"""Benchmark: consensus (pread generation) throughput vs the reference
C kernel (falcon.c generate_consensus, compiled out-of-tree from
/root/reference and driven the way fc_consensus drives it: a process
pool over seed groups, reference consensus.py:264-274).

Compares, on identical gated seed groups:
  reference   multiprocessing Pool(n_core) x ctypes generate_consensus
  falcon_tpu  device consensus engine (TPU alignment+traceback batches,
              exact MSA/DP on host; cns.device)

Prints one JSON line: consensus bases/s for each path and the speedup.
Usage: python bench_consensus.py [--genome-size N] [--coverage C]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_groups(genome_size, coverage, error, seed):
    from falcon_tpu.utils import sim
    from falcon_tpu.cns import runner
    genome = sim.random_genome(genome_size, seed=seed)
    reads = sim.simulate_reads(genome, coverage=coverage, mean_len=9000,
                               min_len=2000, error=error, seed=seed + 1)
    # emulate the driver's seed grouping cheaply: every read above the
    # cutoff is a seed; supports = reads overlapping its simulated span.
    # sim.simulate_reads returns (name, seq); recover spans by re-locating
    # is overkill -- instead simulate explicit groups:
    import numpy as np
    rng = np.random.RandomState(seed + 2)
    cfg = runner.ConsensusConfig(min_cov=2, min_idt=0.70, min_n_read=4,
                                 min_cov_aln=4, max_n_read=40,
                                 output_multi=False)
    groups = []
    g = np.frombuffer(genome.encode(), np.uint8)
    n_groups = max(4, genome_size // 12000)
    for k in range(n_groups):
        s = rng.randint(0, max(1, len(g) - 14000))
        ln = rng.randint(8000, 14000)
        tmpl = g[s:s + ln]
        seed_seq = sim.mutate(tmpl, rng, error / 3, error / 3,
                              error / 3).tobytes().decode()
        items = [("%09d" % (k * 100), seed_seq, None)]
        for si in range(int(coverage)):
            sup = sim.mutate(tmpl, rng, error / 3, error / 3,
                             error / 3).tobytes().decode()
            items.append(("%09d" % (k * 100 + si + 1), sup,
                          (0, len(sup), 0, len(seed_seq))))
        groups.append(("%09d" % (k * 100), items))
    return groups, cfg


def _ref_one(args):
    seqs, min_cov, K, min_idt = args
    from tests.oracle import oracle_generate_consensus
    return oracle_generate_consensus(seqs, min_cov, K, min_idt)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--genome-size", type=int, default=300_000)
    p.add_argument("--coverage", type=float, default=24)
    p.add_argument("--error", type=float, default=0.08)
    p.add_argument("--n-core", type=int, default=os.cpu_count() or 2)
    p.add_argument("--paths", default="hostmsa,dp",
                   help="comma list of device back-ends to time "
                        "(hostmsa,dp); trims the window for A/B runs "
                        "of one back-end under env-flag variants")
    p.add_argument("--skip-ref", action="store_true",
                   help="skip the reference C pool (A/B runs where the "
                        "device delta is the question)")
    args = p.parse_args()

    groups, cfg = build_groups(args.genome_size, args.coverage,
                               args.error, seed=11)
    total_bases = sum(sum(len(s) for _, s, _ in items)
                      for _, items in groups)
    print("groups: %d, support bases: %.1fM" %
          (len(groups), total_bases / 1e6), file=sys.stderr)

    # -- reference: C kernel via process pool (fc_consensus shape) -------
    if args.skip_ref:
        t_ref, ref_cns = float("nan"), 0
    else:
        from multiprocessing import Pool
        jobs = [([s for _, s, _ in items], cfg.min_cov, 8, cfg.min_idt)
                for _, items in groups]
        t0 = time.time()
        with Pool(args.n_core) as pool:
            ref_out = pool.map(_ref_one, jobs)
        t_ref = time.time() - t0
        ref_cns = sum(len(c or "") for c in ref_out)

    # -- falcon_tpu device engine: both consensus back-ends --------------
    # host-msa: device align+traceback, C++ MSA/DP on host (default);
    # device-dp: MSA+DP+backtrack on chip (FTPU_CNS_DP=1 path)
    import io
    from falcon_tpu.cns.device import DeviceCns, run_consensus_device
    want = set(args.paths.split(","))
    paths = {}
    for label, use_dp in (("hostmsa", False), ("dp", True)):
        if label not in want:
            continue
        dev = DeviceCns(use_dp=use_dp)
        out = io.StringIO()
        # warm with the FULL workload: a subset misses the larger
        # (L, B, T, G) batch shapes and their compiles then pollute the
        # timed window (round-4 methodology fix)
        t0 = time.time()
        run_consensus_device(iter(groups), cfg, io.StringIO(), dev=dev)
        t_warm = time.time() - t0
        t0 = time.time()
        n = run_consensus_device(iter(groups), cfg, out, dev=dev)
        t_dev = time.time() - t0
        dev_cns = sum(len(l) for l in out.getvalue().splitlines()
                      if not l.startswith(">"))
        paths[label] = (t_dev, dev_cns, n, t_warm)

    t_dev = min(t for t, _, _, _ in paths.values())
    best = [k for k, v in paths.items() if v[0] == t_dev][0]
    print(json.dumps({
        "metric": "consensus_bases_per_s",
        "value": round(total_bases / t_dev, 1),
        "unit": "support-bases/s",
        "vs_baseline": round(t_ref / t_dev, 3),
        "ref_bases_per_s": round(total_bases / t_ref, 1),
        "ref_wall_s": round(t_ref, 1),
        "dev_wall_s": round(t_dev, 1),
        "best_path": best,
        **{"%s_bases_per_s" % k: round(total_bases / v[0], 1)
           for k, v in paths.items()},
        **{"%s_warm_wall_s" % k: round(v[3], 1)
           for k, v in paths.items()},
        "n_core_ref": args.n_core,
        "ref_cns_bases": ref_cns,
        "dev_cns_bases": paths[best][1],
        "n_groups_dev": paths[best][2],
    }))


if __name__ == "__main__":
    main()
