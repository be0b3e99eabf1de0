"""End-to-end wall-clock benchmark: simulated genome -> p_ctg.

Runs the full pipeline (overlap -> consensus -> pread overlap -> graph ->
contigs) on a freshly simulated dataset and reports wall-clock plus
assembly quality vs the known truth.  This is the "beat the multicore
reference pipeline" scenario from BASELINE.md; scale via --genome-size
(E. coli scale = 4600000).

Usage: python bench_e2e.py [--genome-size N] [--coverage C] [--out DIR]
"""
import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--genome-size", type=int, default=1_000_000)
    p.add_argument("--coverage", type=float, default=24)
    p.add_argument("--error", type=float, default=0.08)
    p.add_argument("--mean-len", type=int, default=9000)
    p.add_argument("--out", default="/tmp/ftpu_bench_e2e")
    p.add_argument("--keep", action="store_true")
    p.add_argument("--no-device", action="store_true")
    p.add_argument("--block-mb", type=int, default=200,
                   help="DBsplit -s block size (reference fc_run_dmel.cfg"
                        " uses 400 at Dmel scale)")
    p.add_argument("--repeats", type=int, default=1,
                   help="warm pipeline re-runs; reports per-phase "
                        "median/best/spread so round-over-round deltas "
                        "are attributable (VERDICT r3 weak #5: best-of "
                        "runs hid a 25%% spread)")
    p.add_argument("--supervise", action="store_true",
                   help="run each rep through pipeline.supervise "
                        "(automatic worker recycling + stall recovery); "
                        "required discipline for >=100Mb runs")
    p.add_argument("--rss-limit-gb", type=float, default=32.0)
    p.add_argument("--stall-min", type=float, default=45.0,
                   help="supervisor stall-detector window (minutes)")
    p.add_argument("--resume", action="store_true",
                   help="keep an existing --out dir and resume its run0 "
                        "from checkpoints instead of wiping it")
    args = p.parse_args()

    import logging
    logging.basicConfig(
        level=logging.INFO, stream=sys.stderr,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")

    from falcon_tpu.io import fasta
    from falcon_tpu.pipeline.driver import Pipeline
    from falcon_tpu.utils import sim

    # abspath BEFORE chdir: a relative --out re-joined after the chdir
    # below would nest the run dir inside itself (out/out/run0)
    out = os.path.abspath(args.out)
    if os.path.isdir(out) and not args.resume:
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    os.chdir(out)

    t0 = time.time()
    if args.resume and os.path.exists("raw_reads.fa"):
        n_bases = sum(len(r.sequence)
                      for r in fasta.read_fasta("raw_reads.fa"))
        print("resume: reusing existing raw_reads.fa (%.1f Mbases)" %
              (n_bases / 1e6), file=sys.stderr)
    else:
        genome = sim.random_genome(args.genome_size, seed=101)
        reads = sim.simulate_reads(genome, coverage=args.coverage,
                                   mean_len=args.mean_len, min_len=2000,
                                   error=args.error, seed=102, fast=True)
        fasta.write_fasta("raw_reads.fa", reads, width=0)
        with open("genome.txt", "w") as f:
            f.write(genome)     # truth for tools/check_assembly.py
        n_bases = sum(len(s) for _, s in reads)
        t_sim = time.time() - t0
        print("simulated %d reads, %.1f Mbases in %.0fs" %
              (len(reads), n_bases / 1e6, t_sim), file=sys.stderr)

    with open("input.fofn", "w") as f:
        f.write("raw_reads.fa\n")
    with open("fc_run.cfg", "w") as f:
        f.write("""[General]
input_fofn = input.fofn
input_type = raw
use_device = %s
genome_size = %d
seed_coverage = 20
length_cutoff = -1
length_cutoff_pr = 2000
pa_DBsplit_option = -x500 -s%d
ovlp_DBsplit_option = -x500 -s%d
pa_HPCdaligner_option = -v -e.70 -l1000
ovlp_HPCdaligner_option = -v -e.96 -l500
falcon_sense_option = --output-multi --min-idt 0.70 --min-cov 2 --max-n-read 400
overlap_filtering_setting = --max-diff 120 --max-cov 120 --min-cov 2
""" % ("false" if args.no_device else "true",
           args.genome_size, args.block_mb, args.block_mb))

    walls = []
    runs = []
    p_ctg = None
    for rep in range(max(1, args.repeats)):
        run_dir = os.path.join(out, "run%d" % rep)
        os.makedirs(run_dir, exist_ok=True)
        t1 = time.time()
        if args.supervise:
            from falcon_tpu.pipeline import supervise as sup
            rc = sup.supervise(
                os.path.abspath("fc_run.cfg"), run_dir,
                rss_limit_gb=args.rss_limit_gb,
                stall_min=args.stall_min)
            if rc != 0:
                print("supervised run FAILED (rc=%d)" % rc,
                      file=sys.stderr)
                return 1
            p_ctg = os.path.join(run_dir, "2-asm-falcon", "p_ctg.fa")
            timings = {}
            tj = os.path.join(run_dir, "timings.json")
            if os.path.exists(tj):
                # per-incarnation timings of the LAST child; the outer
                # wall below is the authoritative number
                timings = json.load(open(tj))
        else:
            pipe = Pipeline("fc_run.cfg", run_dir,
                            use_device=(not args.no_device))
            p_ctg = pipe.run()
            timings = dict(pipe.timings)
        walls.append(time.time() - t1)
        runs.append(timings)
        print("run %d: %.1fs %s" % (
            rep, walls[-1],
            {k: round(v, 1) for k, v in runs[-1].items()}),
            file=sys.stderr)
        if rep + 1 < args.repeats:
            shutil.rmtree(run_dir)   # fresh artifacts; warm jit caches

    def stats(vals):
        v = sorted(vals)
        med = v[len(v) // 2] if len(v) % 2 else \
            0.5 * (v[len(v) // 2 - 1] + v[len(v) // 2])
        return {"median": round(med, 1), "best": round(v[0], 1),
                "worst": round(v[-1], 1)}

    ctgs = sorted((len(r.sequence) for r in fasta.read_fasta(p_ctg)),
                  reverse=True)
    covered = sum(ctgs)
    phase_stats = {}
    for k in runs[-1]:
        vals = [r[k] for r in runs if k in r]
        if vals and isinstance(vals[0], (int, float)):
            phase_stats[k] = stats(vals)
    w = stats(walls)
    result = {
        "metric": "e2e_raw_to_p_ctg_wall_s",
        "value": w["median"],
        "unit": "s",
        "wall_best_s": w["best"],
        "wall_worst_s": w["worst"],
        "n_runs": len(walls),
        "genome_size": args.genome_size,
        "raw_bases": n_bases,
        "n_contigs": len(ctgs),
        "largest_contig": ctgs[0] if ctgs else 0,
        "contig_bases": covered,
        "timings": {k: round(v, 1) for k, v in runs[-1].items()},
        "phase_stats": phase_stats,
    }
    print(json.dumps(result))
    if not args.keep:
        pass  # leave artifacts for inspection; dir is in /tmp
    return 0


if __name__ == "__main__":
    sys.exit(main())
