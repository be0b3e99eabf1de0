"""fc_hgap_adapt — adopt an external FALCON / HGAP4 run directory.

Reference: falcon_kit/mains/hgap4_adapt.py fakes a pypeflow run-dir
from an HGAP4 (pbsmrtpipe) job so the reference fc_run/fc_unzip see
every falcon task as already satisfied.  The falcon_tpu analog adopts
the *artifacts* instead of the task sentinels: it locates the key
stage products in an existing run tree (a reference fc_run dir, an
HGAP4 `job_output/tasks/` tree, or a falcon_tpu run dir) and links
them into a fresh falcon_tpu run directory, so `ftpu-run` resumes
downstream of whatever already exists (driver resume is by artifact
presence, pipeline/driver.py phase0/phase1).

Artifacts searched (first match by specificity, then shallowest):
  preads.fasta          0-rawreads consensus output (phase0 done)
                        [reference layout: 0-rawreads/preads/out.*.fasta
                        shards — concatenated]
  preads4falcon.fasta   DB2Falcon export (with preads.ovl: phase1 done)
  preads.ovl            filtered pread overlaps
  length_cutoff         seed cutoff record (optional)
"""
import argparse
import fnmatch
import logging
import os
import sys

LOG = logging.getLogger(__name__)


def _walk_matches(root, pattern):
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fn in sorted(fnmatch.filter(filenames, pattern)):
            out.append(os.path.join(dirpath, fn))
    # shallowest (fewest path components) first
    out.sort(key=lambda p: (p.count(os.sep), p))
    return out


def _link(src, dst):
    src = os.path.abspath(src)
    if os.path.lexists(dst):
        os.unlink(dst)
    os.symlink(src, dst)
    LOG.info("adopt: %s -> %s", dst, src)


def _concat(srcs, dst):
    with open(dst + ".tmp", "w") as out:
        for s in srcs:
            with open(s) as f:
                for chunk in iter(lambda: f.read(1 << 20), ""):
                    out.write(chunk)
    os.rename(dst + ".tmp", dst)
    LOG.info("adopt: %s <- concat of %d shards", dst, len(srcs))


def adapt(job_dir, out_dir):
    """Build a falcon_tpu run dir under out_dir from artifacts found in
    job_dir.  Returns the set of phases satisfied ({0}, {0,1} or {})."""
    dir0 = os.path.join(out_dir, "0-rawreads")
    dir1 = os.path.join(out_dir, "1-preads_ovl")
    dir2 = os.path.join(out_dir, "2-asm-falcon")
    for d in (dir0, dir1, dir2):
        os.makedirs(d, exist_ok=True)
    satisfied = set()

    # phase 0 product: consensus preads FASTA.  Search order: a direct
    # preads.fasta; the reference's gather FOFN
    # (0-rawreads/preads/input_preads.fofn, run1.py:452); per-task
    # consensus shards (cns_%05d.fasta pype_tasks.py:518-520,
    # consensus.*.fasta / out.*.fasta across reference versions)
    preads = _walk_matches(job_dir, "preads.fasta")
    if preads:
        _link(preads[0], os.path.join(dir0, "preads.fasta"))
        satisfied.add(0)
    else:
        shards = []
        for fofn_pat in ("input_preads.fofn", "preads.fofn"):
            fofns = _walk_matches(job_dir, fofn_pat)
            if fofns:
                base = os.path.dirname(fofns[0])
                with open(fofns[0]) as f:
                    entries = [ln.strip() for ln in f if ln.strip()]
                # The reference's consensus_gather_fasta_fofn.py writes
                # ABSOLUTE paths, so a copied/archived run tree yields
                # stale entries.  Resolve each: relative entries join
                # with the FOFN dir; stale absolute entries retry by
                # basename next to the FOFN.  Any unresolvable entry
                # invalidates the FOFN (fall through to the globs).
                resolved = []
                for e in entries:
                    cand = e if os.path.isabs(e) else os.path.join(base, e)
                    if not os.path.isfile(cand):
                        cand = os.path.join(base, os.path.basename(e))
                    if not os.path.isfile(cand):
                        LOG.warning(
                            "adopt: FOFN entry %r not found (stale "
                            "path?); ignoring %s", e, fofns[0])
                        resolved = None
                        break
                    resolved.append(cand)
                if resolved:
                    shards = resolved
                    break
        if not shards:
            for pat in ("out.*.fasta", "cns_*.fasta", "consensus.*.fasta"):
                shards = [p for p in _walk_matches(job_dir, pat)
                          if "rawreads" in p or "preads" in p or "cns" in p]
                if shards:
                    break
        if shards:
            _concat(shards, os.path.join(dir0, "preads.fasta"))
            satisfied.add(0)

    cutoff = _walk_matches(job_dir, "length_cutoff")
    if cutoff:
        _link(cutoff[0], os.path.join(dir0, "length_cutoff"))

    # phase 1 products: preads4falcon.fasta + filtered preads.ovl
    p4f = _walk_matches(job_dir, "preads4falcon.fasta")
    povl = _walk_matches(job_dir, "preads.ovl")
    if p4f and povl:
        _link(p4f[0], os.path.join(dir2, "preads4falcon.fasta"))
        _link(povl[0], os.path.join(dir1, "preads.ovl"))
        satisfied.add(1)
    return satisfied


def main(argv=None):
    argv = argv if argv is not None else sys.argv
    p = argparse.ArgumentParser(
        description="Adopt an external FALCON/HGAP4 run directory: link "
                    "its stage artifacts into a falcon_tpu run dir so "
                    "ftpu-run resumes downstream of them.")
    p.add_argument("--job-output", required=True,
                   help="existing run tree (fc_run dir, HGAP4 job_output, "
                        "or falcon_tpu run dir)")
    p.add_argument("--out", default=".",
                   help="falcon_tpu run directory to create [.]")
    args = p.parse_args(argv[1:])
    logging.basicConfig(level=logging.INFO)
    if not os.path.isdir(args.job_output):
        p.error("not a directory: %r" % args.job_output)
    satisfied = adapt(args.job_output, args.out)
    if not satisfied:
        LOG.warning("no adoptable artifacts found under %r",
                    args.job_output)
        return 1
    LOG.info("phases satisfied: %s", sorted(satisfied))
    return 0


if __name__ == "__main__":
    sys.exit(main())
