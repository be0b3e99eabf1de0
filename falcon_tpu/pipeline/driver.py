"""Pipeline driver: raw reads -> preads -> string graph -> contigs + GFA.

The fc_run replacement (reference: falcon_kit/mains/run1.py + the pypeFLOW
task DAG + generated bash, falcon_kit/pype_tasks.py).  Where the reference
runs a file-based task DAG across a cluster, this driver runs three
in-process phases with artifact checkpointing -- the filesystem layout
mirrors the reference (0-rawreads/, 1-preads_ovl/, 2-asm-falcon/,
reference: run1.py:176-178) and resume works by artifact presence
(reference: SURVEY.md section 5 checkpoint/resume).

Usage:  python -m falcon_tpu.pipeline.driver fc_run.cfg
"""
import logging
import os
import sys
import time

import numpy as np

from .. import config as config_mod
from ..cns import runner as cns_runner
from ..graph import to_contig, unitigs
from ..graph.collect_gfa import collect_contig_gfa, collect_pread_gfa
from ..graph.gfa import deserialize_gfa
from ..io import fasta, integrity, readstore
from ..ops import native as native_ops
from ..overlap import engine, filter as ofilter, records
from ..overlap import table as otable
from ..utils import system
from . import stats as stats_mod

LOG = logging.getLogger(__name__)


def _done(path):
    return os.path.exists(path)


def _resumable(path, what):
    """Artifact-presence resume + integrity gate (the LAcheck analog,
    io.integrity): present AND not failing its sidecar check."""
    return os.path.exists(path) and integrity.check_resume(path, what)


class Pipeline:
    def __init__(self, cfg_path, out_dir=".", use_device=None):
        # multi-host participation must be decided and initialized BEFORE
        # any other JAX call (jax.distributed.initialize refuses to run
        # once the backends are up); single-host runs skip this entirely
        from ..parallel import distributed
        if distributed.want_distributed():
            distributed.init_distributed()
        self.cfg = config_mod.parse_cfg_file(cfg_path)
        self.p = config_mod.StageParams(self.cfg)
        if use_device is not None:
            self.p.use_device = use_device
        self.out_dir = os.path.abspath(out_dir)
        self.dir0 = os.path.join(self.out_dir, "0-rawreads")
        self.dir1 = os.path.join(self.out_dir, "1-preads_ovl")
        self.dir2 = os.path.join(self.out_dir, "2-asm-falcon")
        for d in (self.dir0, self.dir1, self.dir2):
            os.makedirs(d, exist_ok=True)
        self.timings = {}
        # batch-level liveness ticks for the supervisor's stall detector
        # (device batch loops beat between durable checkpoints)
        system.set_heartbeat_dir(self.out_dir)

    # -- helpers -----------------------------------------------------------
    def _engine_params(self, stage):
        p = self.p
        if stage == 0:
            return engine.OverlapParams(
                k=p.overlap_k, min_hits=p.overlap_min_hits,
                band_tolerance=p.overlap_band, stride=p.overlap_stride,
                min_overlap=p.raw_ovl_minlen, min_idt=p.raw_ovl_idt)
        # preads are ~99.9%% identical: sparse seeding suffices
        return engine.OverlapParams(
            k=p.overlap_k, min_hits=p.overlap_min_hits,
            band_tolerance=p.overlap_band, stride=p.overlap_stride_pr,
            min_overlap=p.pr_ovl_minlen, min_idt=p.pr_ovl_idt)

    def _aligner(self):
        if self.p.use_device:
            try:
                import jax
                from ..utils.jaxinit import setup_jax
                setup_jax()
                jax.devices()  # force backend init; may raise if the chip
                # is held by another process
                # W is the edit-band width of the extension DP (drift
                # tolerance W/2), not the greedy band_tolerance; 256
                # covers read-vs-read indel drift and keeps one compiled
                # kernel shape per length bucket
                return engine.make_device_aligner(W=256)
            except Exception as e:  # no usable device: host fallback
                LOG.warning("device aligner unavailable (%s); using host", e)
        return None

    def _overlap_store(self, store, params, tag, ckpt_dir=None):
        """All-vs-all overlap across the store's blocks; returns the
        symmetric columnar overlap table (the .las-merge equivalent,
        in RAM as ONE structured array -- see overlap.table).

        Multi-host: each process runs its round-robin stripe of the
        block-pair triangle on its local devices, then ONE raw-byte
        all-gather recombines the table on every host
        (parallel.distributed; the reference's per-pair cluster jobs +
        LAmerge tree, falcon_kit/mains/dazzler.py:559-574, collapsed to
        a collective).  The canonical full-field sort makes the gathered
        table identical to a single-host run's.
        """
        from ..parallel import distributed
        blocks = store.blocks or store.split_blocks()
        aligner = self._aligner()
        chunks = []
        host_id, n_hosts = distributed.init_distributed()
        pairs = distributed.host_block_pairs(len(blocks), host_id, n_hosts)
        n_pairs = len(blocks) * (len(blocks) + 1) // 2
        # Group this host's stripe by B block: the B-side k-mer tables
        # (the dominant per-pair host cost at Dmel scale -- pack + radix
        # sort of every position, both strands) are built once per block
        # and reused across all its pairs.  A-side views are smaller
        # (stride-4 tables) and kept in a small LRU.  Output is
        # order-independent: chunks are canonically re-sorted in
        # emit_symmetric.
        pairs = sorted(pairs, key=lambda ij: (ij[1], ij[0]))
        # snake the A direction on alternate B stripes: with more than
        # AVIEW_LRU A blocks per stripe, ascending order every stripe
        # makes LRU evict exactly the entry needed next (ADVICE r4) --
        # the snake re-meets the previous stripe's tail A blocks first
        stripes = []
        for pr in pairs:
            if not stripes or pr[1] != stripes[-1][-1][1]:
                stripes.append([])
            stripes[-1].append(pr)
        pairs = []
        for si, stripe in enumerate(stripes):
            pairs.extend(stripe if si % 2 == 0 else reversed(stripe))
        # per-pair durable checkpoints (the reference's per-block .las
        # files): a recycled/killed worker skips finished pairs on
        # restart instead of redoing the 60+ minute triangle
        pair_dir = os.path.join(ckpt_dir, tag + "_pairs") if ckpt_dir \
            else None
        if pair_dir:
            os.makedirs(pair_dir, exist_ok=True)
        results = {}
        todo = []
        for k, (i, j) in enumerate(pairs):
            pf = os.path.join(pair_dir, "p%04d_%04d.npy" % (i, j)) \
                if pair_dir else None
            if pf and os.path.exists(pf):
                results[k] = np.load(pf)
                LOG.info("%s: block (%d,%d) %d/%d: %d overlaps "
                         "(checkpointed)", tag, i, j, k + 1, len(pairs),
                         len(results[k]))
            else:
                todo.append((k, i, j, pf))

        # chain/align software pipeline: the host seeding+chain of pair
        # n+1 runs under the device alignment of pair n (disjoint
        # resources: host cores vs the chip; at 100Mb scale each stage
        # is minutes per heavy pair, so serializing them doubled phase-0
        # wall).  prep_state is only touched from the single prepare
        # thread (submissions are sequential).  Peak RSS now holds up to
        # TWO BlockIndex table sets at a stripe boundary by design (the
        # align stage pins the old index while the next stripe's
        # builds); within a stripe the old index is dropped before the
        # next is built.
        from concurrent.futures import ThreadPoolExecutor
        prep_state = {"j": -1, "index": None, "aviews": {}}
        AVIEW_LRU = 4

        def prepare(i, j):
            if j != prep_state["j"]:
                prep_state["index"] = None
                prep_state["index"] = engine.BlockIndex(
                    store, blocks[j], params,
                    build_tables=not native_ops.available())
                prep_state["j"] = j
            aviews = prep_state["aviews"]
            if i not in aviews:
                if len(aviews) >= AVIEW_LRU:
                    aviews.pop(next(iter(aviews)))
                aviews[i] = engine.AView(store, blocks[i], params)
            else:
                aviews[i] = aviews.pop(i)     # refresh LRU order
            # the (j, i) comparison is implied by symmetry
            cands, idx, (t_index, t_chain) = engine.chain_blocks(
                store, blocks[i], blocks[j], params,
                same_block=(i == j), index=prep_state["index"],
                a_view=aviews[i])
            return cands, idx, t_index, t_chain

        # prefetching only pays when alignment runs on the device; the
        # host aligner would fight the chain threads for the same cores
        prefetch = aligner is not None and \
            os.environ.get("FTPU_PIPELINE_CHAIN", "1") != "0"
        with ThreadPoolExecutor(1) as prep_exec:
            fut = None
            for n, (k, i, j, pf) in enumerate(todo):
                t0 = time.time()
                if fut is None:
                    fut = prep_exec.submit(prepare, i, j)
                cands, idx, t_index, t_chain = fut.result()
                fut = None
                if prefetch and n + 1 < len(todo):
                    fut = prep_exec.submit(
                        prepare, todo[n + 1][1], todo[n + 1][2])
                t1 = time.time()
                ovls = engine.align_candidates(
                    store, idx, blocks[i], cands, params, aligner)
                results[k] = ovls
                LOG.info(
                    "%s: block (%d,%d) %d/%d of %d: %d cands -> %d "
                    "overlaps; index %.1fs chain %.1fs align %.1fs "
                    "(pair wall %.1fs)", tag, i, j, k + 1, len(pairs),
                    n_pairs, len(cands), len(ovls), t_index, t_chain,
                    time.time() - t1, time.time() - t0)
                if pf:
                    np.save(pf + ".tmp.npy", ovls)
                    os.replace(pf + ".tmp.npy", pf)
                    system.touch_heartbeat(self.out_dir)
                    system.maybe_recycle(self.out_dir, tag + " overlap")
        prep_state.clear()
        chunks = [results[k] for k in range(len(pairs))]
        tbl = otable.concat(chunks)
        occ = getattr(aligner, "ext", None) and aligner.ext.occupancy()
        if occ:
            # anti-diagonal occupancy over every batch of this phase
            # (useful vs charged DP sweep; ops.align_device accounting)
            self.timings["%s_occupancy" % tag] = round(occ, 4)
        if n_hosts > 1:
            tbl = distributed.allgather_table(tbl)
        return engine.emit_symmetric(tbl)

    @staticmethod
    def _drop_pair_ckpts(ckpt_dir, tag):
        """Per-pair checkpoints are subsumed by the phase's final table;
        drop them once that table is durable."""
        import shutil
        d = os.path.join(ckpt_dir, tag + "_pairs")
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)

    # -- phase 0: raw reads -> preads --------------------------------------
    def phase0(self):
        preads_fn = os.path.join(self.dir0, "preads.fasta")
        if _resumable(preads_fn, "phase0 preads"):
            LOG.info("phase0: %s exists; skipping", preads_fn)
            return preads_fn
        t_start = time.time()
        p = self.p
        system.touch_heartbeat(self.out_dir)

        store_fn = os.path.join(self.dir0, "raw_reads")
        if _resumable(store_fn + ".npz", "phase0 readstore"):
            store = readstore.ReadStore.load(store_fn)
        else:
            fofn = self.cfg["input_fofn"]
            paths = fasta.read_fofn(fofn) if fofn.endswith(".fofn") \
                else [fofn]
            store = readstore.ReadStore.from_fasta_files(
                paths, min_len=p.raw_min_len)
            if p.mask_dust or p.mask_tandem:
                # dust/tandem soft-mask tracks (DBdust + TANmask roles)
                t_mask = time.time()
                store.build_masks(dust=p.mask_dust, tandem=p.mask_tandem)
                self.timings["phase0_masking"] = time.time() - t_mask
            store.split_blocks(int(p.raw_block_mb * 1e6))
            store.save(store_fn)
            integrity.write_sidecar(store_fn + ".npz", rows=len(store))
            system.touch_heartbeat(self.out_dir)
        LOG.info("phase0: %d raw reads, %d bases, %d blocks",
                 len(store), store.total_bases, len(store.blocks))

        # seed length cutoff (reference: functional.calc_cutoff via
        # DBstats histogram; -H semantics)
        if p.length_cutoff >= 0:
            cutoff = p.length_cutoff
        else:
            cutoff = store.calc_length_cutoff(p.seed_coverage, p.genome_size)
        LOG.info("phase0: seed length cutoff %d", cutoff)
        with open(os.path.join(self.dir0, "length_cutoff"), "w") as f:
            f.write(str(cutoff) + "\n")

        ovl_fn = os.path.join(self.dir0, "raw_overlaps.ovl")
        if _resumable(ovl_fn, "phase0 overlap table"):
            # resume: the overlap table is phase0's mid-phase checkpoint
            LOG.info("phase0: %s exists; skipping overlap", ovl_fn)
            recs = otable.read_table(ovl_fn)
            self.timings["phase0_overlap"] = 0.0
        else:
            recs = self._overlap_store(store, self._engine_params(0),
                                       "phase0", ckpt_dir=self.dir0)
            self.timings["phase0_overlap"] = time.time() - t_start
            otable.write_table(ovl_fn + ".tmp", recs, terminator=True)
            os.rename(ovl_fn + ".tmp", ovl_fn)
            integrity.write_sidecar(ovl_fn, rows=len(recs))
            self._drop_pair_ckpts(self.dir0, "phase0")
        if self.p.target == "overlapping":
            # reference: fc_run exits after stage-0 overlap for this
            # target (run1.py:401-402)
            LOG.info("phase0: target=overlapping; stopping after overlap")
            return None

        # group by seed (LA4Falcon -H<cutoff> -fo semantics: A-read is the
        # seed; B reads are supports, RC'd onto the seed's strand)
        t_cns = time.time()
        ccfg = cns_runner.ConsensusConfig.from_option_string(
            p.falcon_sense_option)

        # n_core None = unset -> size from [job.*]/host; an EXPLICIT
        # --n-core 0 is the reference's in-process FakePool determinism
        # mode and must be honored (forking a pool inside jax.distributed
        # workers deadlocks on locks held by forked-away threads)
        n_core = ccfg.n_core if ccfg.n_core is not None else \
            (p.cns_nproc or os.cpu_count() or 1)
        use_dev_cns = (self.p.use_device and
                       os.environ.get("FTPU_CNS_DEVICE", "1") != "0" and
                       not ccfg.trim and
                       self._aligner() is not None)
        if ccfg.trim and self.p.use_device:
            # --trim pre-aligns each support with the k-mer chain and cuts
            # the aligned span before consensus; that path runs through
            # the host runner (cns.runner.consensus_with_trim_for_group)
            LOG.info("phase0: --trim set; using host consensus runner")

        # mid-phase checkpoint: the consensus phase is hours at >=100Mb
        # scale; after each device chunk the progress marker records how
        # many LIVE seed groups are durably written, and a restart skips
        # them (group order is deterministic given the checkpointed
        # overlap table).  The reference gets the same granularity from
        # per-task pypeflow sentinels (cns_00001.. task dirs).
        prog_fn = preads_fn + ".progress"
        done_groups = 0
        out_mode = "w"
        if os.path.exists(prog_fn) and os.path.exists(preads_fn + ".tmp"):
            try:
                parts = open(prog_fn).read().split()
                done_groups, good_bytes = int(parts[0]), int(parts[1])
                # drop any partial tail written after the last durable
                # marker (the writer may have died mid-record)
                with open(preads_fn + ".tmp", "r+") as tf:
                    tf.truncate(good_bytes)
                out_mode = "a"
                LOG.info("phase0: resuming consensus past %d finished "
                         "groups (%d bytes kept)", done_groups,
                         good_bytes)
            except (ValueError, IndexError, OSError):
                done_groups = 0

        def groups(skip=0):
            a_ids = recs["a_id"]
            if len(recs) == 0:
                return
            starts = np.flatnonzero(
                np.r_[True, a_ids[1:] != a_ids[:-1]]).tolist()
            starts.append(len(recs))
            live_idx = 0
            for gi in range(len(starts) - 1):
                rows = recs[starts[gi]:starts[gi + 1]]
                rid = int(rows["a_id"][0])
                if store.lengths[rid] < cutoff:
                    continue
                live_idx += 1
                if live_idx <= skip:
                    continue
                yield self._make_group(store, rows, cutoff,
                                       as_codes=use_dev_cns)

        with open(preads_fn + ".tmp", out_mode) as out_f:

            def save_progress(k):
                # k live groups of this run durable; marker carries the
                # byte offset so a crashed tail can be truncated away
                out_f.flush()
                with open(prog_fn + ".tmp", "w") as pf:
                    pf.write("%d %d" % (done_groups + k, out_f.tell()))
                os.replace(prog_fn + ".tmp", prog_fn)
                system.touch_heartbeat(self.out_dir)
                # marker durable: safe point to recycle a leaky worker
                system.maybe_recycle(self.out_dir, "phase0 consensus")

            live = (g for g in groups(done_groups) if g is not None)
            if use_dev_cns:
                from ..cns.device import run_consensus_device
                LOG.info("phase0: device consensus engine (cns.device)")
                emitted = run_consensus_device(
                    live, ccfg, out_f, progress_cb=save_progress)
            else:
                emitted = cns_runner.run_consensus(
                    ((sid, [(rid, seq) for rid, seq, _ in items])
                     for sid, items in live), ccfg, out_f,
                    n_core=n_core, progress_cb=save_progress)
        os.rename(preads_fn + ".tmp", preads_fn)
        if os.path.exists(prog_fn):
            os.unlink(prog_fn)
        integrity.write_sidecar(preads_fn, rows=emitted)
        self.timings["phase0_consensus"] = time.time() - t_cns
        LOG.info("phase0: %d pread sequences -> %s", emitted, preads_fn)

        # pre-assembly stats report (reference: stats_preassembly.py)
        try:
            report = stats_mod.preassembly_report(
                store, preads_fn, cutoff, p.genome_size)
            import json
            with open(os.path.join(self.dir0, "pre_assembly_stats.json"),
                      "w") as f:
                json.dump(report, f, indent=2)
        except Exception:
            LOG.exception("phase0: stats report failed (non-fatal)")
        return preads_fn

    def _make_group(self, store, rows, cutoff, as_codes=False):
        """(seed_id, [(read_id, seq, rng), ...]) with the seed first.

        rows: one seed's slice of the columnar overlap table.
        rng = (s1, e1, s2, e2): the support/seed alignment range from the
        overlap record, on the seed's strand (the device consensus path
        reuses these instead of re-seeding; reference fc_consensus gets
        bare sequences over the LA4Falcon pipe and must re-seed).
        as_codes: supports stay uint8 code arrays (the device path
        consumes codes; decoding 10^5..10^6 supports to strings just to
        re-encode them costs tens of seconds at E. coli scale)."""
        rid = int(rows["a_id"][0])
        if store.lengths[rid] < cutoff:
            return None
        seed_id = "%09d" % rid
        seed_seq = store.get_seq(rid)
        out = [(seed_id, seed_seq, None)]
        skip_contained = self.p.skip_contained
        for o in rows:
            if skip_contained and int(o["klass"]) == otable.CONTAINS:
                # falcon_sense_skip_contained: LA4Falcon -s drops supports
                # contained in the seed (reference bash.py:350-351)
                continue
            b_rid = int(o["b_id"])
            codes = store.get_codes(b_rid)
            b_start, b_end = int(o["b_start"]), int(o["b_end"])
            a_start, a_end = int(o["a_start"]), int(o["a_end"])
            if int(o["b_strand"]) == 1:
                codes = readstore.revcomp_codes(codes)
                b_len = int(o["b_len"])
                rng = (b_len - b_end, b_len - b_start, a_start, a_end)
            else:
                rng = (b_start, b_end, a_start, a_end)
            out.append(("%09d" % b_rid, codes if as_codes
                        else readstore.decode_seq(codes), rng))
        return seed_id, out

    # -- phase 1: pread overlap --------------------------------------------
    def phase1(self, preads_fn):
        """preads_fn: one pread FASTA path (the phase-0 product) or a
        list of paths (input_type=preads: the user's own pread FASTAs
        feed this phase directly, stage 0 skipped -- the working version
        of reference run1.py:485-508's unfinished preads branch)."""
        ovl_fn = os.path.join(self.dir1, "preads.ovl")
        p4f = os.path.join(self.dir2, "preads4falcon.fasta")
        if _resumable(ovl_fn, "phase1 preads.ovl") and \
                _resumable(p4f, "phase1 preads4falcon"):
            LOG.info("phase1: %s exists; skipping", ovl_fn)
            return ovl_fn
        t_start = time.time()
        p = self.p
        system.touch_heartbeat(self.out_dir)

        paths = [preads_fn] if isinstance(preads_fn, str) else \
            list(preads_fn)
        store = readstore.ReadStore.from_fasta_files(
            paths, min_len=p.pr_min_len)
        store.split_blocks(int(p.pr_block_mb * 1e6))
        LOG.info("phase1: %d preads, %d bases", len(store),
                 store.total_bases)
        # renumber preads: DB2Falcon gives dense %09d ids; keep the
        # original (prolog/<seed>) names as the id-dump for read tracking
        orig_names = list(store.names)
        names = ["%09d" % i for i in range(len(store))]
        store.names = names
        with open(os.path.join(self.dir1, "pread_ids"), "w") as f:
            for pid, name in zip(names, orig_names):
                f.write("%s %s\n" % (pid, name))
        fasta.write_fasta(p4f, ((names[i], store.get_seq(i))
                                for i in range(len(store))))
        integrity.write_sidecar(p4f, rows=len(store))

        recs = self._overlap_store(store, self._engine_params(1), "phase1",
                                   ckpt_dir=self.dir1)
        self.timings["phase1_overlap"] = time.time() - t_start

        with open(ovl_fn + ".tmp", "w") as f:
            ofilter.filter_table(
                f, recs, max_diff=p.filt_max_diff,
                max_cov=p.filt_max_cov, min_cov=p.filt_min_cov,
                min_len=p.filt_min_len, bestn=p.filt_bestn)
        os.rename(ovl_fn + ".tmp", ovl_fn)
        integrity.write_sidecar(ovl_fn)
        self._drop_pair_ckpts(self.dir1, "phase1")
        return ovl_fn

    # -- phase 2: assembly --------------------------------------------------
    def phase2(self, ovl_fn):
        d = self.dir2
        p = self.p
        system.touch_heartbeat(self.out_dir)
        if not _done(os.path.join(d, "p_ctg.fa")):
            t0 = time.time()
            local_ovl = os.path.join(d, "preads.ovl")
            if os.path.abspath(ovl_fn) != os.path.abspath(local_ovl):
                import shutil
                shutil.copyfile(ovl_fn, local_ovl)
            unitigs.ovlp_to_graph(local_ovl, d, min_len=p.graph_min_len,
                                  min_idt=p.graph_min_idt, lfc=p.graph_lfc)
            to_contig.run(d)
            to_contig.dedup_a_tigs(d)
            self.timings["phase2_graph"] = time.time() - t0

        # GFA outputs (reference: TASK_RUN_FALCON_ASM_SCRIPT,
        # pype_tasks.py:121-164)
        cwd = os.getcwd()
        os.chdir(d)
        try:
            with open("asm.gfa.json", "w") as f:
                collect_pread_gfa(f)
            with open("sg.gfa.json", "w") as f:
                collect_pread_gfa(f, add_string_graph=True)
            with open("contig.gfa2.json", "w") as f:
                collect_contig_gfa(f)
            with open("asm.gfa.json") as j, open("asm.gfa", "w") as f:
                deserialize_gfa(j).write_gfa_v1(f)
            with open("sg.gfa.json") as j, open("sg.gfa", "w") as f:
                deserialize_gfa(j).write_gfa_v1(f)
            with open("contig.gfa2.json") as j, open("contig.gfa2", "w") as f:
                deserialize_gfa(j).write_gfa_v2(f)
        finally:
            os.chdir(cwd)
        return os.path.join(d, "p_ctg.fa")

    def run(self):
        t0 = time.time()
        profile_dir = os.environ.get("FTPU_PROFILE", "")
        prof = None
        if profile_dir:
            # per-run device trace for xprof/tensorboard (the reference has
            # no profiler; SURVEY.md section 5 asks for JAX-profiler hooks)
            try:
                import jax.profiler as prof
                prof.start_trace(profile_dir)
                LOG.info("profiling to %s", profile_dir)
            except Exception:
                LOG.exception("could not start the JAX profiler")
                prof = None
        try:
            if self.p.input_type == "preads":
                # skip stage 0 entirely: the input FASTAs ARE the preads
                # (reference run1.py:189-194 validates the value and
                # :485-508 branches on it; its own preads path is an
                # unfinished `raise Exception('TODO')` -- this is the
                # working equivalent).  target=pre-assembly still quits
                # before stage 1 (the reference's check sits above the
                # preads branch, run1.py:485-486).
                if self.p.target == "pre-assembly":
                    LOG.info("target=pre-assembly; nothing to do for "
                             "input_type=preads")
                    p_ctg = None
                else:
                    fofn = self.cfg["input_fofn"]
                    paths = fasta.read_fofn(fofn) \
                        if fofn.endswith(".fofn") else [fofn]
                    LOG.info("input_type=preads: stage 0 skipped; "
                             "%d pread FASTA(s) feed phase 1", len(paths))
                    ovl = self.phase1(paths)
                    p_ctg = self.phase2(ovl)
            else:
                preads = self.phase0()
                if preads is None or self.p.target == "pre-assembly":
                    # reference: stop after stage 0
                    # (run1.py:401-402,485-486)
                    if self.p.target == "pre-assembly":
                        LOG.info(
                            "target=pre-assembly; quitting after stage-0")
                    p_ctg = preads
                else:
                    ovl = self.phase1(preads)
                    p_ctg = self.phase2(ovl)
        finally:
            if prof is not None:
                prof.stop_trace()
        self.timings["total"] = time.time() - t0
        try:
            import json as _json
            with open(os.path.join(self.out_dir, "timings.json"), "w") as f:
                _json.dump(self.timings, f, indent=2, sort_keys=True)
        except OSError:
            pass
        LOG.info("pipeline done in %.1fs -> %s", self.timings["total"],
                 p_ctg)
        return p_ctg


def setup_logging(logger_cfg=None):
    """Default stderr INFO logging, or a user logging config file --
    .json (logging.config.dictConfig) or .ini (fileConfig), the reference
    fc_run's second positional argument
    (reference: run_support.py:463-534)."""
    if logger_cfg:
        import json as _json
        import logging.config as _lc
        if logger_cfg.endswith(".json"):
            with open(logger_cfg) as f:
                _lc.dictConfig(_json.load(f))
        else:
            _lc.fileConfig(logger_cfg)
        return
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m falcon_tpu.pipeline.driver <cfg> "
              "[logger.json|out_dir]", file=sys.stderr)
        return 2
    cfg = argv[0]
    out_dir = "."
    logger_cfg = None
    if len(argv) > 1:
        # reference CLI compat: `fc_run cfg logger.json`; otherwise the
        # second arg is the output directory
        if argv[1].endswith((".json", ".ini")) and os.path.isfile(argv[1]):
            logger_cfg = argv[1]
        else:
            out_dir = argv[1]
    setup_logging(logger_cfg)
    Pipeline(cfg, out_dir).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
