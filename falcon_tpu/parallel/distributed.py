"""Multi-host (pod-slice) distribution of the overlap block-pair plan.

The reference scales the all-vs-all overlap step by emitting one cluster
job per block pair (HPC.daligner plan, reference: falcon_kit/bash.py:206,
falcon_kit/functional.py:56-93) and recombining the per-block .las files
through a shared filesystem + LAmerge tree (falcon_kit/mains/dazzler.py:
559-574).  Queues/NPROC come from [job.step.*] config sections
(falcon_kit/run_support.py:311-320).

The TPU-native equivalent has no job scheduler and no shared-FS data
plane: every host runs the same SPMD program (jax.distributed), owns a
deterministic stripe of the block-pair triangle, aligns its stripe on its
local devices, and the symmetric overlap table is recombined with ONE
all-gather over DCN at the end of the phase.  The merge tree disappears:
records are already in RAM, and `engine.emit_symmetric` sorts the gathered
table identically on every host, so downstream phases are deterministic
and replicated (the string-graph stage is host-level anyway).

Single-process runs degenerate to the identity (stripe = whole triangle,
gather = concat of one), so the driver uses this module unconditionally.
"""
import logging
import os

import numpy as np

LOG = logging.getLogger(__name__)


_INIT_TRIED = False


def want_distributed():
    """Whether this process was launched as part of a multi-host job.

    Decided from env-var presence ALONE -- calling any jax API first
    would initialize the backends and make jax.distributed.initialize
    impossible (it must run before any other JAX call).
    """
    return bool(os.environ.get("FTPU_COORDINATOR_ADDRESS"))


def init_distributed():
    """Initialize the jax.distributed runtime when launched multi-host.

    MUST be called before any other JAX call (jax.devices(), jit, ...);
    the pipeline driver calls it at startup for exactly that reason.
    Single-host runs (no FTPU_COORDINATOR_ADDRESS) never pay for it.
    Returns (process_index, process_count).

    A failed initialize in a process that WAS asked to join a multi-host
    job raises: silently degrading to n_hosts=1 would make every host
    redundantly compute the full block-pair triangle and skip the gather.
    """
    global _INIT_TRIED
    coord = os.environ.get("FTPU_COORDINATOR_ADDRESS")
    if coord and not _INIT_TRIED:
        _INIT_TRIED = True
        import jax
        num = int(os.environ["FTPU_NUM_PROCESSES"])
        pid = int(os.environ["FTPU_PROCESS_ID"])
        try:
            # CPU multi-process runs (tests, dev boxes) need the gloo
            # collectives backend; a no-op for TPU jobs
            jax.config.update("jax_cpu_collectives_implementation",
                              "gloo")
        except Exception:
            pass
        try:
            jax.distributed.initialize(
                coordinator_address=coord, num_processes=num,
                process_id=pid)
            LOG.info("jax.distributed initialized: process %d/%d via %s",
                     pid, num, coord)
        except RuntimeError as e:
            # jax.distributed.initialize raises if the runtime is already
            # up (a launcher wrapper did it) -- fine -- or if some other
            # JAX call beat us to backend init -- NOT fine.
            if jax.process_count() == num:
                LOG.info("jax.distributed already initialized (%d procs)",
                         num)
            else:
                LOG.error(
                    "jax.distributed.initialize failed (%s) and "
                    "process_count=%d != FTPU_NUM_PROCESSES=%d; "
                    "init_distributed() must run before any other JAX "
                    "call", e, jax.process_count(), num)
                raise
    import jax
    return jax.process_index(), jax.process_count()


def block_pair_plan(n_blocks):
    """The full upper-triangle (i, j) block-pair plan, i <= j.

    Deterministic order (row-major) == the reference's HPC.daligner job
    numbering; every host computes the same list.
    """
    return [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]


def host_block_pairs(n_blocks, host_id=None, n_hosts=None):
    """This host's stripe of the block-pair triangle.

    Pairs are dealt round-robin by plan index so the expensive diagonal
    (i == j, densest seed tables) and the cheap tail spread evenly across
    hosts -- the load-balance analog of the reference's scheduler pulling
    jobs from one queue.  Union over hosts == block_pair_plan, disjoint.
    """
    if host_id is None or n_hosts is None:
        import jax
        host_id = jax.process_index()
        n_hosts = jax.process_count()
    plan = block_pair_plan(n_blocks)
    return plan[host_id::n_hosts]


def allgather_lines(lines):
    """All-gather a list of text lines (one overlap record each) over DCN.

    Every host returns the identical concatenated list, ordered by host
    id (then local order) -- the in-RAM replacement for the reference's
    shared-FS LAmerge gather.  Single-process: returns `lines` as-is.
    """
    import jax
    if jax.process_count() == 1:
        return list(lines)
    buf = np.frombuffer(("\n".join(lines) + "\n" if lines else "")
                        .encode(), dtype=np.uint8)
    gathered = _allgather_ragged_1d(buf)
    out = []
    for h_buf in gathered:
        text = h_buf.tobytes().decode()
        out.extend(l for l in text.split("\n") if l)
    return out


def _allgather_ragged_1d(local):
    """All-gather ragged 1-D arrays; returns the per-host list."""
    from jax.experimental import multihost_utils
    # lengths travel as (lo, hi) uint32 words: process_allgather silently
    # downcasts int64 to int32 under jax_enable_x64=False, and a byte
    # buffer can legitimately exceed 2^31 at scale
    n = int(local.shape[0])
    n_local = np.array([n & 0xFFFFFFFF, n >> 32], dtype=np.uint32)
    words = np.asarray(multihost_utils.process_allgather(n_local),
                       dtype=np.uint64).reshape(-1, 2)
    counts = (words[:, 0] | (words[:, 1] << np.uint64(32))).astype(np.int64)
    cap = max(1, int(counts.max()))
    padded = np.zeros((cap,), dtype=local.dtype)
    padded[:local.shape[0]] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(counts), cap)
    return [gathered[h, :int(counts[h])] for h in range(len(counts))]


def allgather_table(tbl):
    """All-gather a columnar overlap table (overlap.table structured
    array) over DCN via the raw-byte path.  Every host returns the same
    concatenated table, ordered by host id; single-process: identity."""
    import jax
    if jax.process_count() == 1:
        return tbl
    dt = tbl.dtype
    gathered = _allgather_ragged_1d(
        np.ascontiguousarray(tbl).view(np.uint8).reshape(-1))
    parts = [np.ascontiguousarray(b).view(dt) for b in gathered]
    out = np.concatenate(parts) if parts else tbl[:0]
    LOG.info("allgather_table: %d hosts, %s local rows -> %d total",
             len(parts), [len(p) for p in parts], len(out))
    return out


def allgather_records(local_rows, n_cols, dtype=np.int64):
    """All-gather each host's overlap-record rows over DCN.

    local_rows: (N_local, n_cols) ndarray (ragged N across hosts).  Every
    host returns the identical concatenated (N_total, n_cols) array,
    ordered by host id.  Single-process: returns local_rows unchanged.

    The gather rides the raw-byte (uint8) path: multihost_utils would
    silently downcast an int64 payload to int32 under the default
    jax_enable_x64=False, truncating values >= 2^31; reinterpreting the
    row bytes sidesteps dtype coercion entirely.
    """
    import jax
    local = np.ascontiguousarray(
        np.asarray(local_rows, dtype=dtype).reshape(-1, n_cols))
    if jax.process_count() == 1:
        return local
    itemsize = np.dtype(dtype).itemsize
    gathered = _allgather_ragged_1d(local.view(np.uint8).reshape(-1))
    parts = [np.ascontiguousarray(b).view(dtype).reshape(-1, n_cols)
             for b in gathered]
    out = np.concatenate(parts, axis=0) if parts else local[:0]
    LOG.info("allgather_records: %d hosts, %s local rows -> %d total",
             len(parts),
             [p.shape[0] for p in parts], out.shape[0])
    assert out.dtype == np.dtype(dtype) and itemsize * n_cols
    return out
