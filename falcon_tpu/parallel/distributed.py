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


def init_distributed():
    """Initialize the jax.distributed runtime when launched multi-host.

    Reads the standard coordinator env vars; a no-op when absent or when
    already initialized, so single-host runs never pay for it.
    Returns (process_index, process_count).
    """
    import jax
    coord = os.environ.get("FTPU_COORDINATOR_ADDRESS")
    if coord and jax.process_count() == 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["FTPU_NUM_PROCESSES"]),
                process_id=int(os.environ["FTPU_PROCESS_ID"]))
        except RuntimeError:
            pass  # already initialized by the launcher
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
    n_local = np.array([local.shape[0]], dtype=np.int64)
    counts = np.asarray(multihost_utils.process_allgather(n_local)
                        ).reshape(-1)
    cap = max(1, int(counts.max()))
    padded = np.zeros((cap,), dtype=local.dtype)
    padded[:local.shape[0]] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(counts), cap)
    return [gathered[h, :int(counts[h])] for h in range(len(counts))]


def allgather_records(local_rows, n_cols, dtype=np.int64):
    """All-gather each host's overlap-record rows over DCN.

    local_rows: (N_local, n_cols) ndarray (ragged N across hosts).  Every
    host returns the identical concatenated (N_total, n_cols) array,
    ordered by host id.  Single-process: returns local_rows unchanged.

    Uses one max-size padded all-gather (multihost_utils) -- overlap
    tables are tiny next to the alignment traffic (tens of MB for E. coli)
    so padding waste is irrelevant; one collective beats per-host
    point-to-point plumbing.
    """
    import jax
    if jax.process_count() == 1:
        return np.asarray(local_rows, dtype=dtype).reshape(-1, n_cols)
    from jax.experimental import multihost_utils
    local = np.asarray(local_rows, dtype=dtype).reshape(-1, n_cols)
    n_local = np.array([local.shape[0]], dtype=np.int64)
    counts = np.asarray(multihost_utils.process_allgather(n_local)
                        ).reshape(-1)
    cap = int(counts.max())
    padded = np.zeros((cap, n_cols), dtype=dtype)
    padded[:local.shape[0]] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(counts), cap, n_cols)
    out = np.concatenate([gathered[h, :int(counts[h])]
                          for h in range(len(counts))], axis=0)
    LOG.info("allgather_records: %d hosts, %s local -> %d total rows",
             len(counts), counts.tolist(), out.shape[0])
    return out
