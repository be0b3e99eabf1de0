"""Subprocess worker for the real multi-process distributed tests.

Launched by tests/test_multiprocess.py with FTPU_* coordinator env vars;
runs the actual jax.distributed + gloo collectives path
(parallel.distributed:allgather_*), which single-process tests can never
reach.  Modes:

  gather  <out>                 exercise allgather_lines/records/table
  overlap <cfg> <fasta> <out>   Pipeline._overlap_store over the host's
                                stripe of the block-pair triangle
"""
import os
import sys


def main():
    mode = sys.argv[1]
    pid = os.environ["FTPU_PROCESS_ID"]
    from falcon_tpu.parallel import distributed
    i, n = distributed.init_distributed()
    assert n == int(os.environ["FTPU_NUM_PROCESSES"]), (i, n)

    if mode == "gather":
        out_fn = sys.argv[2] + "." + pid
        import numpy as np
        from falcon_tpu.overlap import table as T
        lines = ["host%s-line%d" % (pid, k) for k in range(3 + i)]
        got_lines = distributed.allgather_lines(lines)
        rows = (np.arange(8 * (i + 1), dtype=np.int64).reshape(-1, 2)
                + 1000 * i + (1 << 33) * i)   # >2^31 values on host 1
        got_rows = distributed.allgather_records(rows, 2)
        tbl = T.empty(2 + i)
        tbl["a_id"] = i
        tbl["b_id"] = np.arange(2 + i)
        tbl["idt_cp"] = 9999
        got_tbl = distributed.allgather_table(tbl)
        with open(out_fn, "w") as f:
            f.write(repr(got_lines) + "\n")
            f.write(repr(got_rows.tolist()) + "\n")
            f.write("\n".join(T.to_lines(got_tbl)) + "\n")
        return 0

    if mode in ("pipeline", "pipeline-dp"):
        # FULL pipeline under jax.distributed: every phase runs on every
        # host (overlap striped + gathered; consensus/graph replicated),
        # each host writing its own out_dir like a cluster host with a
        # local filesystem.  The test byte-compares the hosts' artifacts
        # against each other and against a single-process run.
        # pipeline-dp: the production device path (XLA-CPU backend,
        # FTPU_USE_PALLAS=0) with the device consensus DP engine, which
        # must default ON under multi-process distribution.
        cfg_fn, out_base = sys.argv[2:4]
        out_dir = out_base + "." + pid
        os.makedirs(out_dir, exist_ok=True)
        use_device = mode == "pipeline-dp"
        if use_device:
            from falcon_tpu.cns.device import DeviceCns
            assert DeviceCns().use_dp, \
                "DP must default ON under multi-process distribution"
        from falcon_tpu.pipeline.driver import Pipeline
        p = Pipeline(cfg_fn, out_dir, use_device=use_device)
        p.run()
        return 0

    if mode == "overlap":
        cfg_fn, out_dir, out_fn = sys.argv[2:5]
        from falcon_tpu.io import readstore
        from falcon_tpu.overlap import table as T
        from falcon_tpu.pipeline.driver import Pipeline
        p = Pipeline(cfg_fn, out_dir, use_device=False)
        store = readstore.ReadStore.from_fasta_files(
            [p.cfg["input_fofn"]])
        store.split_blocks(40_000)          # force several blocks
        tbl = p._overlap_store(store, p._engine_params(0), "mp")
        T.write_table(out_fn, tbl, terminator=True)
        return 0

    raise SystemExit("unknown mode " + mode)


if __name__ == "__main__":
    sys.exit(main())
