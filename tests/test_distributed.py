"""parallel.distributed: block-pair striping + record gather; and the
utils.system / io.ser parity helpers."""
import os

import numpy as np
import pytest

from falcon_tpu.parallel import distributed
from falcon_tpu.utils import system as usys
from falcon_tpu.io import ser


def test_block_pair_plan_full_triangle():
    plan = distributed.block_pair_plan(4)
    assert plan == [(i, j) for i in range(4) for j in range(i, 4)]
    assert len(plan) == 10


@pytest.mark.parametrize("n_hosts", [1, 2, 3, 7])
def test_host_stripes_partition_the_plan(n_hosts):
    n_blocks = 5
    plan = distributed.block_pair_plan(n_blocks)
    seen = []
    for h in range(n_hosts):
        stripe = distributed.host_block_pairs(n_blocks, h, n_hosts)
        seen.extend(stripe)
        # round-robin deal: stripe sizes differ by at most one
        assert abs(len(stripe) - len(plan) / n_hosts) < 1
    assert sorted(seen) == sorted(plan)
    assert len(seen) == len(set(seen))  # disjoint


def test_diagonal_pairs_spread_across_hosts():
    # the dense i==j pairs must not all land on one host
    stripes = [distributed.host_block_pairs(8, h, 4) for h in range(4)]
    diag_counts = [sum(1 for (i, j) in s if i == j) for s in stripes]
    assert max(diag_counts) - min(diag_counts) <= 2


def test_allgather_single_process_identity():
    lines = ["a b c", "d e f"]
    assert distributed.allgather_lines(lines) == lines
    rows = np.arange(12).reshape(4, 3)
    out = distributed.allgather_records(rows, 3)
    np.testing.assert_array_equal(out, rows)


def test_init_distributed_single_process():
    h, n = distributed.init_distributed()
    assert h == 0 and n >= 1


def test_system_utils(tmp_path):
    d = tmp_path / "a" / "b"
    usys.make_dirs(str(d))
    assert d.is_dir()
    usys.make_dirs(str(d))  # idempotent

    target = tmp_path / "data.txt"
    target.write_text("x")
    link = tmp_path / "sub" / "link.txt"
    usys.make_dirs(str(link.parent))
    usys.symlink(str(target), str(link))
    assert link.read_text() == "x"
    assert not os.path.isabs(os.readlink(str(link)))
    usys.symlink(str(target), str(link))  # force re-link

    with usys.cd(str(tmp_path)):
        assert os.getcwd() == str(tmp_path.resolve())

    assert usys.maxrss_mb() > 0
    usys.log_resources("test")


def test_ser_json_roundtrip(tmp_path):
    fn = str(tmp_path / "obj.json")
    obj = {"b": [1, 2], "a": "x"}
    ser.serialize(fn, obj)
    assert ser.deserialize(fn) == obj
    assert not os.path.exists(fn + ".tmp")
    with pytest.raises(ValueError):
        ser.serialize(str(tmp_path / "obj.xyz"), obj)
