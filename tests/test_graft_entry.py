"""The graft entry points: single-chip jittable step + multi-chip dryrun."""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402


def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    bi, bj, bd = [np.asarray(x) for x in out]
    assert bi.shape == bj.shape == bd.shape
    # identical-ish pairs must extend
    assert (bi > 0).all()


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices; run via `make test`")
def test_dryrun_multichip():
    graft.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs 4 (virtual) devices; run via `make test`")
def test_dryrun_multichip_odd():
    graft.dryrun_multichip(3)
