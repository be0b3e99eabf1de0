"""Host consensus runner's mid-phase progress contract.

cns.runner.run_consensus now reports durable progress like the device
path (progress_cb(k) = the first k input groups are completely
processed and emitted), so the driver's consensus checkpoint + worker
recycling covers the host back-end too.  Checks:

* marks are monotonic and end exactly at the total group count;
* a mark of k really means groups 1..k are emitted: replaying the run
  with the first k groups skipped reproduces the remaining output
  byte-for-byte (the driver's resume semantics).
"""
import io

import numpy as np

from falcon_tpu.cns import runner

A = np.frombuffer(b"ACGT", np.uint8)


def _groups(n, rng):
    out = []
    for g in range(n):
        truth = rng.randint(0, 4, size=rng.randint(600, 1200))
        seed = A[truth].tobytes().decode()
        items = [("%09d" % (g * 100), seed)]
        n_sup = 6 if g % 3 else 2       # every 3rd group gates out
        for k in range(n_sup):
            t = truth.copy()
            flips = rng.rand(len(t)) < 0.05
            t[flips] = (t[flips] + 1) % 4
            items.append(("%09d" % (g * 100 + k + 1),
                          A[t].tobytes().decode()))
        out.append(("%09d" % (g * 100), items))
    return out


def _cfg():
    return runner.ConsensusConfig(min_cov=2, min_idt=0.70, min_n_read=4,
                                  min_cov_aln=4, output_multi=False)


def test_progress_marks_monotonic_and_final():
    rng = np.random.RandomState(5)
    groups = _groups(9, rng)
    marks = []
    out = io.StringIO()
    runner.run_consensus(iter(groups), _cfg(), out, n_core=0,
                         progress_cb=marks.append, progress_every=2)
    assert marks, "no progress reported"
    assert marks == sorted(marks)
    assert marks[-1] == len(groups)


def test_progress_mark_matches_resume_skip():
    rng = np.random.RandomState(7)
    groups = _groups(9, rng)
    cfg = _cfg()

    # full run, capturing the output offset at each mark
    out = io.StringIO()
    marks = []

    def cb(k):
        marks.append((k, out.tell()))

    runner.run_consensus(iter(groups), cfg, out, n_core=0,
                         progress_cb=cb, progress_every=1)
    full = out.getvalue()

    # resume from every intermediate mark: skipping k groups must
    # reproduce the tail of the full output exactly
    for k, off in marks[:-1]:
        out2 = io.StringIO()
        runner.run_consensus(iter(groups[k:]), cfg, out2, n_core=0)
        assert out2.getvalue() == full[off:], \
            "resume after %d groups diverges" % k
