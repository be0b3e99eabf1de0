"""Columnar overlap table: parity with the record/text paths.

The table (overlap.table) is the in-RAM data plane; these tests pin its
text formatting, symmetric emission, canonical sort, and the vectorized
3-stage filter byte-for-byte against the record-object / text-stream
implementations (which are themselves parity-tested vs the reference).
"""
import io

import numpy as np
import pytest

from falcon_tpu.overlap import filter as ofilter
from falcon_tpu.overlap import records as R
from falcon_tpu.overlap import table as T


def random_table(n=500, n_reads=60, seed=0):
    rng = np.random.RandomState(seed)
    t = T.empty(n)
    a = rng.randint(0, n_reads, n)
    b = rng.randint(0, n_reads, n)
    b = np.where(b == a, (b + 1) % n_reads, b)
    a_len = rng.randint(2000, 20000, n)
    b_len = rng.randint(2000, 20000, n)
    a_s = np.where(rng.rand(n) < 0.5, 0, rng.randint(0, 500, n))
    a_e = np.where((a_s == 0) & (rng.rand(n) < 0.4), a_len,
                   np.where(rng.rand(n) < 0.7, a_len,
                            a_len - rng.randint(1, 400, n)))
    span = np.maximum(a_e - a_s, 600)
    b_s = np.where(rng.rand(n) < 0.5, 0, rng.randint(0, 500, n))
    b_e = np.minimum(b_s + span, b_len)
    t["a_id"] = a
    t["b_id"] = b
    t["score"] = -(a_e - a_s)
    t["idt_cp"] = rng.randint(8500, 10000, n)
    t["a_start"] = a_s
    t["a_end"] = a_e
    t["a_len"] = a_len
    t["b_strand"] = rng.randint(0, 2, n)
    t["b_start"] = b_s
    t["b_end"] = b_e
    t["b_len"] = b_len
    t["klass"] = T.classify_arr(
        t["b_strand"].astype(np.int64), a_s, a_e, a_len,
        b_s, b_e, b_len)
    t = t[t["klass"] != T.NONE]
    # group by a_id like a real merged table
    return t[np.argsort(t["a_id"], kind="stable")]


def test_lines_match_record_objects():
    t = random_table()
    lines = T.to_lines(t)
    rec_lines = [o.to_line() for o in T.to_records(t)]
    assert lines == rec_lines
    assert [T.format_line(r) for r in t] == lines


def test_text_round_trip(tmp_path):
    t = random_table(seed=1)
    fn = str(tmp_path / "t.ovl")
    T.write_table(fn, t, terminator=True)
    t2 = T.read_table(fn)
    assert np.array_equal(t, t2)


def test_emit_symmetric_matches_record_path():
    from falcon_tpu.overlap import engine
    t = random_table(seed=2)
    # drop mirror-duplicate pairs: emit_symmetric expects A-side only
    keep = t["a_id"] < t["b_id"]
    t = t[keep]
    sym_tbl = T.emit_symmetric(t)
    sym_recs = engine.emit_symmetric(T.to_records(t))
    assert T.to_lines(sym_tbl) == [o.to_line() for o in sym_recs]


def test_classify_matches_scalar():
    t = random_table(seed=3)
    for row in t[:200]:
        k = R.classify(int(row["b_strand"]), int(row["a_start"]),
                       int(row["a_end"]), int(row["a_len"]),
                       int(row["b_start"]), int(row["b_end"]),
                       int(row["b_len"]))
        assert T.KLASS_STR[row["klass"]] == k


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_filter_table_matches_text_filter(seed):
    t = T.emit_symmetric(random_table(n=800, seed=seed))
    lines = T.to_lines(t)
    buf_text = io.StringIO()
    ofilter.run_ovlp_filter(buf_text, [lambda: lines], max_diff=40,
                            max_cov=60, min_cov=1, min_len=2500, bestn=5)
    buf_tbl = io.StringIO()
    ofilter.filter_table(buf_tbl, t, max_diff=40, max_cov=60, min_cov=1,
                         min_len=2500, bestn=5)
    assert buf_tbl.getvalue() == buf_text.getvalue()


def test_filter_table_empty():
    buf = io.StringIO()
    ofilter.filter_table(buf, T.empty(0), 40, 60, 1, 2500, 5)
    assert buf.getvalue() == "---\n"
