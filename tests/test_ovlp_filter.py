"""3-stage overlap filter semantics (fake-stream seam, as in the
reference's test strategy: workers take a readlines callable)."""
from falcon_tpu.overlap import filter as F


def mk(lines):
    return lines.strip().splitlines


DATA = """\
000000000 000000001 -1807 100.00 0 181 1988 1988 0 0 1807 1989 overlap
000000000 000000002 -823 99.88 0 0 823 1988 0 1166 1989 1989 overlap
000000000 000000003 -50 99.94 0 0 50 1988 0 0 50 50 overlap
000000000 000000017 -61 98.36 0 0 61 1988 0 1928 1989 1989 overlap
000000000 000000028 -1952 79.95 0 0 1952 1988 0 37 1989 1989 overlap
000000001 000000000 -1807 100.00 0 0 1807 1989 0 181 1988 1988 overlap
000000001 000000002 -642 99.84 0 0 642 1989 0 1347 1989 1989 overlap
000000002 000000000 -823 99.88 0 1166 1989 1989 0 0 823 1988 overlap
000000002 000000001 -642 99.84 0 1347 1989 1989 0 0 642 1989 overlap
000000003 000000000 -50 99.94 0 0 50 50 0 0 50 1988 overlap
000000017 000000000 -61 98.36 0 1928 1989 1989 0 0 61 1988 overlap
000000028 000000000 -1952 79.95 0 37 1989 1989 0 0 1952 1988 overlap
"""


def test_stage1_asymmetric_coverage_ignored():
    # reads with only 5' or only 3' overlaps beyond max_diff are ignored;
    # the 79.95%-idt line is dropped before counting
    got = F.filter_stage1(mk(DATA), 1000, 1000, 1, 1)
    assert got == ["000000001", "000000002", "000000017", "000000028"]


def test_stage1_low_idt_line_not_counted():
    data = "000000028 000000000 -1952 79.95 0 37 1989 1989 0 0 1952 1988 overlap"
    got = F.filter_stage1(mk(data), 1000, 1000, 1, 1)
    assert got == ["000000028"]  # zero counted overlaps < min_ovlp


def test_stage1_balanced_kept():
    data = "000000003 000000000 -50 99.94 0 0 50 50 0 0 50 1988 overlap"
    # q_s==0 and q_e==q_l: counts on both ends -> balanced -> kept
    assert F.filter_stage1(mk(data), 1000, 1000, 1, 1) == []


def test_stage2_contained_sets():
    data = """\
000000010 000000011 -500 99.00 0 0 500 500 0 100 600 2000 contained
000000012 000000013 -500 99.00 0 0 2000 2000 0 0 500 500 contains
000000014 000000015 -500 85.00 0 0 500 500 0 100 600 2000 contained
"""
    got = F.filter_stage2(mk(data), 100, 100, 1, 1, set())
    assert got == {"000000010", "000000013"}  # low-idt line skipped


def test_stage2_ignore_set_respected():
    data = "000000010 000000011 -500 99.00 0 0 500 500 0 100 600 2000 contained"
    got = F.filter_stage2(mk(data), 100, 100, 1, 1, {"000000011"})
    assert got == set()


def test_stage3_bestn_per_end():
    lines = []
    # 20 5'-overlaps of decreasing length for one read
    for i in range(20):
        ln = 3000 - i * 100
        lines.append("000000001 %09d -%d 99.50 0 0 %d 4000 0 %d 4000 4000 overlap"
                     % (100 + i, ln, ln, 4000 - ln))
    got = F.filter_stage3(mk("\n".join(lines)), 100, 100, 1, 1,
                          set(), set(), bestn=5)
    # emission stops after i >= bestn AND unaligned b-range > 1000
    assert len(got) < 20
    assert len(got) >= 5


def test_run_ovlp_filter_writes_terminator(tmp_path):
    import io
    out = io.StringIO()
    F.run_ovlp_filter(out, [mk(DATA)], 1000, 1000, 1, 1, bestn=10)
    text = out.getvalue()
    assert text.endswith("---\n")
    # all surviving lines involve only non-ignored reads
    for line in text.splitlines()[:-1]:
        f = line.split()
        assert f[0] == "000000000" or f[1] == "000000000"
