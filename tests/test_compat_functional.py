"""compat.functional: reference-parity pure parsing (doctests + units).

Mirrors the reference's test strategy of feeding captured external-tool
text to pure functions (reference test/test_functional.py,
test/test_calc_cutoff.py)."""
import doctest

import pytest

from falcon_tpu.compat import functional as F


def test_doctests():
    results = doctest.testmod(F)
    assert results.failed == 0 and results.attempted > 0


PLAN = """\
# Daligner jobs (2)
daligner -v -h1 -t16 -H1 -e0.7 -l1 -s1000 raw_reads.1 raw_reads.1
daligner -v -h1 -t16 -H1 -e0.7 -l1 -s1000 raw_reads.2 raw_reads.1 raw_reads.2
# Initial sort jobs (4)
# Level 1 jobs (2)
LAmerge -v raw_reads.1 L1.1.1 L1.1.2 && rm L1.1.1.las L1.1.2.las
LAmerge -v raw_reads.2 L1.2.1 L1.2.2 ; rm L1.2.1.las L1.2.2.las
"""


def test_get_daligner_job_descriptions():
    jobs = F.get_daligner_job_descriptions(PLAN.splitlines(True),
                                           "raw_reads")
    assert set(jobs) == {(".1", ".1"), (".2", ".1", ".2")}
    assert jobs[(".2", ".1", ".2")].splitlines()[0].endswith(
        "raw_reads.2 raw_reads.1 raw_reads.2")
    assert "LAcheck -v raw_reads *.las" in jobs[(".1", ".1")]


def test_get_daligner_job_descriptions_single_block():
    plan = "daligner -v raw_reads raw_reads\n"
    jobs = F.get_daligner_job_descriptions(plan.splitlines(True),
                                           "raw_reads", single=True)
    assert set(jobs) == {("", "")}


def test_get_daligner_job_descriptions_bad_arg():
    with pytest.raises(AssertionError):
        F.get_daligner_job_descriptions("fake_filename.txt", "raw_reads")


def test_get_mjob_data_and_las_filenames():
    mjob = F.get_mjob_data(PLAN.splitlines(True))
    assert set(mjob) == {1, 2}
    assert len(mjob[1]) == 1 and mjob[1][0].startswith("LAmerge")
    las = F.get_las_filenames({1: mjob[1], 3: []}, "raw_reads")
    assert las == {1: "raw_reads.1.las", 3: "raw_reads.3.las"}


def test_get_mjob_data_rejects_lasort():
    with pytest.raises(Exception, match="LAsort"):
        F.get_mjob_data(["LAsort -v raw.1.raw.1.C0\n"])


def test_calc_cutoff_from_dbstats():
    dbstats = """\
Statistics for all reads of length 500 bases or more

        169,514:          1      0.0      0.0      169514
         10,000:          3      0.1      0.2       12000
          5,000:         10      1.0      2.0        6000
"""
    # target within the longest bin
    assert F.calc_cutoff(169514, dbstats) == 169514
    # needs the 10k bin too
    assert F.calc_cutoff(170000, dbstats) == 10000
    with pytest.raises(F.GenomeCoverageError):
        F.calc_cutoff(10**9, dbstats)


def test_truncation_metric():
    dbdump = "R 1\nL 1 0 1000\nR 2\nL 2 0 2000\n"
    pairs = "1 900\n2 1800\n"
    assert F.calc_metric_truncation(dbdump, pairs) == pytest.approx(150.0)


def test_fragmentation_metric():
    # 10 seeds produced 1 pread, 2 seeds produced 3
    assert F.calc_metric_fragmentation("10 1\n2 3\n") == \
        pytest.approx((10 * 1 + 2 * 3) / 12)


def test_lowerdict_roundtrip():
    d = F.toLowerDict({"General": {"Input_FOFN": "x.fofn"}})
    assert d["general"]["input_fofn"] == "x.fofn"
    assert "GENERAL" in d
