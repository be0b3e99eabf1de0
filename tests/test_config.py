"""Config parsing: [job.*] sections, legacy keys, validation, target."""
import pytest

from falcon_tpu import config as C


def _write(tmp_path, text, name="fc_run.cfg"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


BASE = """\
[General]
input_fofn = input.fofn
genome_size = 5000
"""


def test_job_sections_parsed(tmp_path):
    cfg = C.parse_cfg_file(_write(tmp_path, BASE + """\
length_cutoff_pr = 2000

[job.defaults]
NPROC = 4
njobs = 32

[job.step.cns]
NPROC = 8
"""))
    p = C.StageParams(cfg)
    assert cfg["job"]["defaults"]["nproc"] == "4"
    assert p.cns_nproc == 8          # step overrides defaults
    assert p.cns_njobs == 32         # falls back to defaults
    # fc_run semantics: --min_len defaults to length_cutoff_pr
    # (reference run_support.py:400-405)
    assert p.graph_min_len == 2000


def test_legacy_concurrent_jobs_migrate(tmp_path):
    cfg = C.parse_cfg_file(_write(tmp_path, BASE +
                                  "cns_concurrent_jobs = 16\n"))
    assert cfg["job"]["step.cns"]["njobs"] == "16"
    assert C.StageParams(cfg).cns_njobs == 16


def test_explicit_min_len_wins(tmp_path):
    cfg = C.parse_cfg_file(_write(
        tmp_path, BASE + "fc_ovlp_to_graph_option = --min_len 7000\n"))
    assert C.StageParams(cfg).graph_min_len == 7000


def test_obsolete_falcon_sense_flags_raise(tmp_path):
    with pytest.raises(Exception, match="obsolete"):
        C.parse_cfg_file(_write(
            tmp_path,
            BASE + "falcon_sense_option = --output_dformat\n"))


def test_cutoff_or_genome_size_required(tmp_path):
    with pytest.raises(Exception, match="length_cutoff"):
        C.parse_cfg_file(_write(tmp_path, """\
[General]
input_fofn = input.fofn
"""))


def test_bad_target_raises(tmp_path):
    with pytest.raises(Exception, match="target"):
        C.parse_cfg_file(_write(tmp_path, BASE + "target = bogus\n"))


def test_targets_accepted(tmp_path):
    for t in ("overlapping", "pre-assembly", "assembly"):
        cfg = C.parse_cfg_file(_write(tmp_path, BASE + "target = %s\n" % t))
        assert C.StageParams(cfg).target == t


def test_skip_contained_flag(tmp_path):
    cfg = C.parse_cfg_file(_write(
        tmp_path, BASE + "falcon_sense_skip_contained = true\n"))
    assert C.StageParams(cfg).skip_contained is True


def test_reference_example_cfgs_parse():
    """Every example cfg shipped with the reference parses and yields
    sensible stage params (cfg-compat acceptance)."""
    import glob
    import os
    cfgs = glob.glob("/root/reference/examples/fc_run*.cfg")
    if not cfgs:
        pytest.skip("reference examples unavailable")
    for fn in cfgs:
        cfg = C.parse_cfg_file(fn)
        p = C.StageParams(cfg)
        assert p.raw_block_mb > 0
        assert 0.0 < p.raw_ovl_idt <= 1.0
        assert p.target == "assembly"


def test_invalid_input_type_raises_at_parse(tmp_path):
    """reference run1.py:189-190: assert input_type in (raw, preads)."""
    with pytest.raises(Exception, match="input_type"):
        C.parse_cfg_file(_write(tmp_path, BASE + "input_type = bogus\n"))


def test_preads_input_type_accepted(tmp_path):
    cfg = C.parse_cfg_file(_write(tmp_path, BASE + "input_type = preads\n"))
    assert C.StageParams(cfg).input_type == "preads"
