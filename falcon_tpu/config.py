"""Configuration: [General]-style cfg parsing with reference-compatible keys.

Accepts the reference's ini-with-sections or JSON configs
(reference: falcon_kit/run_support.py:146-163 parse_cfg_file, defaults
:347-430), so existing fc_run cfgs (e.g. examples/fc_run_ecoli.cfg) drive
this pipeline unmodified.  Option strings meant for external Dazzler tools
(pa_HPCdaligner_option, DBsplit options) are parsed into the native overlap
engine's parameters instead of being shelled out.
"""
import configparser
import json
import re


DEFAULTS = {
    # reference defaults (run_support.py:347-430)
    "input_fofn": "input.fofn",
    "input_type": "raw",
    "genome_size": "0",
    "seed_coverage": "20",
    "length_cutoff": "-1",
    "length_cutoff_pr": "0",
    "pa_DBsplit_option": "-x500 -s200",
    "ovlp_DBsplit_option": "-x500 -s200",
    "pa_HPCdaligner_option": "-v -D24 -t16 -e.70 -l1000 -s100",
    "ovlp_HPCdaligner_option": "-v -D24 -t32 -h60 -e.96 -l500 -s1000",
    "falcon_sense_option":
        "--output-multi --min-idt 0.70 --min-cov 2 --max-n-read 1800",
    "falcon_sense_greedy": "False",
    "overlap_filtering_setting": "--max-diff 1000 --max-cov 1000 --min-cov 2",
    "fc_ovlp_to_graph_option": "",
    "bestn": "12",
    "target": "assembly",
    # TPU-native additions
    "overlap_k": "14",
    "overlap_min_hits": "4",
    "overlap_band": "250",
    "overlap_stride": "4",
    "overlap_stride_pr": "16",
    "use_device": "true",
}


def _coerce_bool(v):
    return str(v).strip().lower() in ("1", "true", "yes", "on")


def parse_cfg_file(path):
    """ini-with-[General] or JSON -> flat dict of [General] keys (plus a
    'job' dict for the scheduler sections, accepted and ignored here)."""
    text = open(path).read()
    if path.endswith(".json") or text.lstrip().startswith("{"):
        data = json.loads(text)
        general = dict(data.get("General", data))
    else:
        cp = configparser.ConfigParser(strict=False)
        cp.read_string(text)
        if "General" not in cp:
            raise ValueError("cfg %r has no [General] section" % path)
        general = {k: v for k, v in cp["General"].items()}
    cfg = dict(DEFAULTS)
    for k, v in general.items():
        cfg[k.lower()] = str(v)
    return cfg


def _opt_val(opts, flag, default=None, conv=str):
    """Extract '-x500'-style or '--min-cov 2'-style values."""
    m = re.search(r"%s\s*(\.?[\d.]+)" % re.escape(flag), opts)
    if not m:
        return default
    return conv(m.group(1))


class StageParams:
    """Per-stage engine/consensus/filter parameters derived from the
    reference option strings."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.input_fofn = cfg["input_fofn"]
        self.input_type = cfg["input_type"]
        self.genome_size = int(float(cfg["genome_size"]))
        self.seed_coverage = int(float(cfg["seed_coverage"]))
        self.length_cutoff = int(cfg["length_cutoff"])
        self.length_cutoff_pr = int(cfg["length_cutoff_pr"])

        # DBsplit: -x min read len, -s block size (MB of bases)
        self.raw_min_len = _opt_val(cfg["pa_dbsplit_option"]
                                    if "pa_dbsplit_option" in cfg
                                    else cfg["pa_DBsplit_option"],
                                    "-x", 500, int)
        self.raw_block_mb = _opt_val(cfg.get("pa_dbsplit_option",
                                             cfg["pa_DBsplit_option"]),
                                     "-s", 200, float)
        self.pr_min_len = _opt_val(cfg.get("ovlp_dbsplit_option",
                                           cfg["ovlp_DBsplit_option"]),
                                   "-x", 500, int)
        self.pr_block_mb = _opt_val(cfg.get("ovlp_dbsplit_option",
                                            cfg["ovlp_DBsplit_option"]),
                                    "-s", 200, float)

        # daligner opts: -e identity, -l min overlap
        raw_opts = cfg.get("pa_hpcdaligner_option",
                           cfg["pa_HPCdaligner_option"])
        pr_opts = cfg.get("ovlp_hpcdaligner_option",
                          cfg["ovlp_HPCdaligner_option"])
        self.raw_ovl_idt = _opt_val(raw_opts, "-e", 0.70, float)
        self.raw_ovl_minlen = _opt_val(raw_opts, "-l", 1000, int)
        self.pr_ovl_idt = _opt_val(pr_opts, "-e", 0.96, float)
        self.pr_ovl_minlen = _opt_val(pr_opts, "-l", 500, int)

        self.falcon_sense_option = cfg["falcon_sense_option"]
        self.overlap_filtering_setting = cfg["overlap_filtering_setting"]
        ofs = self.overlap_filtering_setting.replace("_", "-")
        self.filt_max_diff = _opt_val(ofs, "--max-diff", 1000, int)
        self.filt_max_cov = _opt_val(ofs, "--max-cov", 1000, int)
        self.filt_min_cov = _opt_val(ofs, "--min-cov", 2, int)
        self.filt_min_len = _opt_val(ofs, "--min-len", 2500, int)
        self.filt_bestn = _opt_val(ofs, "--bestn",
                                   int(cfg.get("bestn", 12)), int)

        g_opts = cfg.get("fc_ovlp_to_graph_option", "") or ""
        self.graph_min_len = _opt_val(g_opts, "--min_len", 4000, int)
        self.graph_min_idt = _opt_val(g_opts, "--min_idt", 96.0, float)
        self.graph_lfc = "--lfc" in g_opts

        self.overlap_k = int(cfg["overlap_k"])
        self.overlap_min_hits = int(cfg["overlap_min_hits"])
        self.overlap_band = int(cfg["overlap_band"])
        self.overlap_stride = int(cfg["overlap_stride"])
        self.overlap_stride_pr = int(cfg["overlap_stride_pr"])
        self.use_device = _coerce_bool(cfg["use_device"])
