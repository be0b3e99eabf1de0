"""ctypes harness over the REFERENCE C kernels, compiled out-of-tree.

This builds /root/reference/src/c/{kmer_lookup,DW_banded,falcon}.c (read
directly from the read-only reference checkout; nothing is copied into this
repo) into a scratch shared library and exposes the reference `align`,
`find_kmer_pos_for_seq`, `find_best_aln_range[2]` and `generate_consensus`
as a ground-truth oracle for bit-parity tests.  Tests that need the oracle
skip if the toolchain is unavailable.
"""
import ctypes
import os
import subprocess

REF_SRC = "/root/reference/src/c"
SO_PATH = "/tmp/falcon_oracle.so"

_lib = None


class AlignmentC(ctypes.Structure):
    _fields_ = [("aln_str_size", ctypes.c_int),
                ("dist", ctypes.c_int),
                ("aln_q_s", ctypes.c_int),
                ("aln_q_e", ctypes.c_int),
                ("aln_t_s", ctypes.c_int),
                ("aln_t_e", ctypes.c_int),
                ("q_aln_str", ctypes.POINTER(ctypes.c_char)),
                ("t_aln_str", ctypes.POINTER(ctypes.c_char))]


class KmerLookupC(ctypes.Structure):
    _fields_ = [("start", ctypes.c_int),
                ("last", ctypes.c_int),
                ("count", ctypes.c_int)]


class KmerMatchC(ctypes.Structure):
    _fields_ = [("count", ctypes.c_int),
                ("query_pos", ctypes.POINTER(ctypes.c_int)),
                ("target_pos", ctypes.POINTER(ctypes.c_int))]


class AlnRangeC(ctypes.Structure):
    _fields_ = [("s1", ctypes.c_int), ("e1", ctypes.c_int),
                ("s2", ctypes.c_int), ("e2", ctypes.c_int),
                ("score", ctypes.c_long)]


class ConsensusDataC(ctypes.Structure):
    _fields_ = [("sequence", ctypes.POINTER(ctypes.c_char)),
                ("eqv", ctypes.POINTER(ctypes.c_int))]


def build():
    srcs = [os.path.join(REF_SRC, f)
            for f in ("kmer_lookup.c", "DW_banded.c", "falcon.c")]
    cmd = ["gcc", "-O2", "-shared", "-fPIC", "-I", REF_SRC] + srcs + \
          ["-o", SO_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(SO_PATH):
        build()
    lib = ctypes.CDLL(SO_PATH)

    lib.align.argtypes = [ctypes.c_char_p, ctypes.c_int,
                          ctypes.c_char_p, ctypes.c_int,
                          ctypes.c_int, ctypes.c_int]
    lib.align.restype = ctypes.POINTER(AlignmentC)
    lib.free_alignment.argtypes = [ctypes.POINTER(AlignmentC)]

    lib.allocate_kmer_lookup.argtypes = [ctypes.c_int]
    lib.allocate_kmer_lookup.restype = ctypes.POINTER(KmerLookupC)
    lib.allocate_seq.argtypes = [ctypes.c_int]
    lib.allocate_seq.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.allocate_seq_addr.argtypes = [ctypes.c_int]
    lib.allocate_seq_addr.restype = ctypes.POINTER(ctypes.c_int)
    lib.add_sequence.argtypes = [ctypes.c_int, ctypes.c_uint, ctypes.c_char_p,
                                 ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_ubyte),
                                 ctypes.POINTER(KmerLookupC)]
    lib.mask_k_mer.argtypes = [ctypes.c_int, ctypes.POINTER(KmerLookupC),
                               ctypes.c_int]
    lib.find_kmer_pos_for_seq.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.c_uint,
                                          ctypes.POINTER(ctypes.c_int),
                                          ctypes.POINTER(KmerLookupC)]
    lib.find_kmer_pos_for_seq.restype = ctypes.POINTER(KmerMatchC)
    for fn in ("find_best_aln_range", "find_best_aln_range2"):
        f = getattr(lib, fn)
        f.argtypes = [ctypes.POINTER(KmerMatchC), ctypes.c_int,
                      ctypes.c_int, ctypes.c_int]
        f.restype = ctypes.POINTER(AlnRangeC)
    lib.free_kmer_match.argtypes = [ctypes.POINTER(KmerMatchC)]
    lib.free_aln_range.argtypes = [ctypes.POINTER(AlnRangeC)]
    lib.free_kmer_lookup.argtypes = [ctypes.POINTER(KmerLookupC)]
    lib.free_seq_array.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
    lib.free_seq_addr_array.argtypes = [ctypes.POINTER(ctypes.c_int)]

    lib.generate_consensus.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                       ctypes.c_uint, ctypes.c_uint,
                                       ctypes.c_uint, ctypes.c_double]
    lib.generate_consensus.restype = ctypes.POINTER(ConsensusDataC)
    lib.free_consensus_data.argtypes = [ctypes.POINTER(ConsensusDataC)]

    _lib = lib
    return lib


def oracle_align(q, t, band_tolerance, get_aln_str=True):
    """Run reference align(); returns dict of fields."""
    lib = get_lib()
    qb = q.encode() if isinstance(q, str) else bytes(q)
    tb = t.encode() if isinstance(t, str) else bytes(t)
    p = lib.align(qb, len(qb), tb, len(tb), band_tolerance,
                  1 if get_aln_str else 0)
    a = p.contents
    out = {
        "aln_str_size": a.aln_str_size, "dist": a.dist,
        "aln_q_s": a.aln_q_s, "aln_q_e": a.aln_q_e,
        "aln_t_s": a.aln_t_s, "aln_t_e": a.aln_t_e,
        "q_aln_str": ctypes.string_at(a.q_aln_str, a.aln_str_size)
                     if get_aln_str and a.aln_str_size > 0 else b"",
        "t_aln_str": ctypes.string_at(a.t_aln_str, a.aln_str_size)
                     if get_aln_str and a.aln_str_size > 0 else b"",
    }
    lib.free_alignment(p)
    return out


class OracleKmer:
    """Reference k-mer table over one target sequence."""

    def __init__(self, target, K):
        lib = get_lib()
        self.lib = lib
        self.K = K
        tb = target.encode() if isinstance(target, str) else bytes(target)
        self.tb = tb
        self.lk = lib.allocate_kmer_lookup(1 << (K * 2))
        self.sa = lib.allocate_seq(len(tb))
        self.sda = lib.allocate_seq_addr(len(tb))
        lib.add_sequence(0, K, tb, len(tb), self.sda, self.sa, self.lk)

    def mask(self, threshold):
        self.lib.mask_k_mer(1 << (self.K * 2), self.lk, threshold)

    def find(self, query):
        qb = query.encode() if isinstance(query, str) else bytes(query)
        km = self.lib.find_kmer_pos_for_seq(qb, len(qb), self.K,
                                            self.sda, self.lk)
        c = km.contents.count
        qp = [km.contents.query_pos[i] for i in range(c)]
        tp = [km.contents.target_pos[i] for i in range(c)]
        self._last_km = km
        return qp, tp

    def best_range(self, bin_size, count_th, variant=1):
        fn = (self.lib.find_best_aln_range if variant == 1
              else self.lib.find_best_aln_range2)
        rp = fn(self._last_km, self.K, bin_size, count_th)
        r = rp.contents
        out = (r.s1, r.e1, r.s2, r.e2, r.score)
        self.lib.free_aln_range(rp)
        return out

    def close(self):
        if getattr(self, "_last_km", None) is not None:
            self.lib.free_kmer_match(self._last_km)
            self._last_km = None
        self.lib.free_kmer_lookup(self.lk)
        self.lib.free_seq_array(self.sa)
        self.lib.free_seq_addr_array(self.sda)


def oracle_generate_consensus(seqs, min_cov, K, min_idt):
    lib = get_lib()
    arr = (ctypes.c_char_p * len(seqs))()
    arr[:] = [s.encode() if isinstance(s, str) else bytes(s) for s in seqs]
    p = lib.generate_consensus(arr, len(seqs), min_cov, K, min_idt)
    seq = ctypes.string_at(p.contents.sequence).decode()
    lib.free_consensus_data(p)
    return seq
