"""ReadStore: packing, blocks, cutoff, persistence."""
import numpy as np
import pytest

from falcon_tpu.io import fasta, readstore


def test_encode_decode_roundtrip():
    s = "ACGTACGTNNACGT"
    codes = readstore.encode_seq(s)
    assert readstore.decode_seq(codes) == s
    assert (codes[:4] == [0, 1, 2, 3]).all()
    assert codes[8] == 255


def test_revcomp():
    codes = readstore.encode_seq("AACGT")
    rc = readstore.revcomp_codes(codes)
    assert readstore.decode_seq(rc) == "ACGTT"


def test_blocks_and_cutoff():
    seqs = ["A" * 1000, "C" * 3000, "G" * 2000, "T" * 500]
    rs = readstore.ReadStore.from_seqs(seqs)
    blocks = rs.split_blocks(block_bases=3500)
    # greedy fill: 1000 | 3000 | 2000+500
    assert [len(b) for b in blocks] == [1, 1, 2]
    assert rs.total_bases == 6500
    # smallest L with >= 1x of 4500: 2000 (3000+2000 = 5000 >= 4500)
    assert rs.calc_length_cutoff(1, 4500) == 2000
    with pytest.raises(ValueError):
        rs.calc_length_cutoff(10, 100000)


def test_min_len_filter(tmp_path):
    fn = tmp_path / "r.fa"
    fasta.write_fasta(str(fn), [("a", "A" * 100), ("b", "C" * 900)])
    rs = readstore.ReadStore.from_fasta_files([str(fn)], min_len=500)
    assert len(rs) == 1 and rs.rid_name(0) == "b"


def test_save_load_roundtrip(tmp_path):
    rs = readstore.ReadStore.from_seqs(["ACGT" * 100, "GGCC" * 50],
                                       ["x", "y"])
    rs.split_blocks(10_000)
    rs.save(str(tmp_path / "store"))
    rs2 = readstore.ReadStore.load(str(tmp_path / "store"))
    assert rs2.names == ["x", "y"]
    assert rs2.get_seq(1) == "GGCC" * 50
    assert len(rs2.blocks) == 1


def test_dense_and_packed_views():
    rs = readstore.ReadStore.from_seqs(["ACGT" * 40, "A" * 100])
    dense, lens = rs.dense_block([0, 1])
    assert dense.shape[1] % 128 == 0
    assert (dense[1, 100:] == readstore.PAD).all()
    # 2-bit flat packing (the engine's HBM-resident block format)
    from falcon_tpu.ops.align_device import pack_flat_2bit
    words = pack_flat_2bit(rs.data)
    w = int(words[0])
    decoded = [(w >> (2 * i)) & 3 for i in range(16)]
    assert decoded == [0, 1, 2, 3] * 4
    # every base round-trips
    n = len(rs.data)
    all_dec = np.zeros(len(words) * 16, np.uint8)
    for i in range(16):
        all_dec[i::16] = (words >> np.uint32(2 * i)) & np.uint32(3)
    assert np.array_equal(all_dec[:n], rs.data)
