"""Tiling-path coordinates and a_ctg placement (mirrors the reference's
test_tiling_path.py scenarios)."""
import pytest

from falcon_tpu.graph import tiling


def mk_edges(rows):
    return [tiling.TilingPathEdge(r.split()) for r in rows]


ROWS = [
    "0 000000007:B 000000005:B 000000005 9 0 1980 99.95",
    "0 000000005:B 000000016:B 000000016 502 0 1487 99.93",
    "0 000000016:B 000000025:B 000000025 449 0 1540 99.94",
]


def test_calc_node_coords():
    edges = mk_edges(ROWS)
    coords, total = tiling.calc_node_coords(edges)
    assert coords["000000007:B"] == 0
    assert coords["000000005:B"] == 9
    assert coords["000000016:B"] == 9 + 502
    assert total == 9 + 502 + 449


def test_tiling_path_offset_from_contig_len():
    edges = mk_edges(ROWS)
    tp = tiling.TilingPath(edges, contig_sequence_len=2000)
    # first node length = contig len - tiling len
    assert tp.first_node_offset == 2000 - 960
    assert tp.coords["000000007:B"] == tp.first_node_offset
    assert tp.contig_len == 2000


def test_unsorted_path_raises():
    rows = [ROWS[1], ROWS[0]]
    with pytest.raises(Exception):
        tiling.calc_node_coords(mk_edges(rows))


def test_subpath():
    tp = tiling.TilingPath(mk_edges(ROWS))
    sub, s, e = tp.get_subpath(10, 600)
    assert len(sub) == 2
    assert sub[0][1] == "000000005:B"


def test_a_ctg_placement():
    p_rows = ROWS
    a_rows = [
        "0-001-01 000000005:B 000000016:B 000000016 502 0 1487 99.93",
    ]
    p_paths = tiling.load_tiling_paths_from_split_lines(
        [r.split() for r in p_rows])
    a_paths = tiling.load_tiling_paths_from_split_lines(
        [r.split() for r in a_rows])
    placement = tiling.find_a_ctg_placement(p_paths, a_paths)
    (start, end, pid, aid, first, last) = placement["0"]["0-001-01"]
    assert (start, end) == (9, 9 + 502)
    assert first == "000000005:B" and last == "000000016:B"


def test_utg_consensus():
    import numpy as np
    from falcon_tpu.ops import consensus_dp as C
    from falcon_tpu.utils import sim
    rng = np.random.RandomState(0)
    genome = sim.random_genome(4000, seed=3)
    g = np.frombuffer(genome.encode(), np.uint8)
    utg = sim.mutate(g[:3500], rng, 0.01, 0.01, 0.01).tobytes().decode()
    seqs = [utg]
    offs = [0]
    for i in range(10):
        s = rng.randint(-300, 2000)
        frag = g[max(0, s):max(0, s) + 2500]
        seqs.append(sim.mutate(frag, rng, 0.005, 0.005,
                               0.005).tobytes().decode())
        offs.append(s)
    cns = C.generate_utg_consensus(seqs, offs, 0, 8, 0.70)
    assert len(cns) > 2500
    from falcon_tpu.ops import align
    a = align.align(cns.upper(), genome, 500, False)
    assert a.dist / max(1, a.aln_str_size) < 0.02
