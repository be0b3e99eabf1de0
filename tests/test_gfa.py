"""GFA-1/2 writer semantics (mirrors the reference's gen_gfa tests)."""
import io

from falcon_tpu.graph.gfa import GFAGraph, deserialize_gfa, serialize_gfa


def small_graph():
    g = GFAGraph()
    g.add_node("node1", 7, "ACTGAAA")
    g.add_node("node2", 10, "AAACCCGGGT")
    g.add_edge("edge1", "node1", "+", "node2", "+", 4, 7, 0, 3, "*")
    g.add_path("000000F", ["node1", "node2"], ["4M", "7M"])
    return g


def test_gfa_v1():
    out = io.StringIO()
    small_graph().write_gfa_v1(out)
    assert out.getvalue() == (
        "H\tVN:Z:1.0\n"
        "S\tnode1\tACTGAAA\tLN:i:7\n"
        "S\tnode2\tAAACCCGGGT\tLN:i:10\n"
        "L\tnode1\t+\tnode2\t+\t3M\n"
        "P\t000000F\tnode1,node2\t4M,7M\n")


def test_gfa_v2_end_markers():
    g = GFAGraph()
    g.add_node("a", 5, "*")
    g.add_node("b", 8, "*")
    # v_end == v_len must get the '$' marker
    g.add_edge("e0", "a", "+", "b", "-", 2, 5, 0, 3, "*")
    out = io.StringIO()
    g.write_gfa_v2(out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "H\tVN:Z:2.0"
    assert lines[1] == "S\ta\t5\t*"
    assert lines[3] == "E\te0\ta+\tb-\t2\t5$\t0\t3\t*"


def test_json_roundtrip():
    g = small_graph()
    s = serialize_gfa(g)
    g2 = deserialize_gfa(io.StringIO(s))
    out1, out2 = io.StringIO(), io.StringIO()
    g.write_gfa_v1(out1)
    g2.write_gfa_v1(out2)
    assert out1.getvalue() == out2.getvalue()


def test_validation():
    g = GFAGraph()
    g.add_node("x", 5)
    try:
        g.add_edge("e", "x", "?", "x", "+", 0, 1, 0, 1, "*")
        assert False, "bad orientation accepted"
    except ValueError:
        pass
    try:
        g.add_path("p", ["x"], [])
        assert False, "mismatched cigars accepted"
    except ValueError:
        pass
