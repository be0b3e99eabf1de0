"""Run the REFERENCE stage-2 python (ovlp_to_graph / graph_to_contig)
in-process as a parity oracle.

The reference modules are imported directly from the read-only checkout at
/root/reference (nothing is copied into this repo).  They are py2-era code
written against networkx 1.x, so this module installs faithful shims first:

  * `future.utils`  -- viewitems/itervalues
  * `md5`           -- hashlib.md5 alias (used by FastaReader)
  * `pypeflow.io`   -- the handful of shell helpers falcon_kit.io re-exports
  * `networkx`      -- a networkx-1.x-compatible subset: DiGraph /
    MultiDiGraph with list-returning edge accessors, `.node` attribute
    dicts, ego_graph, bidirectional-BFS shortest_path, (dist, node)-heap
    dijkstra -- matching nx 1.x tie-breaking semantics exactly
  * `ext_falcon`    -- module whose __file__ points at the compiled
    reference C oracle (tests/oracle.py), so falcon_kit's ctypes bindings
    load the real kernels

Used by tests/test_stage2_parity.py to byte-compare sg_edges_list /
utg_data / ctg_paths / p_ctg.fa between falcon_tpu.graph and the reference.
"""
import heapq
import importlib.util
import sys
import types

REF = "/root/reference"


# --------------------------------------------------------------- nx1 shim

class _NodeDict(dict):
    def __missing__(self, k):
        v = self[k] = {}
        return v


class Nx1DiGraph:
    def __init__(self):
        self.succ = {}
        self.pred = {}
        self.node = _NodeDict()
        self.edge_attr = {}

    def add_node(self, n):
        if n not in self.succ:
            self.succ[n] = {}
            self.pred[n] = {}
            _ = self.node[n]

    def add_edge(self, u, v, **attr):
        self.add_node(u)
        self.add_node(v)
        self.succ[u][v] = None
        self.pred[v][u] = None
        self.edge_attr.setdefault((u, v), {}).update(attr)

    def remove_edge(self, u, v):
        del self.succ[u][v]
        del self.pred[v][u]
        self.edge_attr.pop((u, v), None)

    def nodes(self):
        return list(self.succ)

    def edges(self):
        return [(u, v) for u in self.succ for v in self.succ[u]]

    def out_edges(self, n):
        return [(n, v) for v in self.succ.get(n, ())]

    def in_edges(self, n):
        return [(u, n) for u in self.pred.get(n, ())]

    def successors(self, n):
        return list(self.succ.get(n, ()))

    def predecessors(self, n):
        return list(self.pred.get(n, ()))

    def reverse(self):
        g = Nx1DiGraph()
        for n in self.succ:
            g.add_node(n)
        for (u, v), a in self.edge_attr.items():
            g.add_edge(v, u, **a)
        return g

    def add_path(self, nodes, **attr):
        # nx1 Graph.add_path: edges along consecutive nodes
        nodes = list(nodes)
        for u, v in zip(nodes[:-1], nodes[1:]):
            self.add_edge(u, v, **attr)
        for n in nodes:
            self.add_node(n)

    def __contains__(self, n):
        return n in self.succ


class Nx1MultiDiGraph:
    def __init__(self):
        self.succ = {}   # u -> {v: {key: attr}}
        self.pred = {}
        self.node = _NodeDict()

    def add_node(self, n):
        if n not in self.succ:
            self.succ[n] = {}
            self.pred[n] = {}
            _ = self.node[n]

    def add_edge(self, u, v, key=None, **attr):
        self.add_node(u)
        self.add_node(v)
        self.succ[u].setdefault(v, {})[key] = attr
        self.pred[v].setdefault(u, {})[key] = attr

    def remove_edge(self, u, v, key=None):
        keys = self.succ[u][v]
        if key not in keys:
            raise KeyError((u, v, key))
        del keys[key]
        if not keys:
            del self.succ[u][v]
        pk = self.pred[v][u]
        del pk[key]
        if not pk:
            del self.pred[v][u]

    def nodes(self):
        return list(self.succ)

    def edges(self, keys=False):
        out = []
        for u in self.succ:
            for v in self.succ[u]:
                for k in self.succ[u][v]:
                    out.append((u, v, k) if keys else (u, v))
        return out

    def out_edges(self, n, keys=False):
        out = []
        for v in self.succ.get(n, ()):
            for k in self.succ[n][v]:
                out.append((n, v, k) if keys else (n, v))
        return out

    def in_edges(self, n, keys=False):
        out = []
        for u in self.pred.get(n, ()):
            for k in self.pred[n][u]:
                out.append((u, n, k) if keys else (u, n))
        return out

    def out_degree(self, n):
        return len(self.out_edges(n))

    def in_degree(self, n):
        return len(self.in_edges(n))

    def successors(self, n):
        return list(self.succ.get(n, ()))

    def predecessors(self, n):
        return list(self.pred.get(n, ()))

    def copy(self):
        g = Nx1MultiDiGraph()
        for n in self.succ:
            g.add_node(n)
        for u in self.succ:
            for v in self.succ[u]:
                for k, a in self.succ[u][v].items():
                    g.add_edge(u, v, key=k, **a)
        return g

    def __contains__(self, n):
        return n in self.succ


class NetworkXNoPath(Exception):
    pass


def _ego_graph(G, n, radius=1, undirected=False):
    # nx1: single_source_shortest_path_length BFS, then induced subgraph
    dist = {n: 0}
    level = [n]
    d = 0
    while level and d < radius:
        nxt = []
        for v in level:
            for w in G.successors(v):
                if w not in dist:
                    dist[w] = d + 1
                    nxt.append(w)
        level = nxt
        d += 1
    nodes = set(dist)
    H = type(G)()
    for v in dist:
        H.add_node(v)
    if isinstance(G, Nx1MultiDiGraph):
        for u in dist:
            for v in G.succ[u]:
                if v in nodes:
                    for k, a in G.succ[u][v].items():
                        H.add_edge(u, v, key=k, **a)
    else:
        for u in dist:
            for v in G.succ[u]:
                if v in nodes:
                    H.add_edge(u, v, **G.edge_attr.get((u, v), {}))
    return H


def _bidirectional_shortest_path(G, source, target):
    if source == target:
        return [source]
    pred = {source: None}
    succ = {target: None}
    forward = [source]
    reverse = [target]
    meet = None
    while forward and reverse and meet is None:
        if len(forward) <= len(reverse):
            level, forward = forward, []
            for v in level:
                for w in G.successors(v):
                    if w not in pred:
                        forward.append(w)
                        pred[w] = v
                    if w in succ:
                        meet = w
                        break
                if meet is not None:
                    break
        else:
            level, reverse = reverse, []
            for v in level:
                for w in G.predecessors(v):
                    if w not in succ:
                        succ[w] = v
                        reverse.append(w)
                    if w in pred:
                        meet = w
                        break
                if meet is not None:
                    break
    if meet is None:
        raise NetworkXNoPath("no path between %s and %s" % (source, target))
    path = []
    w = meet
    while w is not None:
        path.append(w)
        w = pred[w]
    path.reverse()
    w = succ[meet]
    while w is not None:
        path.append(w)
        w = succ[w]
    return path


def _dijkstra(G, source, target, weight):
    dist = {}
    seen = {source: 0}
    paths = {source: [source]}
    pq = [(0, source)]
    while pq:
        d, v = heapq.heappop(pq)
        if v in dist:
            continue
        dist[v] = d
        if v == target:
            return paths[v], d
        for u in G.successors(v):
            w = G.edge_attr[(v, u)].get(weight, 1)
            vu = d + w
            if u not in dist and (u not in seen or vu < seen[u]):
                seen[u] = vu
                paths[u] = paths[v] + [u]
                heapq.heappush(pq, (vu, u))
    raise NetworkXNoPath("no path between %s and %s" % (source, target))


def _shortest_path(G, source, target, weight=None):
    if weight is None:
        return _bidirectional_shortest_path(G, source, target)
    return _dijkstra(G, source, target, weight)[0]


def _shortest_path_length(G, source, target, weight=None):
    if weight is None:
        return len(_bidirectional_shortest_path(G, source, target)) - 1
    return _dijkstra(G, source, target, weight)[1]


def _make_nx_module():
    nx = types.ModuleType("networkx")
    nx.Graph = Nx1DiGraph  # only instantiated, never used by the reference
    nx.DiGraph = Nx1DiGraph
    nx.MultiDiGraph = Nx1MultiDiGraph
    nx.ego_graph = _ego_graph
    nx.shortest_path = _shortest_path
    nx.shortest_path_length = _shortest_path_length
    exc = types.ModuleType("networkx.exception")
    exc.NetworkXNoPath = NetworkXNoPath
    nx.exception = exc
    return nx, exc


# ---------------------------------------------------------------- loaders

_loaded = {}


def _install_shims():
    if "future.utils" not in sys.modules:
        fut = types.ModuleType("future")
        futils = types.ModuleType("future.utils")
        futils.viewitems = lambda d: d.items()
        futils.itervalues = lambda d: iter(d.values())
        fut.utils = futils
        sys.modules["future"] = fut
        sys.modules["future.utils"] = futils
    if "md5" not in sys.modules:
        import hashlib
        m = types.ModuleType("md5")
        # py2 md5 accepted str; encode transparently
        m.md5 = lambda s=b"": hashlib.md5(
            s.encode() if isinstance(s, str) else s)
        sys.modules["md5"] = m
    if "pypeflow.io" not in sys.modules:
        pf = types.ModuleType("pypeflow")
        pio = types.ModuleType("pypeflow.io")
        for name in ("syscall", "capture", "cd", "mkdirs", "symlink", "rm",
                     "touch", "filesize", "exists_and_not_empty"):
            setattr(pio, name, lambda *a, **k: None)
        pf.io = pio
        sys.modules["pypeflow"] = pf
        sys.modules["pypeflow.io"] = pio


def _install_nx_shim():
    nx, exc = _make_nx_module()
    sys.modules["networkx"] = nx
    sys.modules["networkx.exception"] = exc


def _install_ext_falcon():
    from . import oracle
    oracle.get_lib()  # ensure built
    m = types.ModuleType("ext_falcon")
    m.__file__ = oracle.SO_PATH
    sys.modules["ext_falcon"] = m


def _load_module_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_ovlp_to_graph():
    """Reference falcon_kit/mains/ovlp_to_graph.py, runnable."""
    if "ovlp_to_graph" in _loaded:
        return _loaded["ovlp_to_graph"]
    _install_shims()
    _install_nx_shim()
    mod = _load_module_file("_ref_ovlp_to_graph",
                            REF + "/falcon_kit/mains/ovlp_to_graph.py")
    _loaded["ovlp_to_graph"] = mod
    return mod


def load_ref_graph_to_contig():
    """Reference falcon_kit/mains/graph_to_contig.py, runnable (needs the
    compiled C oracle for its alignment calls)."""
    if "graph_to_contig" in _loaded:
        return _loaded["graph_to_contig"]
    _install_shims()
    _install_nx_shim()
    _install_ext_falcon()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    mod = _load_module_file("_ref_graph_to_contig",
                            REF + "/falcon_kit/mains/graph_to_contig.py")
    # py3 fix: the module passes str sequences into ctypes c_char_p args
    # (py2-ism); encode at the get_aln_data boundary
    orig = mod.get_aln_data
    mod.get_aln_data = lambda t, q: orig(t.encode(), q.encode())
    _loaded["graph_to_contig"] = mod
    return mod


def load_ref_main(name):
    """Load any reference falcon_kit.mains.<name> module, runnable
    (absolute `falcon_kit...` imports resolve against /root/reference).
    py2 dict-iterator idioms are rewritten to py3 at load time."""
    key = "main_" + name
    if key in _loaded:
        return _loaded[key]
    _install_shims()
    _install_nx_shim()
    _install_ext_falcon()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # pre-register py3-fixed versions of the package modules the GFA
    # chain uses (they contain py2 dict-iterator idioms)
    for pkgmod in ("falcon_kit.tiling_path", "falcon_kit.gfa_graph"):
        if pkgmod not in sys.modules:
            _exec_py2fixed(pkgmod,
                           REF + "/" + pkgmod.replace(".", "/") + ".py")
    mod = _exec_py2fixed("_ref_main_" + name,
                         REF + "/falcon_kit/mains/%s.py" % name)
    _loaded[key] = mod
    return mod


def _exec_py2fixed(name, path):
    with open(path) as f:
        src = (f.read()
               .replace(".iteritems()", ".items()")
               .replace(".itervalues()", ".values()")
               .replace(".iterkeys()", ".keys()"))
    mod = types.ModuleType(name)
    mod.__file__ = path
    mod.xrange = range        # py2 builtins some modules still use
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    if "." in name:  # attach to parent package for attribute access
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod
