"""GNM graph analysis (gnm/gnmgraph.cpp) — kernel parity vs brute
oracles, the reference's own pipes/wells fixture, and distributed ==
local equivalence."""

import heapq
import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lib_gdal_ray.pipelines import graph as G

GNM_DATA = "/root/reference/autotest/gnm/data"


# ---------------------------------------------------------------------------
# brute-force oracles (textbook, independent of the kernel)
# ---------------------------------------------------------------------------

def brute_costs(arcs, start):
    """arcs: [(u, v, cost)]. Textbook Dijkstra costs."""
    adj = {}
    for u, v, c in arcs:
        adj.setdefault(u, []).append((v, c))
    dist = {start: 0.0}
    pq = [(0.0, start)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, c in adj.get(u, ()):
            nd = d + c
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def enumerate_path_costs(arcs, start, end):
    """All simple-path costs start->end (small graphs only)."""
    adj = {}
    for u, v, c in arcs:
        adj.setdefault(u, []).append((v, c))
    out = []

    def rec(u, cost, seen):
        if u == end:
            out.append(cost)
            return
        for v, c in adj.get(u, ()):
            if v not in seen:
                rec(v, cost + c, seen | {v})

    rec(start, 0.0, {start})
    return sorted(out)


def rng_graph(seed, n_vert=14, n_edge=30, bidir_frac=0.4):
    rng = np.random.RandomState(seed)
    g = G.GNMGraphLocal()
    edges = []
    for eid in range(n_edge):
        u = int(rng.randint(n_vert))
        v = int(rng.randint(n_vert))
        if u == v:
            v = (v + 1) % n_vert
        cost = float(rng.randint(1, 20))
        inv = float(rng.randint(1, 20))
        bd = bool(rng.rand() < bidir_frac)
        g.add_edge(1000 + eid, u, v, bd, cost, inv)
        edges.append((1000 + eid, u, v, bd, cost, inv))
    return g, edges


def arcs_of(edges):
    """GNM traversal arcs: dirCost charged in BOTH directions of a
    bidirectional edge (gnmgraph.cpp:514-516)."""
    arcs = []
    for eid, u, v, bd, cost, inv in edges:
        arcs.append((u, v, cost))
        if bd:
            arcs.append((v, u, cost))
    return arcs


def edges_table(edges):
    eid, src, tgt, bd, dc, ic = zip(*edges)
    return pa.table({
        "edge_id": pa.array(eid, pa.int64()),
        "src": pa.array(src, pa.int64()),
        "tgt": pa.array(tgt, pa.int64()),
        "bidir": pa.array(bd, pa.bool_()),
        "dir_cost": pa.array(dc, pa.float64()),
        "inv_cost": pa.array(ic, pa.float64())})


# ---------------------------------------------------------------------------
# kernel parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(8))
def test_dijkstra_costs_match_brute(seed):
    g, edges = rng_graph(seed)
    arcs = arcs_of(edges)
    oracle = brute_costs(arcs, 0)
    tree = g.dijkstra_tree(0)
    # reconstruct cost along the tree for every reached vertex
    for v in tree:
        path = g.dijkstra(0, v)
        assert path, (seed, v)
        cost = sum(g._edges[e][3] for _, e in path if e != -1)
        assert cost == pytest.approx(oracle[v]), (seed, v)
    assert set(tree) == set(oracle)


def test_bidir_uses_dir_cost_both_ways():
    # reference quirk: walking a bidir edge target->source charges
    # dfDirCost, never dfInvCost (gnmgraph.cpp:514-516)
    g = G.GNMGraphLocal()
    g.add_edge(10, 1, 2, True, 5.0, 99.0)
    path = g.dijkstra(2, 1)
    assert path == [(2, -1), (1, 10)]
    tree = g.dijkstra_tree(2)
    assert tree == {2: -1, 1: 10}


def test_directed_edge_one_way_only():
    g = G.GNMGraphLocal()
    g.add_edge(10, 1, 2, False, 5.0, 5.0)
    assert g.dijkstra(1, 2) == [(1, -1), (2, 10)]
    assert g.dijkstra(2, 1) == []


def test_blocked_vertex_and_edge():
    g = G.GNMGraphLocal()
    g.add_edge(10, 1, 2, True, 1.0, 1.0)
    g.add_edge(11, 2, 3, True, 1.0, 1.0)
    g.add_edge(12, 1, 3, True, 9.0, 9.0)
    assert [v for v, _ in g.dijkstra(1, 3)] == [1, 2, 3]
    g.change_block_state(2, True)          # vertex block -> detour
    assert [v for v, _ in g.dijkstra(1, 3)] == [1, 3]
    g.change_block_state(2, False)
    g.change_block_state(11, True)         # edge block -> same detour
    assert [v for v, _ in g.dijkstra(1, 3)] == [1, 3]
    g.change_all_block_state(True)
    assert g.dijkstra(1, 3) == []


def test_duplicate_edge_id_keeps_first():
    g = G.GNMGraphLocal()
    assert g.add_edge(10, 1, 2, False, 1.0, 1.0)
    assert not g.add_edge(10, 2, 3, False, 1.0, 1.0)  # rejected
    assert g.dijkstra(2, 3) == []


def test_start_equals_end():
    g = G.GNMGraphLocal()
    g.add_edge(10, 1, 2, False, 1.0, 1.0)
    assert g.dijkstra(1, 1) == [(1, -1)]


@pytest.mark.parametrize("seed", range(6))
def test_ksp_matches_enumeration(seed):
    # DAG (loopless by construction) so Yen's k costs must equal the
    # k smallest of the full enumeration
    rng = np.random.RandomState(100 + seed)
    g = G.GNMGraphLocal()
    arcs = []
    n = 10
    eid = 0
    for u in range(n):
        for v in range(u + 1, min(u + 4, n)):
            if rng.rand() < 0.7:
                c = float(rng.randint(1, 30))
                g.add_edge(eid, u, v, False, c, c)
                arcs.append((u, v, c))
                eid += 1
    oracle = enumerate_path_costs(arcs, 0, n - 1)
    k = 6
    paths = g.k_shortest_paths(0, n - 1, k)
    got = sorted(sum(g._edges[e][3] for _, e in p if e != -1)
                 for p in paths)
    want = oracle[:min(k, len(oracle))]
    assert got == pytest.approx(want), seed
    # paths must all be distinct and each start/end correctly
    keys = {tuple(p) for p in paths}
    assert len(keys) == len(paths)
    for p in paths:
        assert p[0] == (0, -1) and p[-1][0] == n - 1


def test_connected_trace_semantics():
    g = G.GNMGraphLocal()
    g.add_edge(10, 1, 2, True, 1.0, 1.0)
    g.add_edge(11, 2, 3, False, 1.0, 1.0)
    g.add_edge(12, 4, 5, False, 1.0, 1.0)   # disconnected
    trace = g.connected_components([1])
    # every out-edge of every visited vertex is emitted, including the
    # bidir edge seen again from vertex 2 (gnmgraph.cpp:593-599)
    assert (1, 10) in trace and (2, 10) in trace and (2, 11) in trace
    assert all(v != 4 for v, _ in trace)
    verts = {v for v, _ in trace}
    assert verts == {1, 2}          # 3 has no out-edges -> no pairs
    # blocked target vertex is not traversed
    g.change_block_state(3, True)
    trace2 = g.connected_components([1])
    assert (2, 11) in trace2        # edge still listed ...
    # ... but 3 was never enqueued (no out-edges anyway). Block 2:
    g.change_block_state(2, True)
    trace3 = g.connected_components([1])
    assert trace3 == [(1, 10)]


# ---------------------------------------------------------------------------
# distributed == local
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 3, 5])
def test_shortest_path_costs_distributed(seed):
    g, edges = rng_graph(seed, n_vert=30, n_edge=80)
    ds = ray.data.from_arrow(edges_table(edges)).repartition(4)
    got = G.shortest_path_costs(ds, start=0)
    oracle = brute_costs(arcs_of(edges), 0)
    assert got.num_rows == len(oracle)
    gv = got["vertex"].to_pylist()
    gc = got["cost"].to_pylist()
    for v, c in zip(gv, gc):
        assert c == pytest.approx(oracle[v]), (seed, v)


def test_shortest_path_costs_blocked():
    edges = [(10, 1, 2, False, 1.0, 1.0), (11, 2, 3, False, 1.0, 1.0),
             (12, 1, 3, False, 9.0, 9.0)]
    ds = ray.data.from_arrow(edges_table(edges))
    got = G.shortest_path_costs(ds, start=1, blocked=[2])
    m = dict(zip(got["vertex"].to_pylist(), got["cost"].to_pylist()))
    assert m == {1: 0.0, 3: 9.0}


def test_reachable_vertices_distributed():
    g, edges = rng_graph(7, n_vert=30, n_edge=60)
    ds = ray.data.from_arrow(edges_table(edges)).repartition(3)
    got = G.reachable_vertices(ds, [0])
    trace = g.connected_components([0])
    want = {0} | {g._opposite(e, v) for v, e in trace
                  if g._opposite(e, v) != -1} | {v for v, _ in trace}
    assert set(got["vertex"].to_pylist()) == want


def test_shortest_path_table():
    edges = [(10, 1, 2, True, 1.0, 1.0), (11, 2, 3, True, 1.0, 1.0)]
    ds = ray.data.from_arrow(edges_table(edges))
    t = G.shortest_path(ds, 3, 1)
    assert t["vertex_fid"].to_pylist() == [3, 2, 1]
    assert t["edge_fid"].to_pylist() == [-1, 11, 10]
    assert t["step"].to_pylist() == [0, 1, 2]


# ---------------------------------------------------------------------------
# the reference's own pipes/wells network
# (autotest/gnm/gnm_test.py: import pipes+wells, ConnectPointsByLines
#  tolerance 0.000001 cost 1 both-dir, Dijkstra GetPath(61, 50))
# ---------------------------------------------------------------------------

def _load_gnm_fixture():
    from lib_gdal_ray.sources.shapefile import read_shapefile

    pipes_ds = read_shapefile(f"{GNM_DATA}/pipes.shp")
    wells_ds = read_shapefile(f"{GNM_DATA}/wells.shp")
    pt = pa.concat_tables(
        [t for t in ray.get(pipes_ds.to_arrow_refs()) if t.num_rows])
    wt = pa.concat_tables(
        [t for t in ray.get(wells_ds.to_arrow_refs()) if t.num_rows])
    # GFIDs are assigned sequentially at import: pipes 0..32, wells
    # 33..63 (gnmgenericnetwork.cpp:173 m_nGID++)
    pt = pt.append_column("gfid", pa.array(range(pt.num_rows), pa.int64()))
    wt = wt.append_column(
        "gfid", pa.array(range(pt.num_rows, pt.num_rows + wt.num_rows),
                         pa.int64()))
    return pt, wt


def test_pipes_wells_dijkstra():
    pt, wt = _load_gnm_fixture()
    assert pt.num_rows == 33 and wt.num_rows == 31
    lines = ray.data.from_arrow(pt)
    points = ray.data.from_arrow(wt)
    edges = G.connect_points_by_lines(
        lines, points, tolerance=0.000001, cost=1.0, inv_cost=1.0,
        direction=G.GNM_EDGE_DIR_BOTH)
    etbl = pa.concat_tables(
        [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows])
    assert etbl.num_rows > 0
    # the reference test: GetPath(61, 50) must return a non-empty path
    path = G.shortest_path(etbl, 61, 50)
    assert path.num_rows > 0
    vf = path["vertex_fid"].to_pylist()
    ef = path["edge_fid"].to_pylist()
    assert vf[0] == 61 and vf[-1] == 50 and ef[0] == -1
    # all path vertices are wells (33..63), all edges pipes (0..32)
    assert all(33 <= v <= 63 for v in vf)
    assert all(0 <= e <= 32 for e in ef[1:])
    # adjacent path pairs are actual graph edges
    g = G.graph_from_table(etbl)
    for (va, _), (vb, eb) in zip(
            list(zip(vf, ef))[:-1], list(zip(vf, ef))[1:]):
        assert g._opposite(eb, vb) == va
    # KSP from the same fixture returns >= 1 ascending-cost paths
    ksp = G.k_shortest_paths(etbl, 61, 50, 3)
    costs = sorted(set(zip(ksp["path_rank"].to_pylist(),
                           ksp["path_cost"].to_pylist())))
    assert costs[0][1] == pytest.approx(len(vf) - 1)  # unit costs
    assert [c for _, c in costs] == sorted(c for _, c in costs)
    # connected trace from well 61 reaches well 50
    reach = G.reachable_vertices(ray.data.from_arrow(etbl), [61])
    assert 50 in reach["vertex"].to_pylist()


def test_connect_points_snap_is_first_fid():
    # two points inside the tolerance box of a line start: the LOWEST
    # fid wins (FindNearestPoint returns the first spatial-filter hit,
    # gnmgenericnetwork.cpp:904-931)
    from lib_gdal_ray.geom.wkt import wkt_to_wkb

    pts = pa.table({
        "gfid": pa.array([7, 5], pa.int64()),
        "geometry": pa.array([wkt_to_wkb("POINT (0 0.0000001)"),
                              wkt_to_wkb("POINT (0 -0.0000001)")])})
    lines = pa.table({
        "gfid": pa.array([1], pa.int64()),
        "geometry": pa.array([wkt_to_wkb("LINESTRING (0 0, 5 5)")])})
    tgt_pt = pa.table({
        "gfid": pa.array([9], pa.int64()),
        "geometry": pa.array([wkt_to_wkb("POINT (5 5)")])})
    all_pts = pa.concat_tables([pts, tgt_pt])
    edges = G.connect_points_by_lines(
        ray.data.from_arrow(lines), ray.data.from_arrow(all_pts),
        tolerance=0.001)
    t = pa.concat_tables(
        [x for x in ray.get(edges.to_arrow_refs()) if x.num_rows])
    assert t.num_rows == 1
    assert t["src"].to_pylist() == [5]      # lowest fid in the box
    assert t["tgt"].to_pylist() == [9]
    assert t["edge_id"].to_pylist() == [1]
