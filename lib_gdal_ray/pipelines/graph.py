"""GNM (Geographic Network Model) analysis — the reference's graph model
re-expressed over Ray Data.

Semantics re-derived from the reference (NOT ported code):

- graph model (vertex/edge FIDs, bidir flag, dir/inv cost, block state):
  gnm/gnmgraph.h:59-105
- Dijkstra shortest-path tree: gnm/gnmgraph.cpp:457-541
  (``DijkstraShortestPathTree``).  Parity quirks mirrored exactly:
  * traversal of ANY out-edge charges ``dfDirCost`` — even when a
    bidirectional edge is walked target->source (the reference comment
    at gnmgraph.cpp:514-516: "We go in any edge from source to target so
    we take only direct cost"); ``dfInvCost`` is stored but never read
    by the analysis methods;
  * a bidirectional edge is registered in BOTH endpoint out-lists
    (gnmgraph.cpp:107-115), a directed edge only in the source's;
  * the priority queue is a ``std::multimap`` — equal costs pop in
    insertion order (mirrored with a monotonic sequence number);
  * relaxation requires the target to be unseen, unblocked, and the new
    mark STRICTLY smaller (gnmgraph.cpp:527-534) — ties keep the first
    via-edge;
  * vertices popped twice (stale queue entries) still re-relax; with
    non-negative costs the resulting tree is identical.
- path extraction (vertex, incoming-edge) pairs, start paired with -1:
  gnmgraph.cpp:185-240.
- Yen K-shortest paths incl. the infinity-cost edge masking, the
  first-saved-cost restore map, root-node out-edge removal and the
  duplicate-candidate purge: gnmgraph.cpp:247-425.
- BFS connected components (``TraceTargets``): every out-edge of every
  visited vertex is emitted as a (vertex, edge) pair — including edges
  leading back to already-marked vertices; blocked state is only
  checked on the TARGET vertex, never on edges: gnmgraph.cpp:427-450,
  570-633.
- ConnectPointsByLines: line start/end snapped to the FIRST point
  feature (lowest (layer, fid)) whose coordinates fall in the
  ±tolerance/2 rectangle (``FindNearestPoint`` despite its name returns
  the first hit, not the nearest): gnm/gnmgenericnetwork.cpp:536-931.
  Duplicate edge ids are rejected (gnmgraph.cpp:74-84) — keep-first.

Ray-Data-first shape: the edge list is a Dataset; analysis over a big
graph runs as frontier-relaxation rounds (map_batches over the arc
table with the frontier broadcast via ``ray.put`` each round —
Bellman-Ford, round count bounded by the path diameter).  The reference
itself holds the WHOLE graph in driver memory (gnmgraph.h:84-88 "NOTE:
GNMGraph holds the whole graph in memory"), so the exact-parity kernel
(``GNMGraphLocal``) contracting the edge table into one Ray task is
already beyond the reference's scale contract; the distributed
relaxation path keeps the EDGES out of any single process and only the
vertex->cost map on the driver (O(reachable vertices) — see SCALE.md).
"""
from __future__ import annotations

import heapq
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

GNM_EDGE_DIR_BOTH = 0
GNM_EDGE_DIR_SRCTOTGT = 1
GNM_EDGE_DIR_TGTTOSRC = 2

_INF = float("inf")


class GNMGraphLocal:
    """Exact-parity in-memory kernel (GNMGraph analog, gnm/gnmgraph.h:91).

    Used as the per-task kernel when the edge table is small enough to
    contract, and as the oracle in tests.
    """

    def __init__(self) -> None:
        # vertex fid -> [out edge fids];  insertion order preserved
        self._out: Dict[int, List[int]] = {}
        self._vblocked: Dict[int, bool] = {}
        # edge fid -> [src, tgt, bidir, dir_cost, inv_cost, blocked]
        self._edges: Dict[int, list] = {}

    # -- construction ------------------------------------------------
    def add_vertex(self, fid: int) -> None:
        if fid not in self._out:
            self._out[fid] = []
            self._vblocked[fid] = False

    def add_edge(self, con_fid: int, src: int, tgt: int, bidir: bool,
                 dir_cost: float, inv_cost: float) -> bool:
        if con_fid in self._edges:     # one source/target per edge id
            return False               # gnmgraph.cpp:74-84
        self.add_vertex(src)
        self.add_vertex(tgt)
        self._edges[con_fid] = [src, tgt, bool(bidir), float(dir_cost),
                                float(inv_cost), False]
        self._out[src].append(con_fid)
        if bidir:
            self._out[tgt].append(con_fid)
        return True

    def change_block_state(self, fid: int, block: bool) -> None:
        # vertices win over edges on id collision (gnmgraph.cpp:142-158)
        if fid in self._vblocked:
            self._vblocked[fid] = block
        elif fid in self._edges:
            self._edges[fid][5] = block

    def change_all_block_state(self, block: bool) -> None:
        for v in self._vblocked:
            self._vblocked[v] = block
        for e in self._edges.values():
            e[5] = block

    def _opposite(self, edge_fid: int, vertex_fid: int) -> int:
        e = self._edges.get(edge_fid)
        if e is None:
            return -1
        if vertex_fid == e[0]:
            return e[1]
        if vertex_fid == e[1]:
            return e[0]
        return -1

    # -- Dijkstra ----------------------------------------------------
    def dijkstra_tree(self, start: int,
                      cost_override: Optional[Dict[int, float]] = None
                      ) -> Dict[int, int]:
        """vertex -> incoming edge fid (start -> -1).

        gnmgraph.cpp:457-541 semantics; ``cost_override`` maps edge fid
        -> dfDirCost (Yen's infinity masking).
        """
        marks = {v: _INF for v in self._out}
        tree: Dict[int, int] = {start: -1}
        marks[start] = 0.0
        seen = set()
        seq = 0
        to_see: List[Tuple[float, int, int]] = [(0.0, seq, start)]
        while to_see:
            mark, _, cur = heapq.heappop(to_see)
            seen.add(cur)
            for eid in self._out.get(cur, ()):
                e = self._edges.get(eid)
                if e is None or e[5]:
                    continue
                cost = e[3] if cost_override is None else \
                    cost_override.get(eid, e[3])
                tgt = self._opposite(eid, cur)
                new = mark + cost
                if (tgt not in seen and new < marks.get(tgt, 0.0)
                        and not self._vblocked.get(tgt, False)):
                    marks[tgt] = new
                    tree[tgt] = eid
                    seq += 1
                    heapq.heappush(to_see, (new, seq, tgt))
        return tree

    def dijkstra(self, start: int, end: int,
                 cost_override: Optional[Dict[int, float]] = None
                 ) -> List[Tuple[int, int]]:
        """[(vertex, incoming edge)], start paired with -1; [] if no
        path (gnmgraph.cpp:185-240)."""
        tree = self.dijkstra_tree(start, cost_override)
        path: List[Tuple[int, int]] = []
        nxt = end
        while True:
            if nxt not in tree:
                return []
            if nxt == start:
                path.append((nxt, -1))
                path.reverse()
                return path
            eid = tree[nxt]
            path.append((nxt, eid))
            nxt = self._opposite(eid, nxt)

    # -- Yen K shortest paths ----------------------------------------
    def k_shortest_paths(self, start: int, end: int, k: int
                         ) -> List[List[Tuple[int, int]]]:
        """gnmgraph.cpp:247-425 (Yen) — paths in ascending cost order."""
        if k <= 0:
            return []
        first = self.dijkstra(start, end)
        if not first:
            return []
        a: List[List[Tuple[int, int]]] = [first]
        # candidate list kept sorted by (cost, insertion seq) — the
        # std::multimap<double, GNMPATH> analog
        b: List[Tuple[float, int, List[Tuple[int, int]]]] = []
        bseq = 0

        def edge_cost(eid: int) -> float:
            e = self._edges.get(eid)
            return 0.0 if e is None else e[3]

        for _k in range(k - 1):
            prev = a[-1]
            for i in range(len(prev) - 1):
                # masked edges get infinity cost for this spur search;
                # the reference saves+restores the costs around each
                # Dijkstra (gnmgraph.cpp:325-376) — the restore is
                # complete each iteration, so a per-iteration mask set
                # is equivalent
                masked: Dict[int, float] = {}
                spur = prev[i][0]
                root = prev[:i + 1]
                # mask the follow-edge of every found path sharing root
                for pth in a:
                    if i >= len(pth):
                        continue
                    if pth[:i + 1] == root and i < len(pth) - 1:
                        masked[pth[i + 1][1]] = _INF
                # mask every out-edge of the root nodes (spur excluded)
                for vtx, _ in root[:-1]:
                    for eid in self._out.get(vtx, ()):
                        masked[eid] = _INF
                spur_path = self.dijkstra(spur, end, masked)
                if spur_path:
                    full = root + spur_path[1:]
                    cost = sum(edge_cost(eid) for _, eid in full
                               if eid != -1)
                    bseq += 1
                    heapq.heappush(b, (cost, bseq, full))
            if not b:
                break
            a.append(heapq.heappop(b)[2])
            while b and b[0][2] == a[-1]:
                heapq.heappop(b)
        return a

    # -- BFS connected trace -----------------------------------------
    def connected_components(self, emitters: Sequence[int]
                             ) -> List[Tuple[int, int]]:
        """(vertex, out-edge) pairs in BFS visit order
        (gnmgraph.cpp:427-450 + TraceTargets :570-633)."""
        connected: List[Tuple[int, int]] = []
        marked = set()
        queue = list(emitters)
        while queue:
            nxt: List[int] = []
            for cur in queue:
                if cur in marked:
                    continue
                marked.add(cur)
                for eid in self._out.get(cur, ()):
                    connected.append((cur, eid))
                    tgt = self._opposite(eid, cur)
                    if tgt not in marked and \
                            not self._vblocked.get(tgt, False):
                        nxt.append(tgt)
            queue = nxt
        return connected


# ---------------------------------------------------------------------------
# edge-table <-> kernel bridges
# ---------------------------------------------------------------------------

EDGE_SCHEMA = pa.schema([
    ("edge_id", pa.int64()), ("src", pa.int64()), ("tgt", pa.int64()),
    ("bidir", pa.bool_()), ("dir_cost", pa.float64()),
    ("inv_cost", pa.float64()),
])


def graph_from_table(tbl: pa.Table,
                     blocked: Optional[Iterable[int]] = None
                     ) -> GNMGraphLocal:
    """Edge table (EDGE_SCHEMA columns) -> exact-parity kernel.

    Rows are inserted in table order — duplicate edge ids keep the
    first occurrence, matching GNMGraph::AddEdge.
    """
    g = GNMGraphLocal()
    eid = tbl["edge_id"].to_numpy(zero_copy_only=False)
    src = tbl["src"].to_numpy(zero_copy_only=False)
    tgt = tbl["tgt"].to_numpy(zero_copy_only=False)
    bid = tbl["bidir"].to_numpy(zero_copy_only=False)
    dc = tbl["dir_cost"].to_numpy(zero_copy_only=False)
    ic = (tbl["inv_cost"].to_numpy(zero_copy_only=False)
          if "inv_cost" in tbl.column_names else dc)
    for i in range(len(eid)):
        g.add_edge(int(eid[i]), int(src[i]), int(tgt[i]), bool(bid[i]),
                   float(dc[i]), float(ic[i]))
    if blocked:
        for fid in blocked:
            g.change_block_state(int(fid), True)
    return g


def _edges_table(edges) -> pa.Table:
    """Contract an edge Dataset (or passthrough table) into one table."""
    if isinstance(edges, pa.Table):
        return edges
    tbls = ray.get(edges.to_arrow_refs())
    tbls = [t for t in tbls if t.num_rows]
    if not tbls:
        return EDGE_SCHEMA.empty_table()
    return pa.concat_tables([t.select(EDGE_SCHEMA.names) for t in tbls],
                            promote_options="permissive")


# ---------------------------------------------------------------------------
# distributed analysis
# ---------------------------------------------------------------------------

_ARC_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                         ("cost", pa.float64()), ("edge_id", pa.int64())])


def _arcs(batch: pa.Table) -> pa.Table:
    """Edge rows -> directed arc rows. A bidir edge contributes both
    directions, BOTH charged dir_cost (the reference quirk)."""
    if batch.num_rows == 0 or "src" not in batch.column_names:
        return _ARC_SCHEMA.empty_table()
    src = batch["src"].to_numpy(zero_copy_only=False)
    tgt = batch["tgt"].to_numpy(zero_copy_only=False)
    bid = batch["bidir"].to_numpy(zero_copy_only=False).astype(bool)
    cost = batch["dir_cost"].to_numpy(zero_copy_only=False)
    eid = batch["edge_id"].to_numpy(zero_copy_only=False)
    u = np.concatenate([src, tgt[bid]])
    v = np.concatenate([tgt, src[bid]])
    c = np.concatenate([cost, cost[bid]])
    e = np.concatenate([eid, eid[bid]])
    return pa.table({"u": u.astype(np.int64), "v": v.astype(np.int64),
                     "cost": c.astype(np.float64),
                     "edge_id": e.astype(np.int64)})


def shortest_path_costs(edges: "ray.data.Dataset", start: int,
                        blocked: Optional[Iterable[int]] = None,
                        max_rounds: int = 10_000) -> pa.Table:
    """Distributed single-source shortest-path costs (Bellman-Ford
    frontier relaxation; identical costs to GNMGraph Dijkstra since all
    GNM costs are traversal sums of dfDirCost).

    Edges stream through map_batches each round; only the vertex->cost
    map lives on the driver (O(reachable vertices)).  Returns a table
    (vertex:int64, cost:float64) sorted by vertex, start included at 0.
    """
    blocked_set = frozenset(int(b) for b in blocked) if blocked else \
        frozenset()
    arcs = edges.map_batches(_arcs, batch_format="pyarrow")
    if blocked_set:
        def drop_blocked(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "v" not in batch.column_names:
                return _ARC_SCHEMA.empty_table()
            v = batch["v"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(v, np.fromiter(blocked_set, dtype=np.int64))
            return batch.filter(pa.array(keep))
        arcs = arcs.map_batches(drop_blocked, batch_format="pyarrow")
    arcs = arcs.materialize()

    dist: Dict[int, float] = {int(start): 0.0}
    frontier: Dict[int, float] = dict(dist)
    rounds = 0
    while frontier and rounds < max_rounds:
        rounds += 1
        fref = ray.put(frontier)

        def relax(batch: pa.Table, *, _f=fref) -> pa.Table:
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "cost": pa.array([], pa.float64())})
            fr: Dict[int, float] = ray.get(_f) if isinstance(
                _f, ray.ObjectRef) else _f
            u = batch["u"].to_numpy(zero_copy_only=False)
            keys = np.fromiter(fr.keys(), dtype=np.int64, count=len(fr))
            vals = np.fromiter(fr.values(), dtype=np.float64,
                               count=len(fr))
            order = np.argsort(keys)
            keys, vals = keys[order], vals[order]
            pos = np.searchsorted(keys, u)
            pos[pos >= len(keys)] = 0
            hit = keys[pos] == u
            if not hit.any():
                return pa.table({"v": pa.array([], pa.int64()),
                                 "cost": pa.array([], pa.float64())})
            v = batch["v"].to_numpy(zero_copy_only=False)[hit]
            nc = vals[pos[hit]] + \
                batch["cost"].to_numpy(zero_copy_only=False)[hit]
            # per-batch partial min per target
            o = np.lexsort((nc, v))
            v, nc = v[o], nc[o]
            first = np.ones(len(v), dtype=bool)
            first[1:] = v[1:] != v[:-1]
            return pa.table({"v": v[first].astype(np.int64),
                             "cost": nc[first].astype(np.float64)})

        parts = ray.get(
            arcs.map_batches(relax, batch_format="pyarrow")
                .to_arrow_refs())
        frontier = {}
        for t in parts:
            if t.num_rows == 0 or "v" not in t.column_names:
                continue
            for vtx, c in zip(t["v"].to_numpy(zero_copy_only=False),
                              t["cost"].to_numpy(zero_copy_only=False)):
                vtx, c = int(vtx), float(c)
                if c < dist.get(vtx, _INF) and c < frontier.get(vtx, _INF):
                    frontier[vtx] = c
        for vtx, c in frontier.items():
            dist[vtx] = c
    vs = np.fromiter(dist.keys(), dtype=np.int64, count=len(dist))
    cs = np.fromiter(dist.values(), dtype=np.float64, count=len(dist))
    order = np.argsort(vs)
    return pa.table({"vertex": vs[order], "cost": cs[order]})


def reachable_vertices(edges: "ray.data.Dataset",
                       emitters: Sequence[int],
                       blocked: Optional[Iterable[int]] = None
                       ) -> pa.Table:
    """Distributed ConnectedComponents vertex set: every vertex reached
    by the BFS from the emitter set (emitters themselves included),
    respecting blocked target vertices — keys-not-order per SURVEY §2.9
    (the reference's (vertex, edge) visit ORDER is an artifact of its
    in-memory queue; the exact ordered trace is available from
    GNMGraphLocal.connected_components).

    Returns (vertex:int64) sorted.
    """
    blocked_set = frozenset(int(b) for b in blocked) if blocked else \
        frozenset()
    arcs = edges.map_batches(_arcs, batch_format="pyarrow").materialize()
    marked = set(int(e) for e in emitters)
    frontier = set(marked)
    while frontier:
        fref = ray.put(np.fromiter(frontier, dtype=np.int64,
                                   count=len(frontier)))

        def expand(batch: pa.Table, *, _f=fref) -> pa.Table:
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return pa.table({"v": pa.array([], pa.int64())})
            fr = ray.get(_f) if isinstance(_f, ray.ObjectRef) else _f
            u = batch["u"].to_numpy(zero_copy_only=False)
            fr = np.sort(fr)
            pos = np.searchsorted(fr, u)
            pos[pos >= len(fr)] = 0
            hit = fr[pos] == u
            v = np.unique(batch["v"].to_numpy(zero_copy_only=False)[hit])
            return pa.table({"v": v.astype(np.int64)})

        parts = ray.get(
            arcs.map_batches(expand, batch_format="pyarrow")
                .to_arrow_refs())
        nxt = set()
        for t in parts:
            if t.num_rows == 0 or "v" not in t.column_names:
                continue
            for vtx in t["v"].to_numpy(zero_copy_only=False):
                vtx = int(vtx)
                if vtx not in marked and vtx not in blocked_set:
                    nxt.add(vtx)
        marked |= nxt
        frontier = nxt
    out = np.fromiter(marked, dtype=np.int64, count=len(marked))
    out.sort()
    return pa.table({"vertex": out})


def shortest_path(edges, start: int, end: int,
                  blocked: Optional[Iterable[int]] = None) -> pa.Table:
    """GNM GetPath(GATDijkstraShortestPath) analog: exact (vertex,
    incoming-edge) path rows.  The edge table is contracted into one
    task (the reference's own whole-graph-in-memory contract,
    gnmgraph.h:84-88); use shortest_path_costs for the streamed
    cost-only variant on big graphs.

    Returns (step:int64, vertex_fid:int64, edge_fid:int64).
    """
    tbl = _edges_table(edges)
    blocked_list = list(blocked) if blocked else []

    @ray.remote
    def run(t: pa.Table) -> pa.Table:
        g = graph_from_table(t, blocked_list)
        path = g.dijkstra(int(start), int(end))
        return pa.table({
            "step": pa.array(range(len(path)), pa.int64()),
            "vertex_fid": pa.array([p[0] for p in path], pa.int64()),
            "edge_fid": pa.array([p[1] for p in path], pa.int64())})

    return ray.get(run.remote(tbl))


def k_shortest_paths(edges, start: int, end: int, k: int,
                     blocked: Optional[Iterable[int]] = None) -> pa.Table:
    """GNM GetPath(GATKShortestPath) analog (Yen).  Contracted single
    task, like the reference (KSP is inherently whole-graph).

    Returns (path_rank:int64, step:int64, vertex_fid:int64,
    edge_fid:int64, path_cost:float64), ranks in ascending cost order.
    """
    tbl = _edges_table(edges)
    blocked_list = list(blocked) if blocked else []

    @ray.remote
    def run(t: pa.Table) -> pa.Table:
        g = graph_from_table(t, blocked_list)
        paths = g.k_shortest_paths(int(start), int(end), int(k))
        rank, step, vf, ef, pc = [], [], [], [], []
        for r, p in enumerate(paths):
            cost = sum(g._edges[e][3] for _, e in p if e != -1)
            for s, (vtx, eid) in enumerate(p):
                rank.append(r)
                step.append(s)
                vf.append(vtx)
                ef.append(eid)
                pc.append(cost)
        return pa.table({"path_rank": pa.array(rank, pa.int64()),
                         "step": pa.array(step, pa.int64()),
                         "vertex_fid": pa.array(vf, pa.int64()),
                         "edge_fid": pa.array(ef, pa.int64()),
                         "path_cost": pa.array(pc, pa.float64())})

    return ray.get(run.remote(tbl))


# ---------------------------------------------------------------------------
# network building (ConnectPointsByLines analog)
# ---------------------------------------------------------------------------

def connect_points_by_lines(lines: "ray.data.Dataset",
                            points: "ray.data.Dataset",
                            tolerance: float,
                            cost: float = 1.0, inv_cost: float = 1.0,
                            direction: int = GNM_EDGE_DIR_BOTH,
                            line_fid_col: str = "gfid",
                            point_fid_col: str = "gfid",
                            geometry_col: str = "geometry"
                            ) -> "ray.data.Dataset":
    """Build the edge table from a line layer + a point layer
    (gnm/gnmgenericnetwork.cpp:536-931).

    For every LineString: snap start/end to the first point feature
    (lowest fid) whose coordinates lie within the ±tolerance/2 box; if
    both ends snap, emit an edge (edge_id = line fid).  The point side
    is broadcast once via ``ray.put`` (small side — wells/junctions),
    lines stream through map_batches.
    """
    from lib_gdal_ray.geom.wkb import parse_wkb

    pt_tbls = [t for t in ray.get(points.to_arrow_refs()) if t.num_rows]
    px, py, pfid = [], [], []
    for t in pt_tbls:
        wkbs = t[geometry_col].to_pylist()
        fids = t[point_fid_col].to_pylist()
        for i, buf in enumerate(wkbs):
            if buf is None:
                continue
            kind, payload = parse_wkb(buf)
            if kind != "point" or len(payload) == 0:
                continue
            px.append(float(payload[0][0]))
            py.append(float(payload[0][1]))
            pfid.append(int(fids[i]))
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    pfid = np.asarray(pfid, dtype=np.int64)
    order = np.argsort(pfid, kind="stable")   # first hit = lowest fid
    pref = ray.put((px[order], py[order], pfid[order]))
    half = float(tolerance) / 2.0
    bidir = direction == GNM_EDGE_DIR_BOTH

    def snap(batch: pa.Table, *, _p=pref) -> pa.Table:
        ax, ay, afid = ray.get(_p) if isinstance(_p, ray.ObjectRef) else _p
        wkbs = batch[geometry_col].to_pylist()
        lfid = batch[line_fid_col].to_numpy(zero_copy_only=False)
        eid, src, tgt = [], [], []

        def first_hit(x: float, y: float) -> int:
            hit = (np.abs(ax - x) <= half) & (np.abs(ay - y) <= half)
            idx = np.flatnonzero(hit)
            return int(afid[idx[0]]) if len(idx) else -1

        for i, buf in enumerate(wkbs):
            if buf is None:
                continue
            kind, payload = parse_wkb(buf)
            if kind == "linestring":
                parts = [payload]
            elif kind == "multilinestring":
                parts = payload
            else:
                continue
            for coords in parts:
                if len(coords) < 2:
                    continue
                s = first_hit(coords[0][0], coords[0][1])
                t_ = first_hit(coords[-1][0], coords[-1][1])
                if s == -1 or t_ == -1:
                    continue
                eid.append(int(lfid[i]))
                src.append(s)
                tgt.append(t_)
                break   # duplicate edge id rejected -> first part wins
        n = len(eid)
        return pa.table({
            "edge_id": pa.array(eid, pa.int64()),
            "src": pa.array(src, pa.int64()),
            "tgt": pa.array(tgt, pa.int64()),
            "bidir": pa.array([bidir] * n, pa.bool_()),
            "dir_cost": pa.array([float(cost)] * n, pa.float64()),
            "inv_cost": pa.array([float(inv_cost)] * n, pa.float64())})

    return lines.map_batches(snap, batch_format="pyarrow")
