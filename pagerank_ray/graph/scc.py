"""Strongly connected components (directed) — pivot-min
forward/backward label intersection, completing the engine's classic
graph-algorithm set (PageRank / CC / LPA / BFS / k-core / triangles).

Per outer round, over the still-unresolved subgraph:

  fwd(v) = min id over {v} ∪ ancestors(v)    (directed min-label
  bwd(v) = min id over {v} ∪ descendants(v)   propagation — the CC
                                              machinery with
                                              allow_directed=True, on
                                              the forward and REVERSED
                                              edge layouts)

``fwd(v) == bwd(v) == m`` certifies v ∈ SCC(m) (m reaches v and v
reaches m). The SCC of each round's level-minimum pivots resolves in
full (its members see no smaller outside ancestor/descendant), so
every round strictly shrinks the residual; rounds ≤ #SCCs, and in
practice a handful (all "level-min" SCCs resolve simultaneously).

Scale notes: the two propagations per round are the heavy distributed
work (actor-pinned CSR shards, delta frontier). The per-round
residual filter broadcasts the unresolved NODE set (node-dimension,
like the heavy-target list) — at 10^12 nodes swap it for a hash
semi-join on the edge stream; the per-round (node, root) resolution
tables are result-sized. Ids are assigned per round-build
(sorted-name order on the SAME node set for fwd and rev, so ids align
across the two layouts); output labels are node NAMES, which are
stable across rounds, partitioning and worker count.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from . import build as gb
from .components import connected_components


def _to_ds(x):
    return rd.from_arrow(x) if isinstance(x, pa.Table) else x


def _propagate(graph_dir: str) -> pa.Table:
    """Directed min-label propagation; (id, node, label) sorted by id."""
    return connected_components(graph_dir, allow_directed=True)


def scc_labels(edges, num_parts: int = 4,
               max_outer: int = 10_000) -> pa.Table:
    """(node, root) per node — root = NAME of the SCC's minimum-id
    member (ids in sorted-name order, so root is the
    lexicographically smallest member). Sorted by node."""
    ds = _to_ds(edges).materialize()

    out_nodes: list = []
    out_roots: list = []
    unresolved: "np.ndarray | None" = None  # None = first round
    rounds = 0
    while True:
        if rounds >= max_outer:
            raise RuntimeError(
                f"SCC did not resolve within {max_outer} rounds")
        work = tempfile.mkdtemp(prefix="scc_round_")
        try:
            if unresolved is None:
                round_edges = ds
                loops = None
            else:
                if len(unresolved) == 0:
                    break
                keep_set = pa.array(unresolved, pa.string())
                kref = ray.put(keep_set)

                def both_alive(t: pa.Table, *, kref) -> pa.Table:
                    ks = ray.get(kref) if isinstance(
                        kref, ray.ObjectRef) else kref
                    m = pc.and_(
                        pc.is_in(t.column("src"), value_set=ks),
                        pc.is_in(t.column("dst"), value_set=ks))
                    return t.filter(m)

                round_edges = ds.map_batches(
                    both_alive, fn_kwargs={"kref": kref},
                    batch_format="pyarrow", zero_copy_batch=True)
                # self-loops keep isolated unresolved nodes in the
                # build (their SCC is the singleton {v})
                loops = rd.from_arrow(pa.table({
                    "src": keep_set, "dst": keep_set}))
                round_edges = round_edges.union(loops).materialize()

            fdir = f"{work}/fwd"
            rdir = f"{work}/rev"
            gb.build_graph(round_edges, fdir, num_parts=num_parts)

            def swap(t: pa.Table) -> pa.Table:
                return pa.table({"src": t.column("dst"),
                                 "dst": t.column("src")})

            gb.build_graph(
                round_edges.map_batches(swap, batch_format="pyarrow",
                                        zero_copy_batch=True),
                rdir, num_parts=num_parts)

            fwd = _propagate(fdir)
            bwd = _propagate(rdir)
            # same node set, same sorted-name id assignment -> rows
            # align 1:1 by id across the two layouts
            names = fwd.column("node").to_numpy(zero_copy_only=False)
            f = fwd.column("label").to_numpy()
            b = bwd.column("label").to_numpy()
            resolved = f == b
            if not resolved.any():
                raise AssertionError(
                    "pivot-min round resolved nothing — the level-min "
                    "SCC always resolves; graph build is inconsistent")
            out_nodes.append(names[resolved])
            out_roots.append(names[f[resolved]])
            unresolved = names[~resolved]
            rounds += 1
            if len(unresolved) == 0:
                break
        finally:
            shutil.rmtree(work, ignore_errors=True)

    nodes = np.concatenate(out_nodes)
    roots = np.concatenate(out_roots)
    order = np.argsort(nodes, kind="stable")
    return pa.table({
        "node": pa.array(nodes[order].astype(object), pa.string()),
        "root": pa.array(roots[order].astype(object), pa.string()),
    })
