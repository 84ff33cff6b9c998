"""Common-neighbor link prediction over the simple undirected graph.

Engine extension beyond the reference's operator set (the link-graph
analytics family next to PageRank / CC / triangles): for every
NON-adjacent pair {u, v}, the classic link-prediction scores —
cn = |N(u) ∩ N(v)| (common neighbors) and the preferential-attachment
product deg(u)·deg(v) — as exact int64, top-k by (cn DESC, u, v).
Adamic-Adar / Jaccard / cosine variants are one caller-side float away
from the same integral statistics (the assortativity_stats
discipline).

Scale notes: wedge enumeration through each center node is the one
inherently Σ deg(w)² stage of common-neighbor scoring (same bound as
triangle counting's unoriented form). The map_groups pass keeps each
center's neighbor list co-located and emits pairs via shifted-run
comparisons — vectorized within the group, no per-row Python. On
hub-heavy graphs callers should pre-sparsify or cap center degree
upstream (the contract query runs on the sparsified events graph, the
mis_events discipline); an exact top-k cannot skip hubs, so there is
deliberately no silent cap here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _canon_batch(t: pa.Table) -> pa.Table:
    """Canonical (u < v) simple-edge rows, loops dropped, batch-local
    dedupe (the global dedupe is the groupby downstream)."""
    i64 = pa.int64()
    if t.num_rows == 0:
        return pa.table({"u": pa.array([], i64),
                         "v": pa.array([], i64)})
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    return pa.table({"u": pa.array(pairs[:, 0], i64),
                     "v": pa.array(pairs[:, 1], i64)})


def common_neighbor_candidates(edges_ds, k: int = 20,
                               join_partitions: int | None = None
                               ) -> pa.Table:
    """Top-``k`` link predictions: (u, v, cn, pa_score) for
    non-adjacent pairs of the simple undirected graph of ``edges_ds``
    (int64 src/dst), ordered by (cn DESC, u ASC, v ASC) — a total
    order since {u, v} pairs are unique. Exact int64 throughout.

    Existing edges are removed WITHOUT an anti-join: edge rows ride
    the same shuffle as the wedge pair counts with an edge flag, and
    one groupby drops every pair whose flag sum is positive. Degrees
    attach to the ≤ k winners only (broadcast key fetch over the
    degree aggregate).
    """
    from ..stages.join import default_join_partitions

    i64 = pa.int64()
    nparts = join_partitions or default_join_partitions()
    empty_pairs = pa.table({"u": pa.array([], i64),
                            "v": pa.array([], i64),
                            "cnt": pa.array([], i64),
                            "flag": pa.array([], i64)})

    # distinct simple edges (one groupby — the global dedupe)
    E = (edges_ds.map_batches(_canon_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
         .groupby(["u", "v"]).count()
         .map_batches(lambda t: t.select(["u", "v"]),
                      batch_format="pyarrow", zero_copy_batch=True)
         .materialize())

    adj = E.map_batches(
        lambda t: pa.table({
            "w": pa.concat_arrays([t.column("u").combine_chunks(),
                                   t.column("v").combine_chunks()]),
            "nbr": pa.concat_arrays([t.column("v").combine_chunks(),
                                     t.column("u").combine_chunks()])}),
        batch_format="pyarrow", zero_copy_batch=True)

    def emit_pairs(t: pa.Table) -> pa.Table:
        """All neighbor pairs through the batch's centers: sort by
        (w, nbr), then one shifted comparison per distance d —
        vectorized; within-run sorted order makes pairs canonical
        (u < v) for free. map_groups co-locates whole groups, so runs
        never split across calls."""
        if t.num_rows == 0:
            return empty_pairs
        w = t.column("w").to_numpy(zero_copy_only=False)
        nb = t.column("nbr").to_numpy(zero_copy_only=False)
        o = np.lexsort((nb, w))
        w, nb = w[o], nb[o]
        us, vs = [], []
        d = 1
        while d < len(w):
            same = w[d:] == w[:-d]
            if not same.any():
                break
            idx = np.flatnonzero(same)
            us.append(nb[idx])
            vs.append(nb[idx + d])
            d += 1
        if not us:
            return empty_pairs
        u = np.concatenate(us)
        v = np.concatenate(vs)
        return pa.table({"u": pa.array(u, i64), "v": pa.array(v, i64),
                         "cnt": pa.array(np.ones(len(u), np.int64)),
                         "flag": pa.array(np.zeros(len(u), np.int64))})

    wedges = adj.groupby("w").map_groups(
        emit_pairs, batch_format="pyarrow")

    edge_flags = E.map_batches(
        lambda t: pa.table({
            "u": t.column("u"), "v": t.column("v"),
            "cnt": pa.array(np.zeros(t.num_rows, np.int64)),
            "flag": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)

    def block_topk(t: pa.Table) -> pa.Table:
        out_schema = pa.table({"u": pa.array([], i64),
                               "v": pa.array([], i64),
                               "cn": pa.array([], i64)})
        if t.num_rows == 0:
            return out_schema
        keep = pc.equal(t.column("sum(flag)"), pa.scalar(0, i64))
        t = pa.table({"u": t.column("u"), "v": t.column("v"),
                      "cn": t.column("sum(cnt)").cast(i64)}).filter(keep)
        if t.num_rows <= k:
            return t
        o = np.lexsort((t.column("v").to_numpy(),
                        t.column("u").to_numpy(),
                        -t.column("cn").to_numpy()))[:k]
        return t.take(pa.array(np.sort(o)))

    top = (wedges.union(edge_flags)
           .groupby(["u", "v"]).sum(["cnt", "flag"])
           .map_batches(block_topk, batch_format="pyarrow",
                        zero_copy_batch=True)
           .sort(["cn", "u", "v"], descending=[True, False, False])
           .limit(k).to_pandas())

    if len(top) == 0:
        return pa.table({"u": pa.array([], i64),
                         "v": pa.array([], i64),
                         "cn": pa.array([], i64),
                         "pa_score": pa.array([], i64)})

    # degrees for ONLY the winners' nodes (broadcast key fetch over
    # the degree aggregate — the bigram_collocations discipline)
    want = np.unique(np.concatenate([
        top["u"].to_numpy(), top["v"].to_numpy()]))
    wref = ray.put(pa.array(want, i64))

    def keep_winner_degs(t: pa.Table, *, wref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"w": pa.array([], i64),
                             "deg": pa.array([], i64)})
        ws = ray.get(wref) if isinstance(wref, ray.ObjectRef) else wref
        t = pa.table({"w": t.column("w"),
                      "deg": t.column("count()").cast(i64)})
        return t.filter(pc.is_valid(pc.index_in(t.column("w"),
                                                value_set=ws)))

    degs = (adj.groupby("w").count()
            .map_batches(keep_winner_degs, fn_kwargs={"wref": wref},
                         batch_format="pyarrow")
            .to_pandas())
    dmap = dict(zip(degs["w"], degs["deg"]))
    pa_score = [int(dmap[u]) * int(dmap[v])
                for u, v in zip(top["u"], top["v"])]
    return pa.table({
        "u": pa.array(top["u"].to_numpy(), i64),
        "v": pa.array(top["v"].to_numpy(), i64),
        "cn": pa.array(top["cn"].to_numpy(), i64),
        "pa_score": pa.array(pa_score, i64)})


LINKPRED_SQL = """
    WITH e0 AS ({edges}),
         e AS (SELECT DISTINCT least(src, dst) AS u,
                      greatest(src, dst) AS v
               FROM e0 WHERE src <> dst),
         adj AS (SELECT u AS w, v AS nbr FROM e
                 UNION ALL SELECT v, u FROM e),
         wedge AS (SELECT a.nbr AS u, b.nbr AS v, COUNT(*) AS cn
                   FROM adj a JOIN adj b
                     ON b.w = a.w AND b.nbr > a.nbr
                   GROUP BY 1, 2),
         nonedge AS (SELECT w.u, w.v, w.cn FROM wedge w
                     LEFT JOIN e ON e.u = w.u AND e.v = w.v
                     WHERE e.u IS NULL),
         deg AS (SELECT w, COUNT(*) AS d FROM adj GROUP BY w)
    SELECT n.u, n.v, n.cn, du.d * dv.d AS pa_score
    FROM nonedge n
    JOIN deg du ON du.w = n.u
    JOIN deg dv ON dv.w = n.v
    ORDER BY n.cn DESC, n.u ASC, n.v ASC
    LIMIT {k}
"""


def two_hop_ball_sizes(edges_ds, join_partitions: int | None = None
                       ) -> pa.Table:
    """Per-node 2-hop ball size over the simple undirected graph:
    |{v : dist(u, v) <= 2}| including u itself — the friend-of-friend
    reach statistic. Returns (node, ball2) sorted by node, exact
    int64.

    Scale shape: the common_neighbor_candidates wedge pass (Σ deg²
    inherently — run on sparsified/capped graphs, the linkpred
    contract discipline) emits (node, reach) rows for both wedge
    orientations; direct neighbors and the self row ride the same
    stream; one groupby dedupes (node, reach) and a per-batch count
    partial + a tiny second groupby produce the sizes.
    """
    from ..stages.join import default_join_partitions

    i64 = pa.int64()
    nparts = join_partitions or default_join_partitions()
    del nparts  # groupbys size themselves; kept for API symmetry

    E = (edges_ds.map_batches(_canon_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
         .groupby(["u", "v"]).count()
         .map_batches(lambda t: t.select(["u", "v"]),
                      batch_format="pyarrow", zero_copy_batch=True)
         .materialize())

    adj = E.map_batches(
        lambda t: pa.table({
            "w": pa.concat_arrays([t.column("u").combine_chunks(),
                                   t.column("v").combine_chunks()]),
            "nbr": pa.concat_arrays([t.column("v").combine_chunks(),
                                     t.column("u").combine_chunks()])}),
        batch_format="pyarrow", zero_copy_batch=True)

    def emit_reach(t: pa.Table) -> pa.Table:
        """Wedge pairs through the group's centers, both orientations,
        PLUS the direct (w→nbr) and self (w→w) rows."""
        empty = pa.table({"node": pa.array([], i64),
                          "reach": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        w = t.column("w").to_numpy(zero_copy_only=False)
        nb = t.column("nbr").to_numpy(zero_copy_only=False)
        o = np.lexsort((nb, w))
        w, nb = w[o], nb[o]
        nodes = [nb, w, w]            # direct (both dirs arrive via
        reach = [w, nb, w]            # adj) + self rows
        d = 1
        while d < len(w):
            same = w[d:] == w[:-d]
            if not same.any():
                break
            idx = np.flatnonzero(same)
            nodes.append(nb[idx])
            reach.append(nb[idx + d])
            nodes.append(nb[idx + d])
            reach.append(nb[idx])
            d += 1
        n = np.concatenate(nodes)
        r = np.concatenate(reach)
        pairs = np.unique(np.stack([n, r], axis=1), axis=0)
        return pa.table({"node": pa.array(pairs[:, 0], i64),
                         "reach": pa.array(pairs[:, 1], i64)})

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], i64),
                             "cnt": pa.array([], i64)})
        node = t.column("node").to_numpy(zero_copy_only=False)
        uniq, cnts = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(uniq, i64),
                         "cnt": pa.array(cnts.astype(np.int64), i64)})

    agg = (adj.groupby("w").map_groups(emit_reach,
                                       batch_format="pyarrow")
           .groupby(["node", "reach"]).count()
           .map_batches(count_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("node").sum("cnt"))
    t = agg.to_pandas()
    if t.empty:
        return pa.table({"node": pa.array([], i64),
                         "ball2": pa.array([], i64)})
    t = t.sort_values("node")
    return pa.table({
        "node": pa.array(t["node"].to_numpy(), i64),
        "ball2": pa.array(t["sum(cnt)"].to_numpy().astype(np.int64),
                          i64)})


TWO_HOP_SQL = """
    WITH e0 AS ({edges}),
         e AS (SELECT DISTINCT least(src, dst) AS u,
                      greatest(src, dst) AS v
               FROM e0 WHERE src <> dst),
         adj AS (SELECT u AS w, v AS nbr FROM e
                 UNION ALL SELECT v, u FROM e),
         reach AS (SELECT w AS node, nbr AS r FROM adj
                   UNION
                   SELECT a.nbr, b.nbr FROM adj a JOIN adj b
                     ON b.w = a.w AND b.nbr <> a.nbr
                   UNION
                   SELECT w, w FROM adj)
    SELECT node, COUNT(*) AS ball2
    FROM reach GROUP BY node ORDER BY node
"""
