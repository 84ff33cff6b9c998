"""BFS hop distances from a seed set (min-plus label propagation).

An engine EXTENSION beyond the reference's operator set (the
north-star "link-graph analytics engine" family next to PageRank /
CC / LPA / triangles): unweighted shortest hop counts from one or
more seed nodes, directed or undirected by whichever graph layout it
is pointed at.

Implementation rides the connected-components machinery unchanged —
the exchange is the same min-combined (target, value) message round
with delta-frontier activation; the only differences are the initial
state (INF everywhere, 0 at the seeds, frontier = seed set) and the
message value (dist+1 instead of the label, ``GraphWorker._msg_incr``).
Min-plus is idempotent and commutative, so results are exact and
independent of partitioning, worker count and exchange mode, and a
checkpointed run resumes to identical distances.

INF sentinel: unreached nodes hold n (also the exchange buffer's
"no message" fill — a real hop distance can never reach n in an
n-node graph, so the collision is unreachable). Collected output
drops INF rows (only reached nodes are returned).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from . import build as gb
from .actors import create_workers, kill_workers
from .components import (collect_labels, load_labels_manifest,
                         min_round)


def resolve_seed_ids(graph_dir: str, seed_nodes) -> np.ndarray:
    """Node names -> dense ids via the partitioned dictionary (small
    driver-side lookup — the seed set is a handful of rows)."""
    nodes = gb.load_nodes(graph_dir)
    want = pa.array([str(s) for s in seed_nodes], pa.string())
    mask = pc.is_in(nodes.column("node"), value_set=want)
    ids = nodes.column("id").filter(mask).to_numpy()
    if len(ids) != len(set(map(str, seed_nodes))):
        found = set(nodes.column("node").filter(mask).to_pylist())
        missing = sorted(set(map(str, seed_nodes)) - found)
        raise ValueError(f"seed nodes not in graph: {missing}")
    return ids


def bfs_distances(graph_dir: str, seed_nodes=None,
                  seed_ids=None, max_rounds: int = 10_000,
                  workers=None, num_workers: int | None = None,
                  exchange: str = "auto",
                  out_dir: str | None = None,
                  checkpoint_dir: str | None = None,
                  checkpoint_every: int = 0,
                  resume: bool = False,
                  stop_after: int | None = None
                  ) -> pa.Table | dict | None:
    """Hop distances from the seed set; returns (id, node, dist)
    sorted by id, REACHED nodes only. Same out_dir / checkpoint /
    stop_after contracts as connected_components."""
    if (seed_nodes is None) == (seed_ids is None):
        raise ValueError("pass exactly one of seed_nodes / seed_ids")
    if resume and checkpoint_dir is None:
        raise ValueError("resume=True requires checkpoint_dir")
    meta = gb.read_meta(graph_dir)
    if seed_ids is None:
        seed_ids = resolve_seed_ids(graph_dir, seed_nodes)
    # dedupe + bounds-check HERE: a negative id would survive the
    # per-shard `local < n_local` filter and numpy-negative-index the
    # wrong node silently
    seed_ids = np.unique(np.asarray(seed_ids, dtype=np.int64))
    if len(seed_ids) == 0:
        raise ValueError("empty seed set")
    if seed_ids[0] < 0 or seed_ids[-1] >= meta["n"]:
        raise ValueError(
            f"seed ids out of range [0, {meta['n']}): "
            f"{seed_ids[[0, -1]].tolist()}")

    own = workers is None
    W = workers or create_workers(graph_dir, meta,
                                  num_workers=num_workers)[0]
    if exchange == "auto":
        exchange = "split" if meta["n"] > 32_000_000 else "concat"

    def checkpoint(rnd: int, converged: bool) -> None:
        ray.get([w.labels_save.remote(checkpoint_dir, rnd) for w in W])
        gb._atomic_write_json(
            os.path.join(checkpoint_dir, "manifest.json"),
            {"algorithm": "bfs", "round": rnd, "converged": converged,
             "num_parts": meta["num_parts"],
             "seed_ids": sorted(seed_ids.tolist())})

    try:
        found = sum(ray.get([w.bfs_init.remote(seed_ids) for w in W]))
        assert found == len(seed_ids), \
            "graph shards did not cover every seed id"
        rnd = 0
        if resume:
            man = load_labels_manifest(checkpoint_dir)
            if man.get("algorithm") != "bfs" or \
                    man.get("num_parts") != meta["num_parts"] or \
                    man.get("seed_ids") != sorted(seed_ids.tolist()):
                raise ValueError(
                    f"checkpoint mismatch: manifest is "
                    f"{man.get('algorithm')!r}/{man.get('num_parts')}"
                    f"/seeds={man.get('seed_ids')}, this run is "
                    f"bfs/{meta['num_parts']}"
                    f"/seeds={sorted(seed_ids.tolist())}")
            rnd = man["round"]
            ray.get([w.labels_load.remote(checkpoint_dir, rnd)
                     for w in W])
        done_this_call = 0
        converged = False
        for _ in range(max_rounds):
            if stop_after is not None and done_this_call >= stop_after:
                if checkpoint_dir:
                    checkpoint(rnd, converged=False)
                return None
            changed = min_round(W, exchange)
            rnd += 1
            done_this_call += 1
            if changed == 0:
                converged = True
                break
            if checkpoint_dir and checkpoint_every and \
                    rnd % checkpoint_every == 0:
                checkpoint(rnd, converged=False)
        if not converged:
            # truncated distances are not BFS distances — fail loudly
            # (kcore_members discipline) instead of silently
            # returning/writing a partial frontier
            if checkpoint_dir:
                checkpoint(rnd, converged=False)
            raise RuntimeError(
                f"bfs_distances did not converge within "
                f"{max_rounds} rounds")
        if checkpoint_dir:
            checkpoint(rnd, converged=True)
        if out_dir is not None:
            from .sink import write_result_distributed
            return write_result_distributed(W, out_dir, "dist")
        t = collect_labels(W)
        dist = t.column("label")
        reached = pc.less(dist, pa.scalar(int(meta["n"]), pa.int64()))
        return pa.table({
            "id": t.column("id").filter(reached),
            "node": t.column("node").filter(reached),
            "dist": dist.filter(reached),
        })
    finally:
        if own:
            kill_workers(W)


def closeness_stats(graph_dir: str, seed_ids,
                    max_rounds: int = 10_000,
                    num_workers: int | None = None,
                    exchange: str = "auto") -> pa.Table:
    """Per-seed closeness-centrality sufficient statistics over the
    graph at ``graph_dir``: for each seed, the reachable-set size
    (INCLUDING the seed itself at distance 0), the sum of hop
    distances, and the maximum hop distance (the seed's eccentricity
    within its component). Exact int64 — closeness
    (n_reached-1)/sum_dist, harmonic and eccentricity variants are
    the caller's one float, keeping the cross-engine value hash
    stable (the assortativity_stats discipline).

    Scale shape: ONE warmed worker pool is shared by every seed's BFS
    (shards load once); per seed the driver sees O(workers) scalar
    partials from ``label_stats`` — the distance vector never leaves
    the shards. Returns (id, n_reached, sum_dist, max_dist) sorted by
    id; callers attach node names from the partitioned dictionary.
    """
    meta = gb.read_meta(graph_dir)
    seed_ids = np.unique(np.asarray(list(seed_ids), dtype=np.int64))
    if len(seed_ids) == 0:
        raise ValueError("empty seed set")
    if seed_ids[0] < 0 or seed_ids[-1] >= meta["n"]:
        raise ValueError(
            f"seed ids out of range [0, {meta['n']}): "
            f"{seed_ids[[0, -1]].tolist()}")
    if exchange == "auto":
        exchange = "split" if meta["n"] > 32_000_000 else "concat"
    W = create_workers(graph_dir, meta, num_workers=num_workers)[0]
    try:
        rows = []
        for sid in seed_ids.tolist():
            found = sum(ray.get([w.bfs_init.remote([sid]) for w in W]))
            assert found == 1, f"seed {sid} not covered by any shard"
            converged = False
            for _ in range(max_rounds):
                if min_round(W, exchange) == 0:
                    converged = True
                    break
            if not converged:
                raise RuntimeError(
                    f"closeness_stats BFS from seed {sid} did not "
                    f"converge within {max_rounds} rounds")
            parts = ray.get([w.label_stats.remote() for w in W])
            rows.append((sid,
                         sum(p[0] for p in parts),
                         sum(p[1] for p in parts),
                         max(p[2] for p in parts)))
        i64 = pa.int64()
        return pa.table({
            "id": pa.array([r[0] for r in rows], i64),
            "n_reached": pa.array([r[1] for r in rows], i64),
            "sum_dist": pa.array([r[2] for r in rows], i64),
            "max_dist": pa.array([r[3] for r in rows], i64)})
    finally:
        kill_workers(W)


# ------------------------------------------------- weighted SSSP

def weighted_sssp(edges, seed: str, max_rounds: int = 64,
                  join_partitions: int | None = None,
                  mode: str = "auto", out_dir: str | None = None):
    """Single-source shortest paths with positive integer edge
    weights — delta-frontier Bellman-Ford as a pure Dataset
    composition. ``edges`` is a Dataset (u, v, w) of DIRECTED
    weighted edges (symmetrize before calling for undirected
    semantics; u/v may be string OR int64 node columns — the node
    type is taken from the edge schema); ``seed`` the source node
    (must be a node of the graph — ValueError otherwise, the
    resolve_seed_ids discipline). Returns a pyarrow TABLE
    (node, dist) for every reached node, exact int64, sorted by
    node, with ``rounds_used`` in the schema metadata (the
    engine-asserts-oracle-bound tests) — the contract form. With
    ``out_dir=`` the result instead streams to crash-safe sharded
    parquet via ``sink.sink_dataset`` and the function returns the
    (rounds_used, n_reached) dict: on the Dataset path the n-scale
    result then NEVER lands on the driver.

    Per round: the changed frontier joins the edge table
    (partitioned hash join), a per-batch min combiner + groupby-min
    reduce the candidates, and the relax step is ONE tag-union
    groupby over packed ``dist*2 + is_candidate`` values — the min
    of the packed value picks the smaller dist with ties to the
    incumbent, so "changed" falls out of the low bit with no
    anti-join (the mis.py keep-flag discipline). Rounds are bounded
    by the shortest-path hop count (delta frontiers), NOT by n;
    raises on ``max_rounds`` exhaustion (a truncated relaxation is
    not a result — the kcore discipline). The returned table's
    metadata carries ``rounds_used`` for the engine-asserts-unroll
    tests."""
    import ray.data as rd

    from ..stages.join import default_join_partitions, hash_join

    if mode not in ("auto", "broadcast", "dataset"):
        raise ValueError(f"unknown mode {mode!r}")
    i64 = pa.int64()
    sch = edges.schema()
    s = sch.types[sch.names.index("u")]  # node type: string or int64
    nparts = join_partitions or default_join_partitions()
    edge_schema = [("u", s), ("v", s), ("w", i64)]

    # broadcast fast path when the NODE SET fits the driver (the
    # _mis_broadcast precedent): dist vector ships via ray.put, one
    # edge scan per round, driver folds vocabulary-bounded partials.
    # "dataset" forces the fully-distributed rounds (path-equality
    # pinned by test).
    if mode in ("auto", "broadcast"):
        # node universe via TREE DEDUPE (per-batch pc.unique +
        # positional repartition at fan-in 8 — the treeagg
        # discipline; a hash groupby on the 2|E| endpoint rows
        # measured 53 s where the tree takes ~1 s on the 10M-edge
        # bench graph). Bails to the Dataset path if the universe
        # outgrows the broadcast cap mid-tree.
        def both_ends(t: pa.Table) -> pa.Table:
            return pa.table({"u": pc.unique(pa.concat_arrays(
                [t.column("u").combine_chunks(),
                 t.column("v").combine_chunks()]))})

        def uniq(t: pa.Table) -> pa.Table:
            return pa.table({"u": pc.unique(
                t.column("u").combine_chunks())})

        cur = edges.map_batches(both_ends, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        too_big = False
        while cur.num_blocks() > 1:
            # bail only near the END of the tree (<= 8 blocks), when
            # the row count approximates the true distinct count —
            # early levels still carry per-block duplicates, and
            # bailing on those would wrongly reject graphs whose
            # universe fits (e.g. 1M nodes spread over 100 blocks)
            if cur.num_blocks() <= 8 and \
                    cur.count() > 4 * SSSP_BROADCAST_MAX_NODES:
                too_big = True
                break
            cur = (cur.repartition(max(1, cur.num_blocks() // 8))
                   .map_batches(uniq, batch_format="pyarrow",
                                zero_copy_batch=True).materialize())
        n_nodes = None if too_big else cur.count()
        if too_big and mode == "broadcast":
            # the tree over-counted or the universe is genuinely too
            # big: decide with the exact (slow) groupby before
            # refusing an explicit broadcast request
            n_nodes = (edges.map_batches(
                both_ends, batch_format="pyarrow",
                zero_copy_batch=True).groupby("u").count().count())
            if n_nodes > SSSP_BROADCAST_MAX_NODES:
                raise ValueError(
                    "mode='broadcast' but the node universe "
                    f"({n_nodes}) exceeds {SSSP_BROADCAST_MAX_NODES}")
            cur = edges.map_batches(
                both_ends, batch_format="pyarrow",
                zero_copy_batch=True).groupby("u").count()
            too_big = False
        if not too_big and (mode == "broadcast"
                            or n_nodes <= SSSP_BROADCAST_MAX_NODES):
            dtype = object if pa.types.is_string(s) else np.int64
            nodes = np.array(sorted(r["u"] for r in
                                    cur.take_all()),
                             dtype=dtype)
            si = int(np.searchsorted(nodes, seed))
            if si >= len(nodes) or nodes[si] != seed:
                raise ValueError(f"seed node {seed!r} not in graph")
            distv, rounds = _sssp_broadcast(edges, nodes, si,
                                            max_rounds)
            reached = distv < 2**62
            out = pa.table({
                "node": pa.array(nodes[reached].tolist(), s),
                "dist": pa.array(distv[reached], i64)})
            if out_dir is not None:
                from .sink import sink_dataset
                sink_dataset(rd.from_arrow(out), out_dir)
                return {"rounds_used": rounds,
                        "n_reached": out.num_rows}
            return out.replace_schema_metadata(
                {b"rounds_used": str(rounds).encode()})

    # seed membership check (the broadcast path validated against its
    # node array; mirror it here so the two paths agree on bad input)
    def seed_hits(t: pa.Table) -> pa.Table:
        hit = pc.sum(pc.cast(pc.or_(
            pc.equal(t.column("u"), pa.scalar(seed, s)),
            pc.equal(t.column("v"), pa.scalar(seed, s))),
            i64)).as_py()
        return pa.table({"n": pa.array([int(hit or 0)], i64)})

    if not (edges.map_batches(seed_hits, batch_format="pyarrow",
                              zero_copy_batch=True).sum("n") or 0):
        raise ValueError(f"seed node {seed!r} not in graph")

    dist = rd.from_arrow(pa.table({
        "node": pa.array([seed], s),
        "dist": pa.array([0], i64)})).materialize()
    frontier = dist

    def cand_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], s),
                             "nd": pa.array([], i64)})
        nd = (t.column("dist").to_numpy(zero_copy_only=False)
              + t.column("w").to_numpy(zero_copy_only=False))
        g = (pa.table({"node": t.column("v"),
                       "nd": pa.array(nd, i64)})
             .group_by(["node"]).aggregate([("nd", "min")]))
        return pa.table({"node": g.column("node"),
                         "nd": g.column("nd_min")})

    def pack(tag: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], s),
                                 "p": pa.array([], i64)})
            col = "dist" if tag == 0 else "nd"
            d = t.column(col).to_numpy(zero_copy_only=False)
            return pa.table({"node": t.column("node"),
                             "p": pa.array(d * 2 + tag, i64)})
        return f

    def unpack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], s),
                             "dist": pa.array([], i64),
                             "chg": pa.array([], i64)})
        p = t.column("min(p)").to_numpy(zero_copy_only=False)
        return pa.table({"node": t.column("node"),
                         "dist": pa.array(p // 2, i64),
                         "chg": pa.array(p & 1, i64)})

    rounds = 0
    for rounds in range(1, max_rounds + 1):
        cand = (hash_join(
            frontier, edges, on=("node",), right_on=("u",),
            num_partitions=nparts,
            left_schema=[("node", s), ("dist", i64)],
            right_schema=edge_schema)
            .map_batches(cand_min, batch_format="pyarrow",
                         zero_copy_batch=True))
        packed = (dist.map_batches(pack(0), batch_format="pyarrow",
                                   zero_copy_batch=True)
                  .union(cand.map_batches(pack(1),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True))
                  .groupby("node").min("p")
                  .map_batches(unpack, batch_format="pyarrow",
                               zero_copy_batch=True)
                  .materialize())
        def chg_only(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("chg"), pa.scalar(1, i64))
            return pa.table({"node": t.column("node").filter(keep),
                             "dist": t.column("dist").filter(keep)})

        frontier = packed.map_batches(
            chg_only, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
        dist = packed.select_columns(["node", "dist"]).materialize()
        if frontier.count() == 0:
            break
    else:
        raise RuntimeError(
            f"weighted_sssp did not converge in {max_rounds} rounds")

    out = dist.sort("node")
    if out_dir is not None:
        from .sink import sink_dataset
        out = out.materialize()  # sort once: count + sink share it
        n_reached = out.count()
        sink_dataset(out, out_dir)
        return {"rounds_used": rounds, "n_reached": n_reached}
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    tbl = tbl.cast(pa.schema([("node", s), ("dist", i64)]))
    return tbl.replace_schema_metadata(
        {b"rounds_used": str(rounds).encode()})


SSSP_BROADCAST_MAX_NODES = 2_000_000  # dist vector must fit the driver


@ray.remote
def _sssp_relax_block(block: pa.Table, dref) -> pa.Table:
    """One relaxation pass over one PINNED encoded edge block: gather
    active-source candidates, per-block per-target arrow group-min.
    Returns a (vi, nd) table bounded by the block's target
    vocabulary."""
    i32, i64 = pa.int32(), pa.int64()
    d_, act_ = dref if isinstance(dref, tuple) else ray.get(dref)
    empty = pa.table({"vi": pa.array([], i32),
                      "nd": pa.array([], i64)})
    if block.num_rows == 0:
        return empty
    ui = block.column("ui").to_numpy(zero_copy_only=False)
    keep = act_[ui]
    if not keep.any():
        return empty
    cand = (d_[ui[keep]]
            + block.column("w").to_numpy(zero_copy_only=False)[keep])
    g = (pa.table({"vi": block.column("vi").filter(pa.array(keep)),
                   "nd": pa.array(cand, i64)})
         .group_by(["vi"]).aggregate([("nd", "min")]))
    return pa.table({"vi": g.column("vi"), "nd": g.column("nd_min")})


def _sssp_broadcast(edges, nodes, seed_idx: int,
                    max_rounds: int):
    """Broadcast Bellman-Ford rounds for graphs whose NODE SET fits
    the driver (the _mis_broadcast precedent): the edge endpoints are
    ENCODED to int32 node positions ONCE (a single searchsorted pass
    over the node columns — rounds never touch them again) and the
    encoded blocks PIN in the object store; each round ships the
    dist vector via ray.put and launches one RAW TASK per block (the
    _block_edges discipline — no per-round Dataset executor spin-up),
    each returning per-target relaxation minima bounded by its
    block's vocabulary; the driver folds them with one sorted
    reduceat. The edge table never moves; beyond
    SSSP_BROADCAST_MAX_NODES the Dataset round loop runs instead
    (bit-equal — pinned by test)."""
    i32, i64 = pa.int32(), pa.int64()
    nref = ray.put(nodes)

    def encode(t: pa.Table, *, nref) -> pa.Table:
        nd_ = ray.get(nref) if isinstance(nref, ray.ObjectRef) else nref
        if t.num_rows == 0:
            return pa.table({"ui": pa.array([], i32),
                             "vi": pa.array([], i32),
                             "w": pa.array([], i64)})
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({
            "ui": pa.array(np.searchsorted(nd_, u).astype(np.int32),
                           i32),
            "vi": pa.array(np.searchsorted(nd_, v).astype(np.int32),
                           i32),
            "w": t.column("w")})

    enc = edges.map_batches(encode, fn_kwargs={"nref": nref},
                            batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    block_refs = [ref for bundle in enc.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]

    INF = np.int64(2**62)
    dist = np.full(len(nodes), INF, np.int64)
    dist[seed_idx] = 0
    active = np.zeros(len(nodes), bool)
    active[seed_idx] = True

    for rounds in range(1, max_rounds + 1):
        dref = ray.put((dist, active))
        parts = ray.get([_sssp_relax_block.remote(b, dref)
                         for b in block_refs])
        # vectorized fold: sorted reduceat min per target, then one
        # compare-and-set against the dist vector
        vi = np.concatenate(
            [t.column("vi").to_numpy(zero_copy_only=False)
             for t in parts]) if parts else np.array([], np.int64)
        nd = np.concatenate(
            [t.column("nd").to_numpy(zero_copy_only=False)
             for t in parts]) if parts else np.array([], np.int64)
        active = np.zeros(len(nodes), bool)
        if len(vi) == 0:
            return dist, rounds
        order = np.argsort(vi, kind="stable")
        vi, nd = vi[order], nd[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(vi[1:] != vi[:-1]) + 1])
        tgt = vi[starts].astype(np.int64)
        best = np.minimum.reduceat(nd, starts)
        better = best < dist[tgt]
        tgt, best = tgt[better], best[better]
        if len(tgt) == 0:
            return dist, rounds
        dist[tgt] = best
        active[tgt] = True
    raise RuntimeError(
        f"weighted_sssp did not converge in {max_rounds} rounds")
