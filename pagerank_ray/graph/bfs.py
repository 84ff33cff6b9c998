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
