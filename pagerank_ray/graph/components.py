"""Connected components via hash-min label propagation (SURVEY.md §2.8).

Runs on the UNDIRECTED graph (build with ``undirected=True`` so each
shard holds both directions of its nodes' edges). Every node starts
with its own id; each round, nodes adopt the minimum label among their
own and their neighbors' labels; converged when no label changes
(global changed-count aggregate == 0).

Delta frontier: only nodes whose label changed last round emit
messages (ShardState.frontier_edges) — the delta-based frontier
activation the north_rule names. The round exchange is one
sentinel-initialized min-combined concat partial per worker (same
zero-copy segment layout as PageRank).

Labels are exact (min node id in component; ids sorted by name, so
the label is the id of the lexicographically smallest member) and
independent of partitioning/worker count because min is idempotent
and commutative.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray

from . import build as gb
from .actors import create_workers, kill_workers


def connected_components(graph_dir: str, max_rounds: int = 10_000,
                         workers=None,
                         num_workers: int | None = None,
                         exchange: str = "auto",
                         out_dir: str | None = None,
                         checkpoint_dir: str | None = None,
                         checkpoint_every: int = 0,
                         resume: bool = False,
                         stop_after: int | None = None
                         ) -> pa.Table | dict | None:
    """Returns (id, node, label) sorted by id; label = min id in component.

    ``out_dir``: when set, each worker writes its shards' label table
    directly to parquet there (graph/sink.py) and the MANIFEST dict is
    returned instead — the driver never holds the n-row result. Read
    back with sink.read_result_dataset(out_dir).

    ``exchange``: "concat" ships one n-length (or sparse-delta)
    partial per worker; "split" cuts each round's messages at
    destination-group boundaries so per-worker heap and per-pair
    bytes stay O(n/A) — same memory rule as PageRank's exchange.
    "auto" picks split when n > 32M. Min-combine is commutative, so
    results are identical across modes.

    Checkpoint/resume (the same per-SHARD discipline as PageRank's):
    every ``checkpoint_every`` rounds each worker writes its shards'
    (labels, frontier) state (atomic rename) and the driver commits a
    manifest — resumable mid-convergence, even on a DIFFERENT cluster
    size. ``stop_after`` stops (and checkpoints) after that many
    rounds WITHOUT convergence — fault injection for the resume
    tests; returns None in that case. Min-label propagation is
    idempotent/commutative, so the resumed run converges to exactly
    the same labels.
    """
    meta = gb.read_meta(graph_dir)
    assert meta.get("undirected"), \
        "connected_components requires a graph built with undirected=True"
    if resume and checkpoint_dir is None:
        raise ValueError("resume=True requires checkpoint_dir")
    own = workers is None
    W = workers or create_workers(graph_dir, meta,
                                  num_workers=num_workers)[0]
    if exchange == "auto":
        exchange = "split" if meta["n"] > 32_000_000 else "concat"

    def checkpoint(rnd: int, converged: bool) -> None:
        ray.get([w.labels_save.remote(checkpoint_dir, rnd) for w in W])
        gb._atomic_write_json(
            os.path.join(checkpoint_dir, "manifest.json"),
            {"algorithm": "cc", "round": rnd, "converged": converged,
             "num_parts": meta["num_parts"]})

    try:
        ray.get([w.cc_init.remote() for w in W])
        rnd = 0
        if resume:
            man = load_labels_manifest(checkpoint_dir)
            if man.get("algorithm") != "cc" or \
                    man.get("num_parts") != meta["num_parts"]:
                raise ValueError(
                    f"checkpoint mismatch: manifest is "
                    f"algorithm={man.get('algorithm')!r} "
                    f"num_parts={man.get('num_parts')}, this run is "
                    f"cc/{meta['num_parts']} — resuming would "
                    f"converge to wrong labels")
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
            # a truncated propagation is NOT a component labeling —
            # fail loudly (kcore_members discipline) instead of
            # silently returning/writing partial labels
            if checkpoint_dir:
                checkpoint(rnd, converged=False)
            raise RuntimeError(
                f"connected_components did not converge within "
                f"{max_rounds} rounds")
        if checkpoint_dir:
            checkpoint(rnd, converged=True)
        if out_dir is not None:
            from .sink import write_result_distributed
            return write_result_distributed(W, out_dir, "label")
        return collect_labels(W)
    finally:
        if own:
            kill_workers(W)


def min_round(W, exchange: str) -> int:
    """ONE min-combined label-exchange round (cc_step1/2, concat or
    split) over worker pool ``W``; returns the changed-node count.
    Shared by CC, BFS and the SCC propagations — the dispatch lives
    in exactly one place."""
    A = len(W)
    if exchange == "split":
        step1 = ray.get([w.cc_step1_split.remote() for w in W])
        changed = ray.get([
            W[k].cc_step2_split.remote([step1[j][k] for j in range(A)])
            for k in range(A)])
    else:
        refs = [w.cc_step1.remote() for w in W]
        changed = ray.get([w.cc_step2.remote(refs) for w in W])
    return sum(changed)


def load_labels_manifest(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        return json.load(f)


def collect_labels(workers) -> pa.Table:
    groups = ray.get([w.get_labels.remote() for w in workers])
    parts = [p for g in groups for p in g]
    ids = np.concatenate([p[0] for p in parts])
    names = np.concatenate([p[1] for p in parts])
    labels = np.concatenate([p[2] for p in parts])
    order = np.argsort(ids, kind="stable")
    return pa.table({
        "id": pa.array(ids[order]),
        "node": pa.array(names[order].astype(object), pa.string()),
        "label": pa.array(labels[order]),
    })
