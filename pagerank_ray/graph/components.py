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

import numpy as np
import pyarrow as pa

import ray

from . import build as gb
from .actors import create_workers, kill_workers


def connected_components(graph_dir: str, max_rounds: int = 10_000,
                         workers=None,
                         num_workers: int | None = None,
                         exchange: str = "auto",
                         out_dir: str | None = None) -> pa.Table | dict:
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
    """
    meta = gb.read_meta(graph_dir)
    assert meta.get("undirected"), \
        "connected_components requires a graph built with undirected=True"
    own = workers is None
    W = workers or create_workers(graph_dir, meta,
                                  num_workers=num_workers)[0]
    A = len(W)
    if exchange == "auto":
        exchange = "split" if meta["n"] > 32_000_000 else "concat"
    try:
        ray.get([w.cc_init.remote() for w in W])
        for _ in range(max_rounds):
            if exchange == "split":
                step1 = ray.get([w.cc_step1_split.remote() for w in W])
                changed = ray.get([
                    W[k].cc_step2_split.remote(
                        [step1[j][k] for j in range(A)])
                    for k in range(A)])
            else:
                refs = [w.cc_step1.remote() for w in W]
                changed = ray.get([w.cc_step2.remote(refs) for w in W])
            if sum(changed) == 0:
                break
        if out_dir is not None:
            from .sink import write_result_distributed
            return write_result_distributed(W, out_dir, "label")
        return collect_labels(W)
    finally:
        if own:
            kill_workers(W)


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
