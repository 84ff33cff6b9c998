"""Connected components via hash-min label propagation (SURVEY.md §2.8).

Runs on the UNDIRECTED graph (build with ``undirected=True`` so each
shard holds both directions of its nodes' edges). Every node starts
with its own id; each round, nodes adopt the minimum label among
their own and their neighbors' labels; converged when no label
changes (global changed-count aggregate == 0).

Delta frontier: only nodes whose label changed last round emit
messages (GraphShard._frontier_edges) — the delta-based frontier
activation the north_rule names. Labels are exact (min node id in
component; ids are sorted-by-name so the label is the id of the
lexicographically smallest member), independent of partitioning and
round scheduling because min is idempotent/commutative.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from . import build as gb
from .actors import create_shards, kill_shards
from .pagerank import _routed


def connected_components(graph_dir: str, max_rounds: int = 10_000,
                         actors=None) -> pa.Table:
    """Returns (id, node, label) sorted by id; label = min id in component."""
    meta = gb.read_meta(graph_dir)
    assert meta.get("undirected"), \
        "connected_components requires a graph built with undirected=True"
    own = actors is None
    A = actors or create_shards(graph_dir, meta)[0]
    P = meta["num_parts"]
    try:
        ray.get([a.cc_init.remote() for a in A])
        for _ in range(max_rounds):
            if P == 1:
                refs = [a.cc_contribs.remote() for a in A]
            else:
                refs = [a.cc_contribs.options(num_returns=P).remote()
                        for a in A]
            changed = ray.get([
                A[k].cc_apply.remote(_routed(refs, k, P)) for k in range(P)])
            if sum(changed) == 0:
                break
        return _collect_labels(A)
    finally:
        if own:
            kill_shards(A)


def _collect_labels(actors) -> pa.Table:
    parts = ray.get([a.get_labels.remote() for a in actors])
    ids = np.concatenate([p[0] for p in parts])
    names = np.concatenate([p[1] for p in parts])
    labels = np.concatenate([p[2] for p in parts])
    order = np.argsort(ids, kind="stable")
    return pa.table({
        "id": pa.array(ids[order]),
        "node": pa.array(names[order].astype(object), pa.string()),
        "label": pa.array(labels[order]),
    })
