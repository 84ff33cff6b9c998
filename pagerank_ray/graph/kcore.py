"""k-core decomposition (membership at a fixed k) by distributed
peeling — an engine extension next to PageRank / CC / LPA / BFS /
triangles, the standard graph-cleaning step for link-spam and
boilerplate-cluster removal in web-corpus pipelines.

Peeling on the actor engine: per-shard degrees come free (the
shard-local out-degree of the symmetrized graph IS the node degree,
duplicates and self-loop double-counting included — the same
convention as the SQL oracle's UNION ALL symmetrization); each round
the just-removed frontier sends one decrement per incident edge
(sum-combined (tgt, count) pairs — CC's exchange layout with + in
place of min), receivers subtract and compute the next removal set.
Rounds are frontier-proportional; converged when no node falls below
k. Deterministic and partitioning-independent: the removal set per
round is a pure function of the degree vector.

Returns (id, node, core_deg) for k-core MEMBERS, where core_deg is
the node's degree counting only surviving neighbors (>= k by
definition at convergence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from . import build as gb
from .actors import create_workers, kill_workers
from .components import collect_labels


def kcore_members(graph_dir: str, k: int = 2,
                  max_rounds: int = 10_000,
                  workers=None, num_workers: int | None = None,
                  exchange: str = "auto",
                  return_rounds: bool = False
                  ) -> "pa.Table | tuple[pa.Table, int]":
    """Peel to convergence (raises if max_rounds is hit first — a
    truncated peel is not a k-core). ``return_rounds=True`` also
    returns the peel depth, so callers comparing against a
    FIXED-UNROLL oracle can assert the unroll covers it.

    ``exchange``: "concat" ships each worker's full (tgt, count) pair
    list to every worker; "split" cuts the sorted pairs at the
    destination-group boundaries so decrement bytes stop replicating
    A× (the cc_step1_split discipline). "auto" picks split when
    n > 32M — same rule as CC/PageRank. Sum-combine is commutative,
    so results are identical across modes."""
    meta = gb.read_meta(graph_dir)
    assert meta.get("undirected"), \
        "kcore_members requires a graph built with undirected=True"
    own = workers is None
    W = workers or create_workers(graph_dir, meta,
                                  num_workers=num_workers)[0]
    if exchange == "auto":
        exchange = "split" if meta["n"] > 32_000_000 else "concat"
    A = len(W)
    try:
        removed = sum(ray.get([w.kcore_init.remote(k) for w in W]))
        rounds = 0
        while removed > 0:
            if rounds >= max_rounds:
                raise RuntimeError(
                    f"k-core peeling did not converge within "
                    f"{max_rounds} rounds")
            if exchange == "split":
                step1 = ray.get([w.kc_step1_split.remote() for w in W])
                removed = sum(ray.get([
                    W[j].kc_step2_split.remote(
                        [step1[i][j] for i in range(A)])
                    for j in range(A)]))
            else:
                refs = [w.kc_step1.remote() for w in W]
                removed = sum(ray.get([w.kc_step2.remote(refs)
                                       for w in W]))
            rounds += 1
        ray.get([w.kcore_finalize.remote() for w in W])
        t = collect_labels(W)
        member = pc.greater_equal(t.column("label"),
                                  pa.scalar(0, pa.int64()))
        out = pa.table({
            "id": t.column("id").filter(member),
            "node": t.column("node").filter(member),
            "core_deg": t.column("label").filter(member),
        })
        return (out, rounds) if return_rounds else out
    finally:
        if own:
            kill_workers(W)
