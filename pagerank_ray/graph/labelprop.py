"""Community label propagation (synchronous LPA, SURVEY.md §2.8).

Synchronous rounds over the UNDIRECTED graph: every node adopts the
most frequent label among its neighbors' PREVIOUS-round labels
(tiebreak: minimum label; isolated nodes keep their label). A fixed
round count (default 10, FIXTURES.md F5) gives exact reproducibility —
asynchronous LPA is scheduling-dependent, so the engine pins the
synchronous variant and the oracle matches it exactly.

Per round each worker emits (slot, label) -> count partials
pre-aggregated across its shards with np.unique (combiner before the
exchange); destination workers merge, take the per-node argmax with
min-label tiebreak (a vectorized lexsort), and ``lpa_commit`` is the
synchronous barrier that swaps all labels at once.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from . import build as gb
from .actors import create_workers, kill_workers
from .components import collect_labels


def label_propagation(graph_dir: str, rounds: int = 10,
                      workers=None) -> pa.Table:
    """Returns (id, node, label) after ``rounds`` synchronous rounds."""
    meta = gb.read_meta(graph_dir)
    assert meta.get("undirected"), \
        "label_propagation requires a graph built with undirected=True"
    own = workers is None
    W = workers or create_workers(graph_dir, meta)[0]
    A = len(W)
    try:
        ray.get([w.lpa_init.remote() for w in W])
        for _ in range(rounds):
            if A == 1:
                refs = [w.lpa_step1.remote() for w in W]
                ray.get([W[0].lpa_step2.remote(refs)])
            else:
                refs = [w.lpa_step1.options(num_returns=A).remote()
                        for w in W]
                ray.get([W[k].lpa_step2.remote(
                    [refs[j][k] for j in range(A)]) for k in range(A)])
            ray.get([w.lpa_commit.remote() for w in W])
        return collect_labels(W)
    finally:
        if own:
            kill_workers(W)
