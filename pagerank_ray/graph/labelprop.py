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
                      workers=None,
                      num_workers: int | None = None,
                      out_dir: str | None = None,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 0,
                      resume: bool = False,
                      stop_after: int | None = None
                      ) -> pa.Table | dict | None:
    """Returns (id, node, label) after ``rounds`` synchronous rounds.

    ``out_dir`` / checkpoint args: same contracts as
    connected_components — worker-side parquet sink, per-shard
    checkpoints (resumable on a different cluster size; the round
    counter lives in the manifest, so a resumed run executes exactly
    the REMAINING rounds and lands on the identical fixed-round
    result). ``stop_after`` checkpoints and returns None after that
    many rounds — fault injection for the resume tests.
    """
    import os

    meta = gb.read_meta(graph_dir)
    assert meta.get("undirected"), \
        "label_propagation requires a graph built with undirected=True"
    if resume and checkpoint_dir is None:
        raise ValueError("resume=True requires checkpoint_dir")
    own = workers is None
    W = workers or create_workers(graph_dir, meta,
                                  num_workers=num_workers)[0]
    A = len(W)

    def checkpoint(rnd: int) -> None:
        ray.get([w.labels_save.remote(checkpoint_dir, rnd) for w in W])
        gb._atomic_write_json(
            os.path.join(checkpoint_dir, "manifest.json"),
            {"algorithm": "lpa", "round": rnd, "rounds": rounds,
             "num_parts": meta["num_parts"]})

    try:
        ray.get([w.lpa_init.remote() for w in W])
        start = 0
        if resume:
            from .components import load_labels_manifest
            man = load_labels_manifest(checkpoint_dir)
            if man.get("algorithm") != "lpa" or \
                    man.get("num_parts") != meta["num_parts"]:
                raise ValueError(
                    f"checkpoint mismatch: manifest is "
                    f"algorithm={man.get('algorithm')!r} "
                    f"num_parts={man.get('num_parts')}, this run is "
                    f"lpa/{meta['num_parts']} — resuming would "
                    f"produce wrong labels")
            start = man["round"]
            ray.get([w.labels_load.remote(checkpoint_dir, start)
                     for w in W])
        done_this_call = 0
        for rnd in range(start, rounds):
            if stop_after is not None and done_this_call >= stop_after:
                if checkpoint_dir:
                    checkpoint(rnd)
                return None
            if A == 1:
                refs = [w.lpa_step1.remote() for w in W]
                ray.get([W[0].lpa_step2.remote(refs)])
            else:
                refs = [w.lpa_step1.options(num_returns=A).remote()
                        for w in W]
                ray.get([W[k].lpa_step2.remote(
                    [refs[j][k] for j in range(A)]) for k in range(A)])
            ray.get([w.lpa_commit.remote() for w in W])
            done_this_call += 1
            if checkpoint_dir and checkpoint_every and \
                    (rnd + 1) % checkpoint_every == 0:
                checkpoint(rnd + 1)
        if out_dir is not None:
            from .sink import write_result_distributed
            return write_result_distributed(W, out_dir, "label")
        return collect_labels(W)
    finally:
        if own:
            kill_workers(W)
