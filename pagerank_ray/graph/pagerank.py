"""Distributed power-method PageRank (SURVEY.md A5, §7 step 3).

Reproduces the reference's power method EXACTLY in float64
(/root/reference/pagerank.py:122-172 — Eq 5.1 of "Deeper Inside
PageRank" plus the reference's non-standard per-iteration L2
normalization):

    q   = (alpha · x·a + (1 - alpha)) · v          (v L2-normalized)
    x'  = alpha · P^T x + q
    x   = x' / ||x'||₂
    stop when ||x - x_prev||₂ < epsilon or max_iterations

Execution model: P CSR shards (fixed at graph build) distributed over
A = one-per-CPU worker actors (see actors.py). Two RPC rounds per
iteration; the all-to-all is one concat-partial object per worker,
sliced zero-copy by receivers. The driver holds only scalars
(q, norm, residual, dangling dot).

Determinism: fixed worker count -> bit-identical reruns/resumes
(fixed reduction order, float64). Across cluster sizes results agree
to float64 round-off, well inside the 1e-6 conformance bar.

Checkpoint/resume: every ``checkpoint_every`` iterations each worker
writes its shards' pass state (atomic rename, one file PER SHARD) and
the driver commits a manifest — so a run is resumable mid-convergence
even on a DIFFERENT cluster size (state keys on shards, not workers).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa

import ray

from . import build as gb
from .actors import create_workers, kill_workers


class PageRankRunner:
    """Owns the worker actor pool and the iteration loop."""

    def __init__(self, graph_dir: str, workers=None,
                 meta: dict | None = None, num_workers: int | None = None):
        self.graph_dir = graph_dir
        self.meta = meta or gb.read_meta(graph_dir)
        self._own = workers is None
        self.workers = workers or create_workers(
            graph_dir, self.meta, num_workers=num_workers)[0]
        self.iterations_run = 0
        self.final_residual = float("inf")

    def close(self):
        if self._own:
            kill_workers(self.workers)

    def run(
        self,
        alpha: float = 0.85,
        max_iterations: int = 1000,
        epsilon: float = 1e-6,
        v_indicator=None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        resume: bool = False,
        stop_after: int | None = None,
        exchange: str = "auto",
        max_restarts: int = 0,
    ) -> pa.Table | None:
        """Run to convergence; returns (id, node, rank) sorted by id.

        ``exchange``: "concat" ships one n-length partial per worker
        (fewer, larger objects; zero-copy receiver slicing — measured
        fastest up to 32 workers on the bench graph); "split" ships
        per-destination segments (A^2 smaller objects per round, but
        O(n/A) worker heap and n/A bytes per worker pair). "auto"
        picks by MEMORY, the quantity that actually binds at scale:
        concat while the dense n-length partial stays under ~256 MB
        per worker (n <= 32M nodes), split beyond. Results are
        bit-identical across modes (same per-slot addition order).

        ``stop_after`` stops (and checkpoints) after that many
        iterations WITHOUT convergence — fault injection for the
        resume test (FIXTURES.md F7); returns None in that case.
        ``resume=True`` continues from the manifest in checkpoint_dir.

        ``max_restarts`` > 0 (requires checkpoint_dir): on a worker
        actor death the pool is rebuilt — each worker reloads its
        shards from the graph parquet — and the run continues from the
        last committed checkpoint (the north_rule retry-with-state
        path: actor death => re-read shard + last rank checkpoint).
        """
        if max_restarts and not checkpoint_dir:
            raise ValueError("max_restarts requires checkpoint_dir")
        if resume and not checkpoint_dir:
            raise ValueError("resume=True requires checkpoint_dir")
        attempts = 0
        while True:
            try:
                return self._run_inner(
                    alpha, max_iterations, epsilon, v_indicator,
                    checkpoint_dir, checkpoint_every, resume, stop_after,
                    exchange)
            except ray.exceptions.RayActorError:
                attempts += 1
                if attempts > max_restarts:
                    raise
                from .actors import create_workers, kill_workers
                try:
                    kill_workers(self.workers)
                except Exception:
                    pass
                self.workers = create_workers(
                    self.graph_dir, self.meta,
                    num_workers=len(self.workers))[0]
                # resume from the last committed manifest if one
                # exists; otherwise restart the run from scratch
                resume = os.path.exists(
                    os.path.join(checkpoint_dir, "manifest.json"))

    def _run_inner(
        self,
        alpha: float,
        max_iterations: int,
        epsilon: float,
        v_indicator,
        checkpoint_dir: str | None,
        checkpoint_every: int,
        resume: bool,
        stop_after: int | None,
        exchange: str,
    ) -> pa.Table | None:
        W = self.workers
        A = len(W)
        if exchange == "auto":
            exchange = "split" if self.meta["n"] > 32_000_000 \
                else "concat"

        init = ray.get([w.pr_init.remote(alpha, v_indicator) for w in W])
        v_norm = math.sqrt(sum(s[0] for s in init))
        assert sum(s[1] for s in init) > 0, "personalization sums to 0"
        ray.get([w.pr_scale_v.remote(v_norm) for w in W])

        start_iter = 0
        if resume:
            man = load_manifest(checkpoint_dir)
            if man.get("num_parts") != self.meta["num_parts"] or \
                    man.get("alpha") != alpha:
                # alpha changes the fixpoint; num_parts changes the
                # shard layout — resuming across either is silent
                # wrong-answer territory, so refuse loudly
                raise ValueError(
                    f"checkpoint mismatch: manifest has "
                    f"alpha={man.get('alpha')} "
                    f"num_parts={man.get('num_parts')}, this run "
                    f"requests alpha={alpha} / "
                    f"num_parts={self.meta['num_parts']}")
            start_iter = man["iteration"]
            parts = ray.get([w.pr_load.remote(checkpoint_dir, start_iter)
                             for w in W])
        else:
            parts = [(s[2], s[3]) for s in init]
        s_norm = math.sqrt(sum(p[0] for p in parts))
        dot = sum(p[1] for p in parts) / s_norm

        residual = float("inf")
        it = start_iter
        done_this_call = 0
        ranks_valid = True
        while True:
            if stop_after is not None and done_this_call >= stop_after:
                # state is at the post-step2 invariant -> checkpointable
                if checkpoint_dir:
                    self._checkpoint(checkpoint_dir, it, residual, alpha,
                                     epsilon)
                ranks_valid = False
                break

            if exchange == "split":
                # (resid, [ref per destination worker]) — the refs are
                # ray.put segment objects created inside each worker
                step1 = ray.get([w.pr_step1_split.remote(s_norm)
                                 for w in W])
                resid_parts = [t[0] for t in step1]
            else:
                step1_refs = [
                    w.pr_step1.options(num_returns=2).remote(s_norm)
                    for w in W]
                resid_parts = ray.get(
                    [step1_refs[j][0] for j in range(A)])
            if resid_parts[0] >= 0.0:
                residual = math.sqrt(sum(resid_parts))

            if residual < epsilon:
                break
            if it >= max_iterations:
                break

            q = alpha * dot + (1.0 - alpha)
            if exchange == "split":
                ss_dot = ray.get([
                    W[k].pr_step2_split.remote(
                        [step1[j][1][k] for j in range(A)], q)
                    for k in range(A)])
            else:
                concat_refs = [step1_refs[j][1] for j in range(A)]
                ss_dot = ray.get([
                    w.pr_step2.remote(concat_refs, q) for w in W])
            s_norm = math.sqrt(sum(p[0] for p in ss_dot))
            dot = sum(p[1] for p in ss_dot) / s_norm
            it += 1
            done_this_call += 1

            if checkpoint_dir and checkpoint_every and \
                    it % checkpoint_every == 0:
                self._checkpoint(checkpoint_dir, it, residual, alpha,
                                 epsilon)

        self.iterations_run = it
        self.final_residual = residual
        if checkpoint_dir and residual < epsilon:
            self._checkpoint(checkpoint_dir, it, residual, alpha, epsilon,
                             converged=True)
        if not ranks_valid:
            return None
        return self.collect_ranks()

    def _checkpoint(self, ckpt_dir, iteration, residual, alpha, epsilon,
                    converged=False):
        counts = ray.get([w.pr_save.remote(ckpt_dir, iteration)
                          for w in self.workers])
        manifest = {
            "iteration": iteration,
            "residual": residual,
            "alpha": alpha,
            "epsilon": epsilon,
            "converged": converged,
            "num_parts": self.meta["num_parts"],
            "shards_per_worker": counts,
        }
        gb._atomic_write_json(os.path.join(ckpt_dir, "manifest.json"),
                              manifest)

    def write_ranks_distributed(self, out_dir: str) -> dict:
        """Worker-side ranks sink: each worker writes its shards'
        (id, node, rank) parquet directly — the driver never holds
        the n-row result (see graph/sink.py). The scale path next to
        ``collect_ranks`` (small graphs / the query contract)."""
        from .sink import write_result_distributed
        return write_result_distributed(self.workers, out_dir, "rank")

    def collect_ranks(self) -> pa.Table:
        groups = ray.get([w.pr_ranks.remote() for w in self.workers])
        parts = [p for g in groups for p in g]
        ids = np.concatenate([p[0] for p in parts])
        names = np.concatenate([p[1] for p in parts])
        ranks = np.concatenate([p[2] for p in parts])
        order = np.argsort(ids, kind="stable")
        return pa.table({
            "id": pa.array(ids[order]),
            "node": pa.array(names[order].astype(object), pa.string()),
            "rank": pa.array(ranks[order]),
        })


def write_ranks(ranks: pa.Table, out_dir: str,
                num_partitions: int = 16) -> None:
    """Resumable ranks sink: one parquet file per id-range partition,
    written atomically (tmp + rename) with a completion manifest.

    A rerun of the SAME result (manifest fingerprint matches) skips
    partitions whose files already exist; DIFFERENT content into a
    reused dir wipes the stale partitions first, so the directory can
    never hold a mix of two runs' outputs."""
    import hashlib

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n = ranks.num_rows
    # fingerprint covers values AND layout (row count, partition
    # count): same ranks re-written at a different num_partitions must
    # NOT be treated as the same run, or stale higher-numbered files
    # from the old layout would survive and duplicate rows for readers
    fp = hashlib.sha256(
        f"{n}:{num_partitions}:".encode()
        + ranks.column("rank").combine_chunks().to_numpy().tobytes()
    ).hexdigest()
    man_path = os.path.join(out_dir, "manifest.json")
    same_run = False
    if os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        same_run = old.get("fingerprint") == fp
    if not same_run:
        for f in os.listdir(out_dir):
            if f.endswith(".parquet") or f.endswith(".tmp"):
                os.remove(os.path.join(out_dir, f))
    bounds = np.linspace(0, n, num_partitions + 1).astype(int)
    written = []
    for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        if e <= s:
            continue
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        if same_run and os.path.exists(path):
            written.append(i)
            continue
        tmp = path + ".tmp"
        pq.write_table(ranks.slice(s, e - s), tmp)
        os.replace(tmp, path)
        written.append(i)
    gb._atomic_write_json(man_path, {"rows": n, "partitions": written,
                                     "fingerprint": fp})


def load_manifest(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        return json.load(f)


def pagerank(
    graph_dir: str,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    v_indicator=None,
    **kw,
) -> pa.Table:
    """One-shot convenience wrapper around PageRankRunner."""
    r = PageRankRunner(graph_dir)
    try:
        return r.run(alpha=alpha, max_iterations=max_iterations,
                     epsilon=epsilon, v_indicator=v_indicator, **kw)
    finally:
        r.close()
