"""Distributed power-method PageRank (SURVEY.md A5, §7 step 3).

Reproduces the reference's power method EXACTLY in float64
(/root/reference/pagerank.py:122-172 — Eq 5.1 of "Deeper Inside
PageRank" plus the reference's non-standard per-iteration L2
normalization):

    q   = (alpha · x·a + (1 - alpha)) · v          (v L2-normalized)
    x'  = alpha · P^T x + q
    x   = x' / ||x'||₂
    stop when ||x - x_prev||₂ < epsilon or max_iterations

All-to-all per iteration: each shard actor emits one dense partial per
destination partition (num_returns=P → per-partial ObjectRefs routed
via the driver, data via the object store); the driver holds only
scalars (q, norm, residual, dangling dot).

Determinism: partials combined in fixed partition order, float64
everywhere, ``num_parts`` fixed at graph build → bit-identical ranks
at any cluster size (the cross-cluster-size reproducibility the
north_rule requires).

Checkpoint/resume: every ``checkpoint_every`` iterations each actor
writes its normalized rank slice (atomic rename) and the driver
commits a manifest (iteration, residual, scalars) — resuming from a
manifest continues the iteration stream bit-identically.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa

import ray

from . import build as gb
from .actors import create_shards, kill_shards


def _routed(refs_per_actor, k: int, P: int):
    """The P partial refs addressed to partition k, in fixed order."""
    if P == 1:
        return [refs_per_actor[0]]
    return [refs_per_actor[j][k] for j in range(P)]


class PageRankRunner:
    """Owns the shard actor pool and the iteration loop."""

    def __init__(self, graph_dir: str, actors=None, meta: dict | None = None):
        self.graph_dir = graph_dir
        self.meta = meta or gb.read_meta(graph_dir)
        self.P = self.meta["num_parts"]
        self._own_actors = actors is None
        self.actors = actors or create_shards(graph_dir, self.meta)[0]
        self.iterations_run = 0

    def close(self):
        if self._own_actors:
            kill_shards(self.actors)

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
    ) -> pa.Table:
        """Run to convergence; returns (id, node, rank) sorted by id.

        ``stop_after`` stops after that many iterations WITHOUT
        convergence (fault-injection for the resume test, FIXTURES F7).
        ``resume=True`` continues from the latest manifest in
        ``checkpoint_dir``.
        """
        A = self.actors
        P = self.P

        start_iter = 0
        if resume:
            man = load_manifest(checkpoint_dir)
            start_iter = man["iteration"]
            init = ray.get([a.pr_init.remote(alpha, v_indicator) for a in A])
            v_norm = math.sqrt(sum(s[0] for s in init))
            assert sum(s[1] for s in init) > 0, "personalization sums to 0"
            ray.get([a.pr_scale_v.remote(v_norm) for a in A])
            dots = ray.get([a.pr_load.remote(checkpoint_dir, start_iter)
                            for a in A])
            dot = float(sum(dots))
        else:
            init = ray.get([a.pr_init.remote(alpha, v_indicator) for a in A])
            v_norm = math.sqrt(sum(s[0] for s in init))
            assert sum(s[1] for s in init) > 0, "personalization sums to 0"
            dots = ray.get([a.pr_scale_v.remote(v_norm) for a in A])
            dot = float(sum(dots))

        residual = float("inf")
        it = start_iter
        done_this_call = 0
        while it < max_iterations:
            q = alpha * dot + (1.0 - alpha)

            if P == 1:
                contrib_refs = [a.pr_contribs.remote() for a in A]
            else:
                contrib_refs = [
                    a.pr_contribs.options(num_returns=P).remote() for a in A]

            ss = ray.get([
                A[k].pr_apply.remote(_routed(contrib_refs, k, P), q)
                for k in range(P)])
            norm = math.sqrt(sum(ss))

            fin = ray.get([a.pr_finalize.remote(norm) for a in A])
            residual = math.sqrt(sum(f[0] for f in fin))
            dot = float(sum(f[1] for f in fin))
            it += 1
            done_this_call += 1

            if checkpoint_dir and checkpoint_every and \
                    it % checkpoint_every == 0:
                self._checkpoint(checkpoint_dir, it, residual, alpha, epsilon)

            if residual < epsilon:
                break
            if stop_after is not None and done_this_call >= stop_after:
                if checkpoint_dir:
                    self._checkpoint(checkpoint_dir, it, residual, alpha,
                                     epsilon)
                break

        self.iterations_run = it
        self.final_residual = residual
        if checkpoint_dir and residual < epsilon:
            self._checkpoint(checkpoint_dir, it, residual, alpha, epsilon,
                             converged=True)
        return self.collect_ranks()

    def _checkpoint(self, ckpt_dir, iteration, residual, alpha, epsilon,
                    converged=False):
        counts = ray.get([a.pr_save.remote(ckpt_dir, iteration)
                          for a in self.actors])
        manifest = {
            "iteration": iteration,
            "residual": residual,
            "alpha": alpha,
            "epsilon": epsilon,
            "converged": converged,
            "num_parts": self.P,
            "part_rows": counts,
        }
        gb._atomic_write_json(os.path.join(ckpt_dir, "manifest.json"),
                              manifest)

    def collect_ranks(self) -> pa.Table:
        parts = ray.get([a.pr_ranks.remote() for a in self.actors])
        ids = np.concatenate([p[0] for p in parts])
        names = np.concatenate([p[1] for p in parts])
        ranks = np.concatenate([p[2] for p in parts])
        order = np.argsort(ids, kind="stable")
        return pa.table({
            "id": pa.array(ids[order]),
            "node": pa.array(names[order].astype(object), pa.string()),
            "rank": pa.array(ranks[order]),
        })


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
