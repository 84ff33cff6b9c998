"""HITS (hubs & authorities, Kleinberg 1999) — the natural
link-analysis companion to the reference's PageRank (the reference
engine computes PageRank only, /root/reference/pagerank.py:122-172;
HITS is a north_rule extension on the same graph substrate).

Semantics: multiplicity-weighted adjacency M (parallel edges sum,
matching the reference's COO-coalesce duplicate summing), L2
normalization, alternating updates

    a ← Mᵀ h,  a ← a / ‖a‖₂        (authority: in-links from hubs)
    h ← M a,   h ← h / ‖h‖₂        (hub: out-links to authorities)

starting from h₀ = 1/√n — the classic power iteration on MᵀM / MMᵀ.

Execution reuses the PageRank SpMV exchange VERBATIM on the SCC twin
pools (graph/scc.py): both layouts share the sorted-name id
assignment and the id % P shard layout, so the forward pool's
pr_step1 partials land directly in the reverse pool's pr_step2 and
vice versa. One HITS iteration is two SpMV waves:

    Wf.pr_step1(s_h)  — normalize pending h, emit Σ h[src] at dst
    Wr.pr_step2(·, 0) — pending a_un := those segments, return ‖a_un‖²
    Wr.pr_step1(s_a)  — normalize pending a, emit Σ a[dst] at src
    Wf.pr_step2(·, 0) — pending h_un := segments, return ‖h_un‖²

so hubs live as the forward pool's x, authorities as the reverse
pool's x; the driver sees only scalar norm/residual partials per
round (O(A) bytes). Both exchange modes (concat / split) work
unchanged — the twin pools share the contiguous shard grouping. At
the break point both x_prev vectors are normalized, so no final
normalization pass (and no wasted final SpMV on the forward side:
the convergence check runs on the residuals emitted by the two
step1 calls of the iteration just completed).

Scale: per-iteration cost identical to two PageRank iterations;
O(1) driver bytes per round; `out_dir=` writes both score columns
worker-side via graph/sink.py (kind="rank" on each pool) so the
driver never holds the n-row result.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from . import build as gb
from .scc import create_scc_workers, _to_ds


def hits_scores(edges, num_parts: int = 4,
                max_iter: int = 100,
                tol: float = 1e-9,
                exchange: str = "auto",
                num_workers: int | None = None,
                out_dir: str | None = None) -> pa.Table | dict:
    """(node, hub, authority) per node, sorted by node name.

    ``edges``: Dataset or Arrow table with string src/dst columns.
    ``out_dir``: when set, workers write ``{out_dir}/hub`` and
    ``{out_dir}/authority`` (id, node, rank) parquet directly
    (graph/sink.py discipline) and the two manifests are returned —
    the driver never holds the n-row result.
    """
    ds = _to_ds(edges).materialize()
    if ds.count() == 0:
        if out_dir is not None:
            from .sink import write_empty_result
            return {"hub": write_empty_result(
                        os.path.join(out_dir, "hub"), "rank"),
                    "authority": write_empty_result(
                        os.path.join(out_dir, "authority"), "rank")}
        return pa.table({"node": pa.array([], pa.string()),
                         "hub": pa.array([], pa.float64()),
                         "authority": pa.array([], pa.float64())})

    work = tempfile.mkdtemp(prefix="hits_")
    try:
        fdir = f"{work}/fwd"
        rdir = f"{work}/rev"
        gb.build_graph(ds, fdir, num_parts=num_parts)

        def swap(t: pa.Table) -> pa.Table:
            return pa.table({"src": t.column("dst"),
                             "dst": t.column("src")})

        gb.build_graph(ds.map_batches(swap, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       rdir, num_parts=num_parts)
        return hits_scores_prebuilt(
            fdir, rdir, max_iter=max_iter, tol=tol, exchange=exchange,
            num_workers=num_workers, out_dir=out_dir)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _step1(W, s: float, exchange: str):
    """One pool's step1 wave; returns (resid_sum_or_-1, partials)
    where partials feeds the TWIN pool's step2 (concat: list of
    per-worker concat-buffer refs; split: step1 result tuples)."""
    A = len(W)
    if exchange == "split":
        out = ray.get([w.pr_step1_split.remote(s) for w in W])
        resids = [t[0] for t in out]
        partials = out
    else:
        refs = [w.pr_step1.options(num_returns=2).remote(s) for w in W]
        resids = ray.get([refs[j][0] for j in range(A)])
        partials = [refs[j][1] for j in range(A)]
    return (sum(resids) if resids[0] >= 0.0 else -1.0), partials


def _step2(W, partials, exchange: str) -> float:
    """Twin pool consumes the partials; returns the global ‖x_un‖²."""
    A = len(W)
    if exchange == "split":
        ss_dot = ray.get([
            W[k].pr_step2_split.remote(
                [partials[j][1][k] for j in range(A)], 0.0)
            for k in range(A)])
    else:
        ss_dot = ray.get([w.pr_step2.remote(partials, 0.0) for w in W])
    return sum(p[0] for p in ss_dot)


def hits_scores_prebuilt(fdir: str, rdir: str,
                         max_iter: int = 100,
                         tol: float = 1e-9,
                         exchange: str = "auto",
                         num_workers: int | None = None,
                         workers=None,
                         out_dir: str | None = None
                         ) -> pa.Table | dict:
    """hits_scores over PRE-BUILT forward/reverse layouts (``rdir``
    must be ``fdir`` with src/dst swapped — validated like
    scc_labels_prebuilt). ``workers``: a (Wf, Wr) pair from
    create_scc_workers to reuse (caller owns their lifetime)."""
    meta = gb.read_meta(fdir)
    rmeta = gb.read_meta(rdir)
    if rmeta["n"] != meta["n"] or \
            rmeta["num_parts"] != meta["num_parts"]:
        raise ValueError(
            f"layout mismatch: fwd n={meta['n']}/P={meta['num_parts']}"
            f" vs rev n={rmeta['n']}/P={rmeta['num_parts']} — rdir "
            f"must be fdir with src/dst swapped")
    n = meta["n"]
    if exchange == "auto":
        exchange = "split" if n > 32_000_000 else "concat"
    own = workers is None
    Wf = Wr = None
    try:
        if own:
            Wf, Wr = create_scc_workers(fdir, rdir, num_workers)
        else:
            Wf, Wr = workers
        assert len(Wf) == len(Wr), "twin pools must align"

        s_h = math.sqrt(sum(ray.get(
            [w.hits_init.remote() for w in Wf])))
        ray.get([w.hits_init.remote() for w in Wr])

        it = 0
        while True:
            resid_h, partials_f = _step1(Wf, s_h, exchange)
            s_a = math.sqrt(_step2(Wr, partials_f, exchange))
            if s_a == 0.0:
                raise AssertionError(
                    "authority norm hit zero on a non-empty edge set")
            resid_a, partials_r = _step1(Wr, s_a, exchange)
            s_h = math.sqrt(_step2(Wf, partials_r, exchange))
            it += 1
            if resid_h >= 0.0 and \
                    math.sqrt(resid_h) <= tol and \
                    math.sqrt(resid_a) <= tol:
                break
            if it >= max_iter:
                break
        # at break Wr.x_prev = a_K but Wf.x_prev is the PREVIOUS
        # hub vector (iteration K's h is still pending, unnormalized)
        # — advance it without the SpMV emit pr_step1 would pay, so
        # the returned pair is the classic (a_K, h_K = M a_K / ‖·‖)
        ray.get([w.pr_normalize.remote(s_h) for w in Wf])

        if out_dir is not None:
            from .sink import write_result_distributed
            return {"hub": write_result_distributed(
                        Wf, os.path.join(out_dir, "hub"), "rank"),
                    "authority": write_result_distributed(
                        Wr, os.path.join(out_dir, "authority"),
                        "rank")}

        hub = _collect_x(Wf, n)
        auth = _collect_x(Wr, n)
        names = _collect_names(Wf, n)
        order = np.argsort(names, kind="stable")
        return pa.table({
            "node": pa.array(names[order].astype(object), pa.string()),
            "hub": pa.array(hub[order]),
            "authority": pa.array(auth[order]),
        })
    finally:
        if own:
            from .actors import kill_workers
            for W in (Wf, Wr):
                if W:
                    kill_workers(W)


def _collect_x(W, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.float64)
    for triples in ray.get([w.pr_ranks.remote() for w in W]):
        for ids, _names, x in triples:
            out[ids] = x
    return out


def _collect_names(W, n: int) -> np.ndarray:
    out = np.empty(n, dtype=object)
    for triples in ray.get([w.pr_ranks.remote() for w in W]):
        for ids, names, _x in triples:
            out[ids] = names
    return np.asarray(out)
