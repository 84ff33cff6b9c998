"""Pure-Dataset PageRank rounds (SURVEY.md §7 step 3, first form).

Each iteration is one Ray Data pass: a vectorized ``map_batches`` over
the materialized edge table emits per-batch partial contribution rows,
``groupby(dst_id).sum`` is the shuffle, and the driver applies the
scalar teleport/normalization terms to a dense rank vector broadcast
via ray.put each round.

This is the Dataset-native expression of the same semantics the
actor engine runs (graph/pagerank.py). The actor engine exists
because re-sharding nothing per iteration beats a per-iteration
groupby shuffle — but this variant is the conformance cross-check and
the form that composes with other Dataset operators. Driver holds the
dense rank vector, so it targets graphs whose NODE count fits one
machine (edges stream).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..stages import encode as enc


def pagerank_dataset(
    edges,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    v_indicator=None,
) -> tuple[pa.Table, int]:
    """edges: Dataset or Table of (src, dst) strings.

    Returns ((node, rank) table sorted by node, iterations_run) with
    reference power-method semantics (float64, q-term, per-iteration
    L2 normalization, L2-residual stop).
    """
    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    names = enc.distinct_nodes(ds)
    n = len(names)
    encoded = enc.encode_edges(ds, names).materialize()

    # out-degree -> per-edge weight (A2; duplicates sum)
    outdeg = np.zeros(n, dtype=np.int64)
    for r in encoded.groupby("src_id").count().take_all():
        outdeg[r["src_id"]] = r["count()"]
    a = (outdeg == 0).astype(np.float64)
    inv_outdeg = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0)
    inv_ref = ray.put(inv_outdeg)

    if v_indicator is None:
        v = np.ones(n, dtype=np.float64)
    else:
        v = np.array([1.0 if v_indicator(nm) else 0.0
                      for nm in names.to_pylist()], dtype=np.float64)
    assert v.sum() > 0, "personalization sums to 0"
    v = v / np.linalg.norm(v)

    x = np.full(n, 1.0, dtype=np.float64) / math.sqrt(n)
    it = 0

    class Contribs:
        """Per-batch partial dense P^T x (combiner before the reduce)."""

        def __init__(self, x_ref, inv_ref, alpha, n):
            self.x = ray.get(x_ref)
            self.inv = ray.get(inv_ref) if isinstance(
                inv_ref, ray.ObjectRef) else inv_ref
            self.alpha = alpha
            self.n = n

        def __call__(self, t: pa.Table) -> pa.Table:
            src = t.column("src_id").to_numpy()
            dst = t.column("dst_id").to_numpy()
            val = self.alpha * self.inv[src] * self.x[src]
            part = np.bincount(dst, weights=val, minlength=self.n)
            nz = np.flatnonzero(part)
            return pa.table({"dst_id": pa.array(nz),
                             "val": pa.array(part[nz])})

    for it in range(1, max_iterations + 1):
        x_ref = ray.put(x)
        summed = (encoded.map_batches(
            Contribs, fn_constructor_args=(x_ref, inv_ref, alpha, n),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=(1, 8))
            .groupby("dst_id").sum("val").take_all())
        xn = np.zeros(n, dtype=np.float64)
        for r in summed:
            xn[r["dst_id"]] = r["sum(val)"]
        q = alpha * float(x @ a) + (1.0 - alpha)
        xn += q * v
        xn /= np.linalg.norm(xn)
        resid = float(np.linalg.norm(xn - x))
        x = xn
        if resid < epsilon:
            break

    order_tbl = pa.table({"node": names, "rank": pa.array(x)})
    return order_tbl, it
