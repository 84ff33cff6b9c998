"""CSR shard actors (SURVEY.md ST3, north_rule actor-held state).

One ``GraphShard`` actor per graph partition holds, pinned across ALL
iterations:
  * the CSR block of edges whose src_id % P == part (sorted by local
    src; ``indptr`` gives per-src edge ranges for delta frontiers),
  * per-edge weights  w = 1/outdeg(src)  (out-degree is shard-local by
    construction — duplicate edges contribute separately, reproducing
    the reference's COO-coalesce summing, /root/reference/pagerank.py:74-77),
  * the node-id slice {part, part+P, ...}: rank/label vectors, the
    dangling indicator ``a`` (/root/reference/pagerank.py:131-134), the
    personalization slice ``v``, and the local node-name array,
  * a precomputed grouping of its edges by DESTINATION partition
    (``dorder``/``dbounds``) so the per-iteration all-to-all emits one
    dense partial per target partition via a single bincount.

Per-iteration exchange: each actor returns P partial arrays
(``num_returns=P`` → one ObjectRef each); the driver routes ref lists
so actor k fetches exactly the P partials addressed to it — the
all-to-all goes through the object store, never the driver.

Determinism: partials are combined in fixed partition order and all
math is float64, so results are bit-identical for a fixed ``num_parts``
regardless of cluster size. Actors are created with ``num_cpus=0``
because ``num_parts`` is a property of the graph, not the cluster —
with 1-CPU actors a P-shard graph could deadlock on a < P-core
cluster. On a real cluster you'd pick P ≈ k × total cores and give
actors ``num_cpus=1`` plus ``max_restarts`` (state reloads from the
shard parquet + last checkpoint — see pagerank.py resume).
"""

from __future__ import annotations

import os

import numpy as np

import ray

from . import build as gb

_SENTINEL = np.int64


@ray.remote(num_cpus=0)
class GraphShard:
    def __init__(self, graph_dir: str, part: int, meta: dict):
        self.part = part
        self.P = int(meta["num_parts"])
        self.n = int(meta["n"])
        self.n_local = (self.n - part + self.P - 1) // self.P \
            if self.n > part else 0

        src, dst = gb.load_part_edges(graph_dir, part)
        src_local = src // self.P
        order = np.argsort(src_local, kind="stable")
        self.src_local = src_local[order]
        self.dst = dst[order]
        self.indptr = np.searchsorted(
            self.src_local, np.arange(self.n_local + 1))

        outdeg = np.bincount(self.src_local, minlength=self.n_local)
        self.outdeg = outdeg
        with np.errstate(divide="ignore"):
            inv = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0)
        self.weight = inv[self.src_local]  # float64

        self.dst_part = (self.dst % self.P).astype(np.int64)
        self.dst_local = self.dst // self.P
        self.dorder = np.argsort(self.dst_part, kind="stable")
        self.dbounds = np.searchsorted(
            self.dst_part[self.dorder], np.arange(self.P + 1))

        # dangling indicator over the local id slice
        self.a = np.ones(self.n_local, dtype=np.float64)
        self.a[outdeg > 0] = 0.0

        self.names = gb.load_part_names(graph_dir, part, self.P)

        # iteration state
        self.x = None
        self.x_unnorm = None
        self.v = None
        self.alpha = 0.85
        self.labels = None
        self.active = None

    def _part_sizes(self) -> np.ndarray:
        return np.array([(self.n - k + self.P - 1) // self.P
                         if self.n > k else 0 for k in range(self.P)])

    def ping(self) -> int:
        return self.n_local

    # ---------------- PageRank (power method, pagerank.py:122-172) ---

    def pr_init(self, alpha: float, v_indicator) -> float:
        """Set personalization slice; return partial sum(v_raw^2).

        ``v_indicator``: None -> uniform; else a callable
        name -> bool evaluated over the local node names (the M4
        predicate for personalized PageRank, pagerank.py:97-119).
        The reference normalizes v by sum then by L2
        (pagerank.py:115-117,140); the sum step cancels inside the L2
        step, so only the L2 normalization is applied (same result).
        """
        self.alpha = float(alpha)
        if v_indicator is None:
            self.v = np.ones(self.n_local, dtype=np.float64)
        else:
            self.v = np.array([1.0 if v_indicator(nm) else 0.0
                               for nm in self.names], dtype=np.float64)
        self.x = np.full(self.n_local, 1.0, dtype=np.float64) / np.sqrt(self.n)
        self.x_unnorm = None
        return float(np.sum(self.v * self.v)), float(np.sum(self.v))

    def pr_scale_v(self, v_norm: float) -> float:
        """Divide v by its global L2 norm; return partial x0·a."""
        self.v /= v_norm
        return float(self.x @ self.a)

    def pr_set_x(self, x_local: np.ndarray) -> float:
        """Install a rank slice (resume path); return partial x·a."""
        self.x = np.asarray(x_local, dtype=np.float64)
        return float(self.x @ self.a)

    def pr_contribs(self):
        """alpha * P^T x partials, one dense array per dst partition."""
        val = self.alpha * self.weight * self.x[self.src_local]
        sizes = self._part_sizes()
        out = []
        for k in range(self.P):
            idx = self.dorder[self.dbounds[k]:self.dbounds[k + 1]]
            out.append(np.bincount(self.dst_local[idx], weights=val[idx],
                                   minlength=sizes[k]))
        return tuple(out) if self.P > 1 else out[0]

    def pr_apply(self, partial_refs, q_scalar: float) -> float:
        """Sum inbound partials (fixed order) + q·v; return partial ||x||²."""
        acc = q_scalar * self.v
        for r in partial_refs:
            p = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            if len(p):
                acc = acc + p
        self.x_unnorm = acc
        return float(acc @ acc)

    def pr_finalize(self, norm: float):
        """Normalize; return (partial ||x-xprev||², partial x·a)."""
        x_new = self.x_unnorm / norm
        diff = x_new - self.x
        self.x = x_new
        self.x_unnorm = None
        return float(diff @ diff), float(x_new @ self.a)

    def pr_ranks(self):
        """(global_ids, names, rank) for this slice."""
        ids = np.arange(self.n_local, dtype=np.int64) * self.P + self.part
        return ids, self.names, self.x.copy()

    def pr_save(self, ckpt_dir: str, iteration: int) -> int:
        d = os.path.join(ckpt_dir, f"iter={iteration}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f"part-{self.part}.tmp.npy")
        np.save(tmp, self.x)
        os.replace(tmp, os.path.join(d, f"part-{self.part}.npy"))
        return self.n_local

    def pr_load(self, ckpt_dir: str, iteration: int) -> float:
        path = os.path.join(ckpt_dir, f"iter={iteration}",
                            f"part-{self.part}.npy")
        self.x = np.load(path)
        return float(self.x @ self.a)

    # -------- Connected components: hash-min label propagation -------

    def cc_init(self) -> int:
        self.labels = np.arange(self.n_local, dtype=np.int64) * self.P \
            + self.part
        self.active = np.ones(self.n_local, dtype=bool)
        return self.n_local

    def _frontier_edges(self) -> np.ndarray:
        """Edge indices whose src label changed last round (delta)."""
        if self.active.all():
            return np.arange(len(self.src_local))
        srcs = np.flatnonzero(self.active)
        if len(srcs) == 0:
            return np.empty(0, np.int64)
        starts = self.indptr[srcs]
        ends = self.indptr[srcs + 1]
        counts = ends - starts
        # vectorized concatenation of ranges
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64)
        out = np.repeat(starts + counts - counts.cumsum(), counts) \
            + np.arange(total)
        return out

    def cc_contribs(self):
        """Per-dst-partition min-label messages from the frontier."""
        sel = self._frontier_edges()
        sizes = self._part_sizes()
        sentinel = np.int64(self.n)
        out = []
        if len(sel) == 0:
            for k in range(self.P):
                out.append(np.full(sizes[k], sentinel, dtype=np.int64))
        else:
            kparts = self.dst_part[sel]
            lab = self.labels[self.src_local[sel]]
            dloc = self.dst_local[sel]
            for k in range(self.P):
                m = kparts == k
                partial = np.full(sizes[k], sentinel, dtype=np.int64)
                if m.any():
                    np.minimum.at(partial, dloc[m], lab[m])
                out.append(partial)
        return tuple(out) if self.P > 1 else out[0]

    def cc_apply(self, partial_refs) -> int:
        combined = np.full(self.n_local, np.int64(self.n), dtype=np.int64)
        for r in partial_refs:
            p = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            if len(p):
                np.minimum(combined, p, out=combined)
        changed = combined < self.labels
        self.labels = np.where(changed, combined, self.labels)
        self.active = changed
        return int(changed.sum())

    # ------------- Community label propagation (synchronous) ---------

    def lpa_init(self) -> int:
        self.labels = np.arange(self.n_local, dtype=np.int64) * self.P \
            + self.part
        return self.n_local

    def lpa_contribs(self):
        """Per-dst-partition (key=dst_local*n+label, count) partials.

        Key packing bounds n < ~3e9 (n_local*n must fit int64); at
        larger n switch the key to a structured array. Documented.
        """
        lab = self.labels[self.src_local]
        out = []
        for k in range(self.P):
            idx = self.dorder[self.dbounds[k]:self.dbounds[k + 1]]
            if len(idx) == 0:
                out.append((np.empty(0, np.int64), np.empty(0, np.int64)))
                continue
            key = self.dst_local[idx].astype(np.int64) * self.n + lab[idx]
            uk, cnt = np.unique(key, return_counts=True)
            out.append((uk, cnt.astype(np.int64)))
        return tuple(out) if self.P > 1 else out[0]

    def lpa_apply(self, partial_refs) -> int:
        keys = []
        cnts = []
        for r in partial_refs:
            p = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            uk, c = p
            if len(uk):
                keys.append(uk)
                cnts.append(c)
        if not keys:
            self._lpa_next = self.labels.copy()
            return 0
        key = np.concatenate(keys)
        cnt = np.concatenate(cnts)
        uk, inv = np.unique(key, return_inverse=True)
        total = np.bincount(inv, weights=cnt).astype(np.int64)
        dst = uk // self.n
        lab = uk % self.n
        # per dst: max count, tiebreak min label — lexsort: primary dst,
        # then count desc, then label asc; first row per dst wins.
        order = np.lexsort((lab, -total, dst))
        dsts_sorted = dst[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = dsts_sorted[1:] != dsts_sorted[:-1]
        win_dst = dsts_sorted[first]
        win_lab = lab[order][first]
        nxt = self.labels.copy()
        nxt[win_dst] = win_lab
        self._lpa_next = nxt
        return int(np.sum(nxt != self.labels))

    def lpa_commit(self) -> None:
        """Synchronous barrier: swap in the round's labels."""
        self.labels = self._lpa_next
        self._lpa_next = None

    def get_labels(self):
        ids = np.arange(self.n_local, dtype=np.int64) * self.P + self.part
        return ids, self.names, self.labels.copy()


def create_shards(graph_dir: str, meta: dict | None = None):
    """Instantiate the actor pool, one GraphShard per partition."""
    meta = meta or gb.read_meta(graph_dir)
    return [GraphShard.remote(graph_dir, j, meta)
            for j in range(meta["num_parts"])], meta


def kill_shards(actors) -> None:
    for a in actors:
        ray.kill(a)
