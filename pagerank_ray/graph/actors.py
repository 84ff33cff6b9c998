"""Shard state + worker actors (SURVEY.md ST3, north_rule actor-held state).

Two-level decomposition:

* ``ShardState`` — the per-PARTITION state: the CSR block of edges with
  src_id % P == shard, per-edge weights w = 1/outdeg(src) (out-degree
  is shard-local by construction; duplicate edges contribute
  separately, reproducing the reference's COO-coalesce summing,
  /root/reference/pagerank.py:74-77), the node-id slice
  {shard, shard+P, ...} with its rank/label vectors, dangling
  indicator ``a`` (pagerank.py:131-134), personalization slice and
  node names. ``num_parts`` (P) is a property of the GRAPH, fixed at
  build time — so per-shard state, checkpoints and reduction order
  are identical regardless of cluster size.

* ``GraphWorker`` — an actor owning a contiguous group of shards, ONE
  WORKER PER CPU (num_cpus=1). Cluster size determines the worker
  count A = min(P, cluster CPUs); each worker processes its shards
  sequentially per round. This is the standard fixed-partitions /
  elastic-workers model: state keys on the shard, compute capacity on
  the cluster, and resume works across DIFFERENT cluster sizes because
  checkpoints are per-shard.

Exchange layout (PageRank/CC): each worker emits ONE concatenated
partial per round — destination-partition segments laid end-to-end
(segment k holds n_k slots, Σ n_k = n) accumulated across its owned
shards by a single scatter-add — and receivers slice their segments
ZERO-COPY out of shared memory. One object put per worker per round;
on a multi-node cluster swap in per-destination-worker objects so the
network ships segment bytes only (same math, different num_returns).

Determinism: within a fixed worker count the reduction order is fixed
-> bit-identical reruns and resumes. Across different worker counts
the local pre-combine order changes -> results agree to float64
round-off (~1e-15), far inside the 1e-6 conformance tolerance.
"""

from __future__ import annotations

import os

import numpy as np

import ray

from . import build as gb


def part_sizes(n: int, P: int) -> np.ndarray:
    return np.array([(n - k + P - 1) // P if n > k else 0
                     for k in range(P)], dtype=np.int64)


def seg_offsets(n: int, P: int) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(part_sizes(n, P))]).astype(
        np.int64)


class ShardState:
    """All per-partition arrays; plain object held inside a worker."""

    def __init__(self, graph_dir: str, part: int, meta: dict):
        self.part = part
        self.P = int(meta["num_parts"])
        self.n = int(meta["n"])
        P = self.P
        self.n_local = (self.n - part + P - 1) // P if self.n > part else 0

        src, dst = gb.load_part_edges(graph_dir, part)
        src_local = src // P
        order = np.argsort(src_local, kind="stable")
        self.src_local = src_local[order]
        dst = dst[order]
        self.indptr = np.searchsorted(self.src_local,
                                      np.arange(self.n_local + 1))

        outdeg = np.bincount(self.src_local, minlength=self.n_local)
        self.outdeg = outdeg
        inv = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0)
        weight = inv[self.src_local]

        self.dst_part = (dst % P).astype(np.int64)
        self.dst_local = dst // P

        offs = seg_offsets(self.n, P)
        self.offs = offs
        psort = np.argsort(self.dst_part, kind="stable")
        # int32 index arrays where they fit (n < 2^31): ~8 fewer
        # bytes/edge of memory traffic in the bandwidth-bound SpMV
        idx_t = np.int32 if self.n < 2**31 else np.int64
        self.pr_src = self.src_local[psort].astype(idx_t)
        self.pr_w = weight[psort]
        self.pr_aw = None  # alpha * pr_w, filled at pr_init
        self.dst_concat = (offs[self.dst_part[psort]]
                           + self.dst_local[psort]).astype(idx_t)
        # edge-range bounds per destination PART in psort order (P+1
        # ints): the split exchange slices each destination group's
        # edges contiguously out of pr_src/pr_aw/dst_concat
        self.pr_part_bounds = np.searchsorted(
            self.dst_part[psort], np.arange(P + 1))
        # init-only temporaries (weight, psort, raw dst) are NOT kept:
        # per-edge arrays retained for an actor's lifetime are exactly
        # src_local/indptr (frontier), dst_part/dst_local (CC/LPA),
        # pr_src/pr_w/dst_concat (PageRank)

        self.a = np.ones(self.n_local, dtype=np.float64)
        self.a[outdeg > 0] = 0.0
        self.names = gb.load_part_names(graph_dir, part, P)

        # iteration state (algorithm-specific)
        self.x_unnorm = None
        self.x_prev = None
        self.v = None
        self.labels = None
        self.active = None
        # nodes excluded from label updates in cc_step2 (SCC resolved
        # mask; None for CC/BFS/k-core/LPA)
        self.frozen = None

    def frontier_edges(self) -> np.ndarray:
        """Edge indices (CSR order) whose src changed last round."""
        if self.active is None or self.active.all():
            return np.arange(len(self.src_local))
        srcs = np.flatnonzero(self.active)
        if len(srcs) == 0:
            return np.empty(0, np.int64)
        starts = self.indptr[srcs]
        counts = self.indptr[srcs + 1] - starts
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64)
        return np.repeat(starts + counts - counts.cumsum(), counts) \
            + np.arange(total)


@ray.remote
class GraphWorker:
    def __init__(self, graph_dir: str, shard_ids: list[int], meta: dict,
                 all_groups: list[list[int]] | None = None):
        self.meta = meta
        self.P = int(meta["num_parts"])
        self.n = int(meta["n"])
        self.shard_ids = list(shard_ids)
        self.shards = [ShardState(graph_dir, j, meta)
                       for j in self.shard_ids]
        self.offs = seg_offsets(self.n, self.P)
        # worker-group boundaries in concat space (contiguous shard
        # ranges -> contiguous segments), for the "split" exchange
        self.group_bounds = None
        self.group_parts = None
        if all_groups is not None:
            self.group_bounds = [
                (int(self.offs[g[0]]), int(self.offs[g[-1] + 1]))
                for g in all_groups]
            self.group_parts = [(g[0], g[-1] + 1) for g in all_groups]
        self.alpha = 0.85
        self._concat_buf = None
        self._int_buf = None
        # label-message increment: 0 = CC (hash-min), 1 = BFS
        # (min-plus hop distances) — same exchange, same combiner
        self._msg_incr = np.int64(0)

    def ping(self) -> list[int]:
        return self.shard_ids

    def peak_rss_mb(self) -> float:
        """Peak resident set (VmHWM) of this worker process, in MB.
        NOTE: includes pages of PLASMA OBJECTS the process mapped
        (zero-copy reads of exchange segments), so it overstates the
        heap — see private_heap_mb for the O(n/A) evidence."""
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        return int(line.split()[1]) / 1024.0
        except OSError:
            pass
        return -1.0

    def private_heap_mb(self) -> float:
        """CURRENT private (non-shared) resident memory of this worker
        — the actor's own heap: shard arrays + iteration state, with
        object-store mappings excluded. This is the number the split
        exchange bounds at O(edges/shard + n/A)."""
        try:
            with open("/proc/self/smaps_rollup") as f:
                total = 0
                for line in f:
                    if line.startswith(("Private_Clean:",
                                        "Private_Dirty:")):
                        total += int(line.split()[1])
                return total / 1024.0
        except OSError:
            return -1.0

    # ---------------- PageRank (power method, pagerank.py:122-172) ---
    #
    # Two RPC rounds per iteration (the minimum for exact semantics):
    # step1 normalizes the pending iterate by its global norm, emits
    # the deferred residual (bit-identical values, stop check at the
    # start of the next pass) and the combined alpha·P^T x concat
    # partial; step2 sums inbound segments (FIXED worker order) + q·v.

    def pr_init(self, alpha: float, v_indicator):
        self.alpha = float(alpha)
        out = np.zeros(4)
        for sh in self.shards:
            sh.pr_aw = self.alpha * sh.pr_w
            if v_indicator is None:
                sh.v = np.ones(sh.n_local, dtype=np.float64)
            else:
                sh.v = np.array([1.0 if v_indicator(nm) else 0.0
                                 for nm in sh.names], dtype=np.float64)
            sh.x_unnorm = np.full(sh.n_local, 1.0,
                                  dtype=np.float64) / np.sqrt(self.n)
            sh.x_prev = None
            out += (sh.v @ sh.v, sh.v.sum(),
                    sh.x_unnorm @ sh.x_unnorm, sh.x_unnorm @ sh.a)
        # NOTE: the dense n-sized concat buffer is allocated lazily in
        # pr_step1 — split-mode workers never hold O(n) state
        return tuple(float(x) for x in out)

    def pr_scale_v(self, v_norm: float) -> None:
        for sh in self.shards:
            sh.v /= v_norm

    def _advance_x(self, s: float) -> float:
        """Normalize the pending iterate by s, compute the deferred
        residual, store x in x_prev. Returns resid (-1.0 first pass)."""
        resid = 0.0
        have_prev = True
        for sh in self.shards:
            x = sh.x_unnorm / s
            if sh.x_prev is None:
                have_prev = False
            else:
                diff = x - sh.x_prev
                resid += float(diff @ diff)
            sh.x_prev = x
        return resid if have_prev else -1.0

    def pr_step1(self, s: float):
        resid = self._advance_x(s)
        if self._concat_buf is None:
            self._concat_buf = np.zeros(self.n, dtype=np.float64)
        buf = self._concat_buf
        buf.fill(0.0)
        for sh in self.shards:
            if len(sh.pr_src):
                val = sh.pr_aw * sh.x_prev[sh.pr_src]
                np.add.at(buf, sh.dst_concat, val)
        return resid, buf

    def pr_step2(self, partial_refs, q_scalar: float):
        arrays = ray.get(list(partial_refs)) if partial_refs and \
            isinstance(partial_refs[0], ray.ObjectRef) else partial_refs
        ss = 0.0
        dot = 0.0
        for sh in self.shards:
            lo, hi = self.offs[sh.part], self.offs[sh.part + 1]
            acc = q_scalar * sh.v
            for p in arrays:
                acc = acc + p[lo:hi]
            sh.x_unnorm = acc
            ss += float(acc @ acc)
            dot += float(acc @ sh.a)
        return ss, dot

    # --- "split" exchange: per-destination-worker objects -----------
    #
    # Same math as the concat exchange, but the round payload is cut
    # into one object PER DESTINATION WORKER (worker groups own
    # contiguous shard ranges -> contiguous concat segments), so a
    # multi-node object store ships only the bytes each node needs
    # (n/A per pair) instead of pulling whole concat arrays (n per
    # pair) — and per-worker HEAP stays O(n/A): segment buffers are
    # built one at a time against the contiguous per-part edge ranges
    # (pr_part_bounds), ray.put, and freed; the receive side ray.gets
    # inbound segments one at a time in fixed source order (same
    # per-slot addition order as concat -> bit-identical results).
    # On small pools the concat mode wins (zero-copy slicing, fewer
    # objects); exchange="auto" picks by pool size.

    def pr_step1_split(self, s: float):
        resid = self._advance_x(s)
        refs = []
        for (lo, hi), (p0, p1) in zip(self.group_bounds,
                                      self.group_parts):
            buf = np.zeros(hi - lo, dtype=np.float64)
            for sh in self.shards:
                e0 = int(sh.pr_part_bounds[p0])
                e1 = int(sh.pr_part_bounds[p1])
                if e1 > e0:
                    val = sh.pr_aw[e0:e1] * sh.x_prev[sh.pr_src[e0:e1]]
                    np.add.at(buf, sh.dst_concat[e0:e1] - lo, val)
            refs.append(ray.put(buf))
            del buf
        return resid, refs

    def pr_step2_split(self, chunk_refs, q_scalar: float):
        base = int(self.offs[self.shard_ids[0]])
        accs = [q_scalar * sh.v for sh in self.shards]
        for ref in chunk_refs:
            c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            for i, sh in enumerate(self.shards):
                lo = int(self.offs[sh.part]) - base
                hi = int(self.offs[sh.part + 1]) - base
                accs[i] = accs[i] + c[lo:hi]
            del c
        ss = 0.0
        dot = 0.0
        for sh, acc in zip(self.shards, accs):
            sh.x_unnorm = acc
            ss += float(acc @ acc)
            dot += float(acc @ sh.a)
        return ss, dot

    def pr_ranks(self):
        return [(np.arange(sh.n_local, dtype=np.int64) * self.P + sh.part,
                 sh.names, sh.x_prev.copy()) for sh in self.shards]

    def pr_save(self, ckpt_dir: str, iteration: int) -> int:
        d = os.path.join(ckpt_dir, f"iter={iteration}")
        os.makedirs(d, exist_ok=True)
        for sh in self.shards:
            tmp = os.path.join(d, f"part-{sh.part}.tmp.npz")
            np.savez(tmp, x_prev=sh.x_prev, x_unnorm=sh.x_unnorm)
            os.replace(tmp, os.path.join(d, f"part-{sh.part}.npz"))
        return len(self.shards)

    def pr_load(self, ckpt_dir: str, iteration: int):
        ss = 0.0
        dot = 0.0
        for sh in self.shards:
            z = np.load(os.path.join(ckpt_dir, f"iter={iteration}",
                                     f"part-{sh.part}.npz"))
            sh.x_prev = z["x_prev"]
            sh.x_unnorm = z["x_unnorm"]
            ss += float(sh.x_unnorm @ sh.x_unnorm)
            dot += float(sh.x_unnorm @ sh.a)
        return ss, dot

    # ---------------- HITS (hubs & authorities, graph/hits.py) ------
    #
    # HITS reuses the PageRank exchange verbatim: with UNIT per-edge
    # weights (parallel edges sum -> the multiplicity-weighted
    # adjacency), zero personalization and q_scalar=0.0, pr_step1 /
    # pr_step2 compute exactly y = M^T x. The forward layout's SpMV
    # is the authority update (buf[dst] += h[src]); the REVERSE
    # layout's SpMV is the hub update (buf[orig_src] += a[dst]).
    # graph/hits.py alternates the two twin pools, each pool's x
    # holding one of the two score vectors.

    def hits_init(self) -> float:
        """Set HITS state on this pool's shards; returns Σ x²
        (pending-iterate norm partial — globally 1.0 by design)."""
        ss = 0.0
        for sh in self.shards:
            sh.pr_aw = np.ones(len(sh.pr_w), dtype=np.float64)
            sh.v = np.zeros(sh.n_local, dtype=np.float64)
            sh.x_unnorm = np.full(sh.n_local, 1.0,
                                  dtype=np.float64) / np.sqrt(self.n)
            sh.x_prev = None
            ss += float(sh.x_unnorm @ sh.x_unnorm)
        return ss

    def pr_normalize(self, s: float) -> float:
        """Normalize the pending iterate into x_prev WITHOUT emitting
        an exchange partial — the final HITS pass (pr_step1 would pay
        a full discarded SpMV emit). Returns the residual partial."""
        return self._advance_x(s)

    # -------- Connected components: hash-min, delta frontier ---------

    def cc_init(self) -> int:
        self._msg_incr = np.int64(0)
        for sh in self.shards:
            sh.labels = np.arange(sh.n_local, dtype=np.int64) * self.P \
                + sh.part
            sh.active = None  # None -> full frontier first round
            sh.frozen = None
        # dense exchange buffer allocated lazily in cc_step1 (sparse
        # rounds never need it)
        return sum(sh.n_local for sh in self.shards)

    # -------- SCC per-shard outer-loop state (worker-side) ------------
    #
    # The SCC driver (graph/scc.py) keeps NO per-node state: each
    # forward-layout worker holds its shards' resolved mask + roots,
    # intersects fwd/bwd labels locally against its reverse-layout
    # twin's label object (shards align by construction: same
    # sorted-name id assignment, same id % P layout, same contiguous
    # shard grouping), and returns only counts. Driver traffic is
    # O(1) per outer round; label objects move worker->worker through
    # the object store.

    def scc_reset(self) -> int:
        for sh in self.shards:
            sh.scc_resolved = np.zeros(sh.n_local, dtype=bool)
            sh.scc_roots = np.full(sh.n_local, -1, dtype=np.int64)
            # resolved-but-not-yet-degree-decremented (trim waves)
            sh._scc_pending = None
        return sum(sh.n_local for sh in self.shards)

    def minprop_init_masked(self) -> int:
        """minprop_init driven by the per-shard resolved mask instead
        of a broadcast dead-id list: alive nodes originate their own
        id; resolved nodes hold the INF sentinel n and are FROZEN —
        they neither originate nor relay (cc_step2 skips them via
        sh.frozen). Sound AND complete for SCC: an alive path between
        alive nodes can never need a dead hop (a dead node on a cycle
        with alive nodes would have resolved that whole cycle into
        its own SCC), the min-alive SCC's internal paths are all
        alive so it still resolves every round, and late rounds now
        propagate over the SHRINKING alive subgraph instead of
        re-flooding the dead giant component (the round-4 dead-relay
        variant re-paid ~the full-graph propagation every outer
        round)."""
        self._msg_incr = np.int64(0)
        total = 0
        for sh in self.shards:
            sh.labels = np.arange(sh.n_local, dtype=np.int64) * self.P \
                + sh.part
            res = sh.scc_resolved
            if res.any():
                sh.labels[res] = np.int64(self.n)
                sh.active = ~res
                sh.frozen = res
            else:
                sh.active = None
                sh.frozen = None
            total += sh.n_local
        return total

    def scc_labels_out(self):
        """Post-propagation label arrays for this worker's shards (one
        object, O(n/A)) — shipped to the twin worker of the other
        layout for the fwd==bwd intersection."""
        return [sh.labels.copy() for sh in self.shards]

    def scc_intersect(self, twin_labels):
        """fwd==bwd intersection for this worker's shards: ``fwd`` is
        the local post-propagation labels, ``twin_labels`` the aligned
        shard labels from the reverse layout. Updates the per-shard
        resolved mask + roots in place. Returns (newly_resolved_count,
        [per-shard resolved masks]) — call with num_returns=2 so the
        driver pulls only the count and the masks object flows
        straight to the twin worker."""
        new_total = 0
        for sh, bwd in zip(self.shards, twin_labels):
            f = sh.labels
            new = (~sh.scc_resolved) & (f == bwd) & (f < self.n)
            sh.scc_roots[new] = f[new]
            sh.scc_resolved |= new
            if new.any():
                sh._scc_pending = new if sh._scc_pending is None \
                    else (sh._scc_pending | new)
            new_total += int(new.sum())
        return new_total, [sh.scc_resolved.copy() for sh in self.shards]

    def scc_masks_out(self):
        """Current per-shard resolved masks (for twin sync on resume)."""
        return [sh.scc_resolved.copy() for sh in self.shards]

    def scc_set_masks(self, masks) -> None:
        """Adopt the twin's resolved masks (reverse-layout workers
        never intersect; they need the mask for the next
        minprop_init_masked and the DIFF vs their previous mask as the
        pending set for the next decrement wave — each node enters
        pending exactly once because resolution is monotone)."""
        for sh, m in zip(self.shards, masks):
            m = np.asarray(m, dtype=bool)
            diff = m & ~sh.scc_resolved
            if diff.any():
                sh._scc_pending = diff if sh._scc_pending is None \
                    else (sh._scc_pending | diff)
            sh.scc_resolved = m

    # ---- SCC trim (FW-BW-Trim): peel zero-alive-degree singletons ----
    #
    # An alive node with zero ALIVE in-degree or out-degree (and no
    # self-loop contribution keeping both nonzero) cannot sit on any
    # cycle of alive nodes, and cycles through dead nodes are
    # impossible (they would have resolved with the dead SCC) — so it
    # is a singleton SCC, root = itself. Peeling is iterative: each
    # resolution decrements neighbor degrees via (tgt, count) waves on
    # BOTH layouts (fwd wave -> targets' in-degree, rev wave ->
    # sources' out-degree; target slots are the shared concat space,
    # so Wr's messages apply directly on Wf's state). Degree state
    # lives on the FORWARD shards; waves are frontier-proportional.

    def shard_outdegs(self):
        """This worker's per-shard (multigraph) out-degree arrays —
        in the REVERSE layout these are the forward twin's
        in-degrees; shipped once at trim init."""
        return [sh.outdeg.astype(np.int64) for sh in self.shards]

    def scc_trim_init(self, twin_outdegs) -> None:
        for sh, ind in zip(self.shards, twin_outdegs):
            sh.scc_outdeg_alive = sh.outdeg.astype(np.int64).copy()
            sh.scc_indeg_alive = np.asarray(ind,
                                            dtype=np.int64).copy()

    def scc_trim_select(self):
        """Resolve every alive node whose alive in- or out-degree is
        zero (root = itself); returns (count, cumulative resolved
        masks) — call with num_returns=2, masks flow to the reverse
        twin's scc_set_masks."""
        total = 0
        masks = []
        for sh in self.shards:
            m = (~sh.scc_resolved) & ((sh.scc_indeg_alive == 0)
                                      | (sh.scc_outdeg_alive == 0))
            if m.any():
                ids = np.flatnonzero(m).astype(np.int64) * self.P \
                    + sh.part
                sh.scc_roots[m] = ids
                sh.scc_resolved |= m
                sh._scc_pending = m if sh._scc_pending is None \
                    else (sh._scc_pending | m)
                total += int(m.sum())
            masks.append(sh.scc_resolved.copy())
        return total, masks

    def scc_emit_decrements(self):
        """One (tgt, count) decrement wave over this layout's edges
        from the pending (newly-resolved) set; clears pending.
        Frontier-proportional, kc_step1's exchange shape."""
        tgts = []
        for sh in self.shards:
            m = sh._scc_pending
            sh._scc_pending = None
            if m is None or not m.any():
                continue
            srcs = np.flatnonzero(m)
            starts = sh.indptr[srcs]
            counts = sh.indptr[srcs + 1] - starts
            total = int(counts.sum())
            if total == 0:
                continue
            sel = np.repeat(starts + counts - counts.cumsum(), counts) \
                + np.arange(total)
            tgts.append(sh.offs[sh.dst_part[sel]] + sh.dst_local[sel])
        if not tgts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        tgt, cnt = np.unique(np.concatenate(tgts), return_counts=True)
        return tgt, cnt.astype(np.int64)

    def _scc_apply_dec(self, partial_refs, attr: str) -> None:
        pairs = ray.get(list(partial_refs)) if partial_refs and \
            isinstance(partial_refs[0], ray.ObjectRef) else partial_refs
        for sh in self.shards:
            lo, hi = self.offs[sh.part], self.offs[sh.part + 1]
            arr = getattr(sh, attr)
            for tgt, cnt in pairs:
                i0 = np.searchsorted(tgt, lo)
                i1 = np.searchsorted(tgt, hi)
                np.subtract.at(arr, tgt[i0:i1] - lo, cnt[i0:i1])

    def scc_apply_indeg_dec(self, partial_refs) -> None:
        """Apply a FORWARD-layout wave: fwd edges point at receivers'
        in-degree."""
        self._scc_apply_dec(partial_refs, "scc_indeg_alive")

    def scc_apply_outdeg_dec(self, partial_refs) -> None:
        """Apply a REVERSE-layout wave: rev edges point at the
        original sources, whose out-degree drops."""
        self._scc_apply_dec(partial_refs, "scc_outdeg_alive")

    def scc_finalize(self) -> None:
        """labels := roots, so collect_labels / the distributed label
        sink emit (id, node, root_id) unchanged."""
        for sh in self.shards:
            sh.labels = sh.scc_roots
            sh.active = None

    def scc_save(self, ckpt_dir: str, rnd: int) -> int:
        """Per-shard (resolved, roots) snapshot — atomic tmp+rename,
        one file per SHARD, so a run resumes on a different cluster
        size (the labels_save discipline)."""
        d = os.path.join(ckpt_dir, f"round={rnd}")
        os.makedirs(d, exist_ok=True)
        for sh in self.shards:
            tmp = os.path.join(d, f"part-{sh.part}.tmp.npz")
            np.savez(tmp, resolved=sh.scc_resolved, roots=sh.scc_roots)
            os.replace(tmp, os.path.join(d, f"part-{sh.part}.npz"))
        return len(self.shards)

    def scc_load(self, ckpt_dir: str, rnd: int) -> int:
        """Load per-shard SCC state; returns this worker's resolved
        count (the driver re-derives resolved_total as a sum).
        pending := resolved so the first post-resume decrement wave
        rebuilds the alive-degree arrays from scratch."""
        total = 0
        for sh in self.shards:
            z = np.load(os.path.join(ckpt_dir, f"round={rnd}",
                                     f"part-{sh.part}.npz"))
            sh.scc_resolved = z["resolved"]
            sh.scc_roots = z["roots"]
            sh._scc_pending = sh.scc_resolved.copy() \
                if sh.scc_resolved.any() else None
            total += int(sh.scc_resolved.sum())
        return total

    def bfs_init(self, seed_ids) -> int:
        """Min-plus hop distances: labels start at the INF sentinel n
        (the same value the exchange's dense buffer uses for "no
        message" — a real distance can never reach n, so the collision
        is unreachable), seeds at 0; messages are dist+1, min-combined
        by the unchanged CC steps; the frontier starts as the seed set
        (INF nodes never emit)."""
        self._msg_incr = np.int64(1)
        seeds = np.asarray(seed_ids, dtype=np.int64)
        found = 0
        for sh in self.shards:
            sh.labels = np.full(sh.n_local, np.int64(self.n))
            mine = seeds[seeds % self.P == sh.part] // self.P
            mine = mine[mine < sh.n_local]
            sh.labels[mine] = 0
            sh.active = np.zeros(sh.n_local, dtype=bool)
            sh.active[mine] = True
            sh.frozen = None
            found += len(mine)
        return found

    def cc_step1(self):
        """Min-label messages from each shard's frontier.

        Dense form: one sentinel-initialized concat buffer (8n bytes).
        Sparse form: deduped sorted (tgt, min_label) pairs — emitted
        when the frontier addresses < n/2 distinct slots, so late
        rounds (tiny deltas) ship bytes proportional to the FRONTIER,
        not the graph. Min is commutative/idempotent -> results are
        identical either way."""
        tgts, labs = [], []
        for sh in self.shards:
            sel = sh.frontier_edges()
            if len(sel) == 0:
                continue
            labs.append(sh.labels[sh.src_local[sel]] + self._msg_incr)
            tgts.append(sh.offs[sh.dst_part[sel]] + sh.dst_local[sel])
        if not tgts:
            return ("sparse", np.empty(0, np.int64),
                    np.empty(0, np.int64))
        tgt = np.concatenate(tgts)
        lab = np.concatenate(labs)
        # dedup to min label per target (lexsort -> first per tgt)
        order = np.lexsort((lab, tgt))
        tgt, lab = tgt[order], lab[order]
        first = np.ones(len(tgt), dtype=bool)
        first[1:] = tgt[1:] != tgt[:-1]
        tgt, lab = tgt[first], lab[first]
        if 2 * len(tgt) < self.n:
            return ("sparse", tgt, lab)
        if self._int_buf is None:
            self._int_buf = np.empty(self.n, dtype=np.int64)
        buf = self._int_buf
        buf.fill(self.n)
        buf[tgt] = lab
        return buf

    def cc_step1_split(self, s_unused=None):
        """Split-exchange form of cc_step1: the deduped sorted
        (tgt, min_label) messages are cut at the destination-group
        boundaries (one searchsorted each — tgt is sorted) and each
        segment ships as its own object, sparse or dense by the same
        2x rule against the SEGMENT length. Per-worker heap O(n/A);
        min-combine keeps results identical to the concat form."""
        msgs = self.cc_step1()
        if isinstance(msgs, tuple):
            _, tgt, lab = msgs
        else:  # dense buffer -> recover the message pairs
            tgt = np.flatnonzero(msgs < self.n)
            lab = msgs[tgt]
        refs = []
        for lo, hi in self.group_bounds:
            i0 = np.searchsorted(tgt, lo)
            i1 = np.searchsorted(tgt, hi)
            seg_t = tgt[i0:i1] - lo
            seg_l = lab[i0:i1]
            if 2 * len(seg_t) < (hi - lo):
                refs.append(ray.put(("sparse", seg_t, seg_l)))
            else:
                buf = np.full(hi - lo, np.int64(self.n))
                buf[seg_t] = seg_l
                refs.append(ray.put(buf))
        return refs

    def cc_step2_split(self, chunk_refs) -> int:
        base = int(self.offs[self.shard_ids[0]])
        changed_total = 0
        combined = {sh.part: np.full(sh.n_local, np.int64(self.n))
                    for sh in self.shards}
        for ref in chunk_refs:
            p = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            for sh in self.shards:
                lo = int(self.offs[sh.part]) - base
                hi = int(self.offs[sh.part + 1]) - base
                c = combined[sh.part]
                if isinstance(p, tuple):
                    _, tgt, lab = p
                    i0 = np.searchsorted(tgt, lo)
                    i1 = np.searchsorted(tgt, hi)
                    np.minimum.at(c, tgt[i0:i1] - lo, lab[i0:i1])
                else:
                    np.minimum(c, p[lo:hi], out=c)
            del p
        for sh in self.shards:
            c = combined[sh.part]
            changed = c < sh.labels
            if sh.frozen is not None:
                changed &= ~sh.frozen  # frozen nodes never relay
            sh.labels = np.where(changed, c, sh.labels)
            sh.active = changed
            changed_total += int(changed.sum())
        return changed_total

    def cc_step2(self, partial_refs) -> int:
        arrays = ray.get(list(partial_refs)) if partial_refs and \
            isinstance(partial_refs[0], ray.ObjectRef) else partial_refs
        changed_total = 0
        for sh in self.shards:
            lo, hi = self.offs[sh.part], self.offs[sh.part + 1]
            combined = np.full(sh.n_local, np.int64(self.n))
            for p in arrays:
                if isinstance(p, tuple):  # ("sparse", tgt, lab)
                    _, tgt, lab = p
                    i0 = np.searchsorted(tgt, lo)
                    i1 = np.searchsorted(tgt, hi)
                    np.minimum.at(combined, tgt[i0:i1] - lo, lab[i0:i1])
                else:
                    np.minimum(combined, p[lo:hi], out=combined)
            changed = combined < sh.labels
            if sh.frozen is not None:
                changed &= ~sh.frozen  # frozen nodes never relay
            sh.labels = np.where(changed, combined, sh.labels)
            sh.active = changed
            changed_total += int(changed.sum())
        return changed_total

    # ---------------- k-core peeling (sum-combined removals) ---------
    #
    # labels = CURRENT degree within the surviving set (the shard-local
    # out-degree of the symmetrized graph IS the node degree); active =
    # the nodes removed THIS round (the message frontier). Each round
    # every just-removed node sends one decrement per incident edge;
    # receivers subtract and compute the next removal set. Sum-combine
    # (np.add.at / +) replaces CC's min; the frontier/exchange layout
    # is otherwise identical.

    def kcore_init(self, k: int) -> int:
        self._kcore_k = int(k)
        removed = 0
        for sh in self.shards:
            sh.labels = sh.outdeg.astype(np.int64)
            sh.frozen = None
            sh._alive = np.ones(sh.n_local, dtype=bool)
            first = sh.labels < self._kcore_k
            sh.active = first          # removal frontier for step1
            removed += int(first.sum())
        return removed

    def kc_step1(self):
        """Decrement messages from this round's removal frontier:
        sorted (tgt, count) pairs summed per target. Marks the
        frontier dead before emitting (each node sends exactly once)."""
        tgts = []
        for sh in self.shards:
            sel = sh.frontier_edges() if sh.active is not None and \
                sh.active.any() else np.empty(0, np.int64)
            if len(sel):
                tgts.append(sh.offs[sh.dst_part[sel]]
                            + sh.dst_local[sel])
            if sh.active is not None:
                sh._alive &= ~sh.active
                sh.active = None
        if not tgts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        tgt, cnt = np.unique(np.concatenate(tgts), return_counts=True)
        return tgt, cnt.astype(np.int64)

    def kc_step1_split(self):
        """Split-exchange form of kc_step1: the sorted (tgt, count)
        decrements are cut at destination-group boundaries (np.unique
        output is already sorted -> one searchsorted pair per group)
        and each segment ships as its own object — messages stop
        replicating A× (kc_step2 has every worker pull every worker's
        FULL pair list). Sum-combine is commutative, so results are
        identical to the concat form."""
        tgt, cnt = self.kc_step1()
        refs = []
        for lo, hi in self.group_bounds:
            i0 = np.searchsorted(tgt, lo)
            i1 = np.searchsorted(tgt, hi)
            refs.append(ray.put((tgt[i0:i1] - lo, cnt[i0:i1])))
        return refs

    def kc_step2_split(self, chunk_refs) -> int:
        base = int(self.offs[self.shard_ids[0]])
        removed_total = 0
        dec = {sh.part: np.zeros(sh.n_local, dtype=np.int64)
               for sh in self.shards}
        for ref in chunk_refs:
            tgt, cnt = ray.get(ref) \
                if isinstance(ref, ray.ObjectRef) else ref
            for sh in self.shards:
                lo = int(self.offs[sh.part]) - base
                hi = int(self.offs[sh.part + 1]) - base
                i0 = np.searchsorted(tgt, lo)
                i1 = np.searchsorted(tgt, hi)
                np.add.at(dec[sh.part], tgt[i0:i1] - lo, cnt[i0:i1])
            del tgt, cnt
        for sh in self.shards:
            sh.labels -= dec[sh.part]
            nxt = sh._alive & (sh.labels < self._kcore_k)
            sh.active = nxt            # next round's removal frontier
            removed_total += int(nxt.sum())
        return removed_total

    def kc_step2(self, partial_refs) -> int:
        pairs = ray.get(list(partial_refs)) if partial_refs and \
            isinstance(partial_refs[0], ray.ObjectRef) else partial_refs
        removed_total = 0
        for sh in self.shards:
            lo, hi = self.offs[sh.part], self.offs[sh.part + 1]
            dec = np.zeros(sh.n_local, dtype=np.int64)
            for tgt, cnt in pairs:
                i0 = np.searchsorted(tgt, lo)
                i1 = np.searchsorted(tgt, hi)
                np.add.at(dec, tgt[i0:i1] - lo, cnt[i0:i1])
            sh.labels -= dec
            nxt = sh._alive & (sh.labels < self._kcore_k)
            sh.active = nxt            # next round's removal frontier
            removed_total += int(nxt.sum())
        return removed_total

    def kcore_finalize(self) -> None:
        """labels := degree-within-core for members, -1 for removed —
        the collect/get_labels/result-sink paths then apply as-is."""
        for sh in self.shards:
            sh.labels = np.where(sh._alive, sh.labels, np.int64(-1))
            sh.active = None

    # ------------- Community label propagation (synchronous) ---------

    def lpa_init(self) -> int:
        for sh in self.shards:
            sh.labels = np.arange(sh.n_local, dtype=np.int64) * self.P \
                + sh.part
            sh.frozen = None
        return sum(sh.n_local for sh in self.shards)

    def lpa_step1(self):
        """(key = concat_dst_slot * n + label, count) partials,
        pre-aggregated across owned shards (combiner before shuffle)
        and SPLIT per destination worker (np.unique output is sorted,
        so the split is a searchsorted on the slot-space bounds) —
        each destination merges only the keys addressed to it.

        Key packing bounds n^2 < 2^63 (document: switch to structured
        keys beyond ~3e9 nodes). Returns a tuple of (uk, cnt) pairs,
        one per destination worker (num_returns = A)."""
        keys = []
        for sh in self.shards:
            if len(sh.src_local) == 0:
                continue
            lab = sh.labels[sh.src_local]
            tgt = sh.offs[sh.dst_part] + sh.dst_local
            keys.append(tgt.astype(np.int64) * self.n + lab)
        if keys:
            key = np.concatenate(keys)
            uk, cnt = np.unique(key, return_counts=True)
            cnt = cnt.astype(np.int64)
        else:
            uk = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        out = []
        for lo, hi in self.group_bounds:
            i0 = np.searchsorted(uk, np.int64(lo) * self.n)
            i1 = np.searchsorted(uk, np.int64(hi) * self.n)
            out.append((uk[i0:i1], cnt[i0:i1]))
        return tuple(out) if len(out) > 1 else out[0]

    def lpa_step2(self, partial_refs) -> int:
        pairs = ray.get(list(partial_refs)) if partial_refs and \
            isinstance(partial_refs[0], ray.ObjectRef) else partial_refs
        allk = [p[0] for p in pairs if len(p[0])]
        allc = [p[1] for p in pairs if len(p[0])]
        changed = 0
        if not allk:
            for sh in self.shards:
                sh._lpa_next = sh.labels.copy()
            return 0
        key = np.concatenate(allk)
        cnt = np.concatenate(allc)
        uk, inv = np.unique(key, return_inverse=True)
        total = np.bincount(inv, weights=cnt).astype(np.int64)
        slot = uk // self.n
        lab = uk % self.n
        for sh in self.shards:
            lo, hi = self.offs[sh.part], self.offs[sh.part + 1]
            m = (slot >= lo) & (slot < hi)
            if not m.any():
                sh._lpa_next = sh.labels.copy()
                continue
            d = slot[m] - lo
            lb = lab[m]
            ct = total[m]
            order = np.lexsort((lb, -ct, d))
            ds = d[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = ds[1:] != ds[:-1]
            nxt = sh.labels.copy()
            nxt[ds[first]] = lb[order][first]
            sh._lpa_next = nxt
            changed += int(np.sum(nxt != sh.labels))
        return changed

    def lpa_commit(self) -> None:
        for sh in self.shards:
            sh.labels = sh._lpa_next
            sh._lpa_next = None

    def get_labels(self):
        return [(np.arange(sh.n_local, dtype=np.int64) * self.P + sh.part,
                 sh.names, sh.labels.copy()) for sh in self.shards]

    def label_stats(self):
        """Per-worker (n_reached, sum, max) over the current labels,
        excluding the INF sentinel n — the BFS closeness-centrality
        reduction. O(1) driver bytes per worker; the distance vector
        never leaves the shard."""
        cnt, tot, mx = 0, 0, -1
        for sh in self.shards:
            v = sh.labels[sh.labels < self.n]
            cnt += int(v.size)
            tot += int(v.sum())
            if v.size:
                mx = max(mx, int(v.max()))
        return cnt, tot, mx

    # -------- label checkpoint/resume (CC + LPA) ----------------------
    #
    # Same per-SHARD discipline as pr_save/pr_load: atomic tmp+rename,
    # one file per shard, so a run resumes on a DIFFERENT cluster
    # size. State = (labels, active frontier); LPA ignores active.

    def labels_save(self, ckpt_dir: str, rnd: int) -> int:
        d = os.path.join(ckpt_dir, f"round={rnd}")
        os.makedirs(d, exist_ok=True)
        for sh in self.shards:
            active = sh.active if sh.active is not None \
                else np.ones(sh.n_local, dtype=bool)
            tmp = os.path.join(d, f"part-{sh.part}.tmp.npz")
            np.savez(tmp, labels=sh.labels, active=active)
            os.replace(tmp, os.path.join(d, f"part-{sh.part}.npz"))
        return len(self.shards)

    def labels_load(self, ckpt_dir: str, rnd: int) -> None:
        for sh in self.shards:
            z = np.load(os.path.join(ckpt_dir, f"round={rnd}",
                                     f"part-{sh.part}.npz"))
            sh.labels = z["labels"]
            sh.active = z["active"]

    # -------- distributed result sink (ranks / labels) ---------------
    #
    # Each worker writes its OWN shards' result table directly to
    # parquet — the driver never holds the n-row result (the O(n)
    # collect_ranks/collect_labels stay as the small-graph/test path).
    # Same atomic tmp+rename + manifest discipline as the checkpoint
    # sink, keyed on SHARDS (not workers), so a rerun on a different
    # cluster size still skips finished partitions.

    _RESULT_ATTR = {"rank": "x_prev", "label": "labels",
                    "dist": "labels"}

    def result_hashes(self, kind: str) -> list[tuple[int, str]]:
        """(part, sha256 of the shard's NAMES + result values) per
        shard — the driver combines these into the run fingerprint
        without ever pulling the values. Names are included so two
        different graphs whose value arrays coincide (renamed nodes,
        symmetric rank vectors) can never be treated as the same run
        and skip-keep stale partitions."""
        import hashlib
        attr = self._RESULT_ATTR[kind]
        out = []
        for sh in self.shards:
            h = hashlib.sha256()
            h.update(np.ascontiguousarray(sh.names).tobytes())
            h.update(np.ascontiguousarray(getattr(sh, attr)).tobytes())
            out.append((sh.part, h.hexdigest()))
        return out

    def write_result(self, out_dir: str, kind: str,
                     skip_parts: list[int]) -> list[int]:
        """Write (id, node, <kind>) parquet for each owned shard;
        returns the parts written (skips those in ``skip_parts`` —
        already present from a matching previous run)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        attr = self._RESULT_ATTR[kind]
        skip = set(skip_parts)
        written = []
        for sh in self.shards:
            if sh.part in skip:
                continue
            path = os.path.join(out_dir, f"part-{sh.part:05d}.parquet")
            tmp = path + f".tmp-{os.getpid()}"
            ids = np.arange(sh.n_local, dtype=np.int64) * self.P \
                + sh.part
            names = sh.names
            vals = getattr(sh, attr)
            if kind == "dist":
                # match the collect path: UNREACHED nodes (INF
                # sentinel n) are not result rows
                reached = vals < self.n
                ids, names, vals = ids[reached], names[reached], \
                    vals[reached]
            t = pa.table({
                "id": pa.array(ids),
                "node": pa.array(names.astype(object), pa.string()),
                kind: pa.array(vals),
            })
            pq.write_table(t, tmp)
            os.replace(tmp, path)
            written.append(sh.part)
        return written


def shard_groups(P: int, num_workers: int) -> list[list[int]]:
    """Contiguous split of shard ids 0..P-1 into num_workers groups."""
    bounds = np.linspace(0, P, num_workers + 1).astype(int)
    return [list(range(bounds[i], bounds[i + 1]))
            for i in range(num_workers) if bounds[i] < bounds[i + 1]]


def create_workers(graph_dir: str, meta: dict | None = None,
                   num_workers: int | None = None,
                   num_cpus_per_worker: float = 1):
    """One worker actor per CPU (default), each owning P/A shards."""
    meta = meta or gb.read_meta(graph_dir)
    P = meta["num_parts"]
    if num_workers is None:
        avail = int(ray.cluster_resources().get("CPU", 1))
        num_workers = max(1, min(P, avail))
    groups = shard_groups(P, num_workers)
    workers = [
        GraphWorker.options(num_cpus=num_cpus_per_worker).remote(
            graph_dir, g, meta, groups)
        for g in groups]
    return workers, meta


def kill_workers(workers) -> None:
    for w in workers:
        ray.kill(w)
