"""Whole-graph scalar metrics with exact-integer sufficient
statistics — the engine-stable form of float graph analytics.

``assortativity_stats`` computes the six integer sufficient
statistics of Newman's degree assortativity over the directed edge
list (x = out-degree of the edge's source, y = in-degree of its
target):

    (n_edges, Σx, Σy, Σxy, Σx², Σy²)

from which the caller's one float is
r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²)).
Keeping the sufficient statistics integral makes the cross-engine
value hash exact (the tfidf/bigram discipline). Range: Σx² ≤ m·d²max
must fit int64 — fine through ~10^9 edges of bounded-degree web
graphs; the oracle casts its HUGEINT sums down identically.

Scale shape: two vocabulary-scale degree counts (the grouped_count
combiner), degree vectors broadcast via ray.put (searchsorted lookup
inside ONE edge scan; ≤ ``DEG_BROADCAST_MAX_ROWS``) or two
partitioned hash joins beyond, then one scalar partial row per block
and an O(blocks) global sum — the driver sees six numbers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_I64 = pa.int64()

DEG_BROADCAST_MAX_ROWS = 8_000_000

_COLS = ("n_edges", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2")


def assortativity_stats(edges_ds,
                        join_partitions: int | None = None
                        ) -> pa.Table:
    """-> one-row pa.Table (n_edges, sum_x, sum_y, sum_xy, sum_x2,
    sum_y2), int64. ``edges_ds``: int64 (src, dst) edges (duplicates
    count — each edge row contributes once)."""
    import ray as _ray

    from ..stages.aggregate import grouped_count
    from ..stages.join import default_join_partitions, hash_join

    nparts = join_partitions or default_join_partitions()
    E = edges_ds.materialize()

    def _deg(ds, key):
        t = pa.Table.from_pandas(
            grouped_count(ds, key, alias="c").to_pandas(),
            preserve_index=False)
        if t.num_rows == 0:
            return np.array([], np.int64), np.array([], np.int64)
        n = t.column(key).to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        o = np.argsort(n, kind="stable")
        return n[o], c[o].astype(np.int64)

    outdeg = _deg(E, "src")
    indeg = _deg(E, "dst")
    if len(outdeg[0]) > DEG_BROADCAST_MAX_ROWS \
            or len(indeg[0]) > DEG_BROADCAST_MAX_ROWS:
        return _assortativity_joins(E, nparts)
    dref = _ray.put((outdeg, indeg))

    def _partial(t: pa.Table, *, dref=dref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], _I64) for c in _COLS})
        (on, oc), (inn, ic) = _ray.get(dref) if not isinstance(
            dref, tuple) else dref
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        # every src/dst is present in its own degree table by
        # construction — plain searchsorted lookup is total
        x = oc[np.searchsorted(on, src)]
        y = ic[np.searchsorted(inn, dst)]
        return pa.table({
            "n_edges": pa.array([len(src)], _I64),
            "sum_x": pa.array([int(x.sum())], _I64),
            "sum_y": pa.array([int(y.sum())], _I64),
            "sum_xy": pa.array([int((x * y).sum())], _I64),
            "sum_x2": pa.array([int((x * x).sum())], _I64),
            "sum_y2": pa.array([int((y * y).sum())], _I64)})

    return _final_sum(E.map_batches(_partial, batch_format="pyarrow",
                                    zero_copy_batch=True))


def _assortativity_joins(E, nparts: int) -> pa.Table:
    """Partitioned-join tail for degree tables too big to broadcast."""
    from ..stages.aggregate import grouped_count
    from ..stages.join import hash_join

    def _od(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], _I64),
                             "x": pa.array([], _I64)})
        return pa.table({"node": t.column("src").cast(_I64),
                         "x": t.column("c").cast(_I64)})

    def _id(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], _I64),
                             "y": pa.array([], _I64)})
        return pa.table({"node": t.column("dst").cast(_I64),
                         "y": t.column("c").cast(_I64)})

    od = grouped_count(E, "src", alias="c").map_batches(
        _od, batch_format="pyarrow", zero_copy_batch=True)
    idg = grouped_count(E, "dst", alias="c").map_batches(
        _id, batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(E.repartition(nparts), od, on=("src",),
                   right_on=("node",),
                   left_schema=[("src", _I64), ("dst", _I64)],
                   right_schema=[("node", _I64), ("x", _I64)])
    j2 = hash_join(j1.repartition(nparts), idg, on=("dst",),
                   right_on=("node",),
                   left_schema=[("src", _I64), ("dst", _I64),
                                ("x", _I64)],
                   right_schema=[("node", _I64), ("y", _I64)])

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], _I64) for c in _COLS})
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_edges": pa.array([len(x)], _I64),
            "sum_x": pa.array([int(x.sum())], _I64),
            "sum_y": pa.array([int(y.sum())], _I64),
            "sum_xy": pa.array([int((x * y).sum())], _I64),
            "sum_x2": pa.array([int((x * x).sum())], _I64),
            "sum_y2": pa.array([int((y * y).sum())], _I64)})

    return _final_sum(j2.map_batches(_partial, batch_format="pyarrow",
                                     zero_copy_batch=True))


def _final_sum(partials) -> pa.Table:
    agg = partials.sum(list(_COLS))
    if agg is None or any(agg.get(f"sum({c})") is None
                          for c in _COLS):  # empty dataset
        return pa.table({c: pa.array([0], _I64) for c in _COLS})
    return pa.table({c: pa.array([int(agg[f"sum({c})"])], _I64)
                     for c in _COLS})


ASSORTATIVITY_SQL = """
    WITH e AS ({edges}),
    od AS (SELECT src, COUNT(*) AS c FROM e GROUP BY src),
    idg AS (SELECT dst, COUNT(*) AS c FROM e GROUP BY dst)
    SELECT CAST(COUNT(*) AS BIGINT)        AS n_edges,
           CAST(SUM(od.c) AS BIGINT)       AS sum_x,
           CAST(SUM(idg.c) AS BIGINT)      AS sum_y,
           CAST(SUM(od.c * idg.c) AS BIGINT)  AS sum_xy,
           CAST(SUM(od.c * od.c) AS BIGINT)   AS sum_x2,
           CAST(SUM(idg.c * idg.c) AS BIGINT) AS sum_y2
    FROM e JOIN od ON od.src = e.src
           JOIN idg ON idg.dst = e.dst
"""


def reciprocity_stats(edges_ds,
                      join_partitions: int | None = None) -> pa.Table:
    """Directed-graph reciprocity sufficient statistics, one int64
    row: (n_distinct_edges, n_self_loops, n_reciprocal_pairs) —
    reciprocity r = 2·pairs / (distinct − loops) is the caller's one
    float. A pair {u,v} (u≠v) is reciprocal iff both (u,v) and (v,u)
    appear.

    Scale shape: distinct directed edges via the shuffle-free tree
    dedupe (walks.lexmin_per_key over the composite (src, dst) key —
    positional repartition + lexsort, groupby fallback past
    TREE_MAX_ROWS), then each distinct non-loop edge contributes
    1 (src<dst) or 2 (src>dst) to its canonical {min,max} pair and a
    tree sum marks reciprocal pairs with 3 — no hash shuffle
    anywhere at bench scale."""
    from ..stages.join import default_join_partitions
    from .walks import lexmin_per_key
    from ..stages.treeagg import treesum_per_key

    nparts = join_partitions or default_join_partitions()

    def _dedup_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k1": pa.array([], _I64),
                             "k2": pa.array([], _I64),
                             "a": pa.array([], _I64),
                             "b": pa.array([], _I64)})
        s = t.column("src").cast(_I64)
        d = t.column("dst").cast(_I64)
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({"k1": s, "k2": d, "a": z, "b": z})

    distinct = lexmin_per_key(
        edges_ds.map_batches(_dedup_rows, batch_format="pyarrow",
                             zero_copy_batch=True),
        nparts, key_cols=("k1", "k2")).materialize()

    def _counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_edges": pa.array([], _I64),
                             "n_loops": pa.array([], _I64)})
        s = t.column("k1").to_numpy(zero_copy_only=False)
        d = t.column("k2").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_edges": pa.array([len(s)], _I64),
            "n_loops": pa.array([int((s == d).sum())], _I64)})

    agg = distinct.map_batches(_counts, batch_format="pyarrow",
                               zero_copy_batch=True).sum(
        ["n_edges", "n_loops"])
    if agg is None or agg.get("sum(n_edges)") is None:
        n_edges = n_loops = 0
    else:
        n_edges = int(agg["sum(n_edges)"])
        n_loops = int(agg["sum(n_loops)"])

    def _canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], _I64),
                             "b": pa.array([], _I64),
                             "s": pa.array([], _I64)})
        s = t.column("k1").to_numpy(zero_copy_only=False)
        d = t.column("k2").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        # directions are already distinct, so the pair sum lands in
        # {1, 2, 3}; 3 <=> both directions present
        mark = np.where(s < d, 1, 2).astype(np.int64)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                         "s": pa.array(mark)})

    pairs = treesum_per_key(
        distinct.map_batches(_canon, batch_format="pyarrow",
                             zero_copy_batch=True),
        key_cols=("a", "b"), val="s")

    def _recip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_recip": pa.array([], _I64)})
        sv = t.column("s").to_numpy(zero_copy_only=False)
        return pa.table({"n_recip": pa.array([int((sv == 3).sum())],
                                             _I64)})

    # single-column Dataset.sum returns a bare scalar (or None on an
    # empty dataset), not a dict
    ragg = pairs.map_batches(_recip, batch_format="pyarrow",
                             zero_copy_batch=True).sum("n_recip")
    n_recip = 0 if ragg is None else int(ragg)

    return pa.table({
        "n_distinct_edges": pa.array([n_edges], _I64),
        "n_self_loops": pa.array([n_loops], _I64),
        "n_reciprocal_pairs": pa.array([n_recip], _I64)})


RECIPROCITY_SQL = """
    WITH e AS ({edges}),
    d AS (SELECT DISTINCT src, dst FROM e),
    canon AS (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
               SUM(CASE WHEN src < dst THEN 1 ELSE 2 END) AS s
        FROM d WHERE src <> dst GROUP BY 1, 2)
    SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT)
               AS n_distinct_edges,
           CAST((SELECT COUNT(*) FROM d WHERE src = dst) AS BIGINT)
               AS n_self_loops,
           CAST((SELECT COUNT(*) FROM canon WHERE s = 3) AS BIGINT)
               AS n_reciprocal_pairs
"""


def degree_distribution(edges_ds, direction: str = "out") -> pa.Table:
    """Degree histogram of the directed multigraph: for each degree
    value, the number of nodes with exactly that out-degree (or
    in-degree with ``direction="in"``) — INCLUDING the degree-0
    bucket for nodes that appear only on the other side of an edge
    (the power-law sanity check every web-graph build runs first).
    Exact int64. Returns (degree, node_count) ordered by degree ASC.

    Scale shape: ONE vocabulary-scale combiner count per side (the
    ``grouped_count`` discipline — the shuffle carries one row per
    key per batch, never the edge rows); the histogram is a per-batch
    ``value_counts`` partial over the degree column + an O(distinct
    degrees) groupby; the 0-bucket is COUNT ARITHMETIC — |src ∪ dst|
    (the distinct-nodes Dataset count) minus |keys with degree > 0| —
    never an anti-join. The driver holds only the histogram.
    """
    from ..stages.aggregate import grouped_count
    from ..stages.encode import distinct_nodes_dataset

    if direction not in ("out", "in"):
        raise ValueError(f"direction must be 'out' or 'in', "
                         f"got {direction!r}")
    key = "src" if direction == "out" else "dst"
    E = edges_ds.materialize()
    deg = grouped_count(E, key, alias="d").materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"degree": pa.array([], _I64),
                             "node_count": pa.array([], _I64)})
        vc = pc.value_counts(
            pc.cast(t.column("d"), _I64).combine_chunks())
        return pa.table({
            "degree": vc.field("values"),
            "node_count": pc.cast(vc.field("counts"), _I64)})

    agg = (deg.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby("degree").sum("node_count"))
    t = agg.to_pandas()
    n_nodes = distinct_nodes_dataset(E).count()
    degrees = (t["degree"].to_numpy().astype(np.int64)
               if not t.empty else np.array([], np.int64))
    counts = (t["sum(node_count)"].to_numpy().astype(np.int64)
              if not t.empty else np.array([], np.int64))
    zero = n_nodes - int(counts.sum())
    if zero > 0:
        degrees = np.concatenate([[np.int64(0)], degrees])
        counts = np.concatenate([[np.int64(zero)], counts])
    order = np.argsort(degrees, kind="stable")
    return pa.table({"degree": pa.array(degrees[order], _I64),
                     "node_count": pa.array(counts[order], _I64)})


def modularity_stats(edges_ds, labels: pa.Table,
                     broadcast_max_rows: int = DEG_BROADCAST_MAX_ROWS
                     ) -> pa.Table:
    """Per-community modularity SUFFICIENT STATISTICS over the
    symmetrized DIRECTED multigraph (the LPA graph): for each
    community c, ``internal_ends`` (# symmetrized edge endpoints
    whose edge stays inside c — each internal undirected edge
    contributes 2) and ``degree_sum`` (Σ degrees of c's nodes).
    Newman's Q = Σ_c (internal_ends/2m − (degree_sum/2m)²) with
    2m = Σ degree_sum is the caller's one float — the exact int64
    pair keeps the cross-engine value hash stable (the
    assortativity_stats discipline). ``labels`` is a (node,
    community) table covering every edge endpoint (ValueError
    otherwise). Returns (community, internal_ends, degree_sum)
    sorted by community.

    Scale shape: under ``broadcast_max_rows`` the (sorted nodes,
    community codes) pair ships once via ray.put and ONE edge scan
    computes per-batch bincount partials (one row per community per
    batch); beyond the cap, two partitioned hash joins attach the
    endpoint communities (path-equality tested) and the same
    partials run on the join output."""
    import ray

    from ..stages.join import default_join_partitions, hash_join

    i64, s = pa.int64(), pa.string()
    node = labels.column("node").to_numpy(zero_copy_only=False)
    comm = labels.column("community").to_numpy(zero_copy_only=False)
    order = np.argsort(node)
    node, comm = node[order], comm[order]
    comm_names, codes = np.unique(comm, return_inverse=True)
    codes = codes.astype(np.int64)

    def partials_from(cu: np.ndarray, cv: np.ndarray) -> pa.Table:
        # each DIRECTED edge: one endpoint-degree each way; +2
        # internal ends when the communities match
        k = len(comm_names)
        deg = np.bincount(cu, minlength=k) \
            + np.bincount(cv, minlength=k)
        same = cu == cv
        internal = 2 * np.bincount(cu[same], minlength=k)
        nz = np.flatnonzero(deg)
        return pa.table({"code": pa.array(nz, i64),
                         "deg": pa.array(deg[nz], i64),
                         "internal": pa.array(internal[nz], i64)})

    empty = pa.table({"code": pa.array([], i64),
                      "deg": pa.array([], i64),
                      "internal": pa.array([], i64)})

    if len(node) <= broadcast_max_rows:
        lref = ray.put((node, codes))

        def scan(t: pa.Table, *, lref) -> pa.Table:
            nd_, cd_ = ray.get(lref) if isinstance(
                lref, ray.ObjectRef) else lref
            if t.num_rows == 0:
                return empty
            u = t.column("src").to_numpy(zero_copy_only=False)
            v = t.column("dst").to_numpy(zero_copy_only=False)
            pu = np.searchsorted(nd_, u)
            pv = np.searchsorted(nd_, v)
            if (pu >= len(nd_)).any() or (nd_[pu] != u).any() or \
                    (pv >= len(nd_)).any() or (nd_[pv] != v).any():
                raise ValueError(
                    "labels do not cover every edge endpoint")
            return partials_from(cd_[pu], cd_[pv])

        parts = edges_ds.map_batches(scan, fn_kwargs={"lref": lref},
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)
    else:
        lab_ds = rd.from_arrow(pa.table({
            "node": pa.array(node.tolist(), s),
            "code": pa.array(codes, i64)}))
        nparts = default_join_partitions()
        j1 = hash_join(edges_ds, lab_ds, on=("src",),
                       right_on=("node",),
                       left_schema=[("src", s), ("dst", s)],
                       right_schema=[("node", s), ("code", i64)],
                       num_partitions=nparts, right_suffix="_u")
        j2 = hash_join(j1, lab_ds, on=("dst",), right_on=("node",),
                       left_schema=[("src", s), ("dst", s),
                                    ("code", i64)],
                       right_schema=[("node", s), ("code", i64)],
                       num_partitions=nparts, right_suffix="_v")

        def scan_joined(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            cu = t.column("code").to_numpy(zero_copy_only=False)
            cv = t.column("code_v").to_numpy(zero_copy_only=False)
            return partials_from(cu, cv)

        parts = j2.map_batches(scan_joined, batch_format="pyarrow",
                               zero_copy_batch=True)
        # an inner join silently DROPS edges with unlabeled
        # endpoints — enforce the coverage contract via the exact
        # global invariant sum(degree_sum) == 2 * |edges| below
        n_edges = edges_ds.count()

    agg = parts.groupby("code").aggregate(
        rd.aggregate.Sum("deg", alias_name="deg"),
        rd.aggregate.Sum("internal", alias_name="internal")
    ).to_pandas()
    if len(node) > broadcast_max_rows:
        got_deg = int(agg["deg"].sum()) if not agg.empty else 0
        if got_deg != 2 * n_edges:
            raise ValueError(
                "labels do not cover every edge endpoint "
                f"(joined endpoint count {got_deg} != "
                f"2 x {n_edges} edges)")
    if agg.empty:
        return pa.table({"community": pa.array([], s),
                         "internal_ends": pa.array([], i64),
                         "degree_sum": pa.array([], i64)})
    agg = agg.sort_values("code")
    names = comm_names[agg["code"].to_numpy().astype(np.int64)]
    out_order = np.argsort(names)
    return pa.table({
        "community": pa.array(names[out_order].tolist(), s),
        "internal_ends": pa.array(
            agg["internal"].to_numpy()[out_order].astype(np.int64),
            i64),
        "degree_sum": pa.array(
            agg["deg"].to_numpy()[out_order].astype(np.int64), i64)})
