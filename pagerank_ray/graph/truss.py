"""Edge-level triangle analytics: per-edge support, neighborhood
Jaccard, and k-truss membership (engine extensions beyond the
reference's node-level set — the reference, reference/pagerank.py,
has no edge-level operators; these reuse graph/triangles.py's
oriented-wedge discipline at the edge grain).

* **edge support**: for each deduped undirected edge (u, v), the
  number of triangles containing it == |N(u) ∩ N(v)| on the simple
  graph. Computed from the one-row-per-triangle Dataset
  (triangles.closed_triangles): each triangle emits its 3 canonical
  edges, groupby-count, zero-fill by union with the edge set itself.
* **neighborhood Jaccard**: common = support, union =
  (deg(u)-1) + (deg(v)-1) - common (both endpoints exclude each
  other; self-loops are dropped upstream). Emitted as the EXACT
  integer pair (common_cnt, union_cnt) — no float division, so the
  cross-engine value hash is stable.
* **k-truss**: iterated triangle-enumeration peeling (J. Cohen,
  "Graph Twiddling in a MapReduce World", CiSE 2009): recompute
  support over the surviving edge set, drop edges with
  support < k-2, repeat to fixpoint. Support is monotone
  non-increasing under edge deletion, so the fixpoint is the maximal
  k-truss regardless of round grouping.

Scale notes: every stage is a partitioned hash join / groupby over
id-encoded edges — the same shapes as triangle counting, whose
degree orientation bounds per-vertex wedge fan-out by O(sqrt(m)).
The k-truss loop materializes one edge Dataset per round (Cohen's
full-recompute form); an incremental affected-edge variant would cut
late-round cost but changes no output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages import encode as enc
from ..stages.join import default_join_partitions, hash_join
from .triangles import (_undirected_dedup, _vertex_degrees,
                        closed_triangles)

_I64 = pa.int64()


def _encode_undirected(edges_ds):
    """(src, dst) name edges -> (nodes_ds, n, undirected id edges)."""
    nparts = default_join_partitions()
    nodes_ds = enc.assign_ids_sorted(
        enc.distinct_nodes_dataset(edges_ds)).materialize()
    n = nodes_ds.count()
    encoded = enc.encode_edges_partitioned(edges_ds, nodes_ds)
    return nodes_ds, n, _undirected_dedup(encoded), nparts


def support_ds(undirected, n: int, nparts: int):
    """Per-edge triangle support of a deduped undirected id-edge
    Dataset: returns a Dataset (u, v, support) covering EVERY edge
    (zero support included). One groupby over 3 rows per triangle."""
    deg_ds = _vertex_degrees(undirected)
    closed = closed_triangles(undirected, deg_ds, n, nparts)

    def emit_tri_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], _I64),
                             "v": pa.array([], _I64),
                             "c": pa.array([], _I64)})
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("wb").to_numpy().astype(np.int64)
        c = t.column("wc").to_numpy().astype(np.int64)
        # the triangle's three edges, canonical (min, max) id order
        eu = np.concatenate([np.minimum(a, b), np.minimum(a, c),
                             np.minimum(b, c)])
        ev = np.concatenate([np.maximum(a, b), np.maximum(a, c),
                             np.maximum(b, c)])
        return pa.table({"u": pa.array(eu), "v": pa.array(ev),
                         "c": pa.array(np.ones(len(eu), np.int64))})

    def zero_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], _I64),
                             "v": pa.array([], _I64),
                             "c": pa.array([], _I64)})
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "c": pa.array(np.zeros(t.num_rows, np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], _I64),
                             "v": pa.array([], _I64),
                             "support": pa.array([], _I64)})
        return pa.table({"u": t.column("u").cast(_I64),
                         "v": t.column("v").cast(_I64),
                         "support": t.column("sum(c)").cast(_I64)})

    # materialize the per-triangle Dataset: closed_triangles chains 3
    # aggregator pools; letting the support groupby + downstream
    # degree/name joins pile onto the SAME lazy graph instantiates
    # every pool at once and stalls small clusters (the
    # clustering_coefficients lesson, graph/triangles.py)
    tri_edges = closed.map_batches(emit_tri_edges,
                                   batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    zeros = undirected.map_batches(zero_edges, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return (zeros.union(tri_edges).groupby(["u", "v"]).sum("c")
            .map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True))


def _name_edges(sup, nodes_ds, nparts, extra_cols=()):
    """Attach names to an id-keyed (u, v, ...) Dataset via two
    partitioned joins with the (node, id) dictionary; names inherit
    canonical order (ids are assigned in sorted-name order, so
    u < v  <=>  name(u) < name(v))."""
    cols = [("support", _I64)] + [(c, _I64) for c in extra_cols]

    def _src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "v": pa.array([], _I64),
                             **{c: pa.array([], ty) for c, ty in cols}})
        return pa.table({"src": t.column("node"), "v": t.column("v"),
                         **{c: t.column(c) for c, _ in cols}})

    def _dst(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             **{c: pa.array([], ty) for c, ty in cols}})
        return pa.table({"src": t.column("src"),
                         "dst": t.column("node"),
                         **{c: t.column(c) for c, _ in cols}})

    sup_schema = [("u", _I64), ("v", _I64)] + cols
    j1 = hash_join(sup, nodes_ds, on=("u",), right_on=("id",),
                   left_schema=sup_schema,
                   ).map_batches(_src, batch_format="pyarrow",
                                 zero_copy_batch=True)
    j1_schema = [("src", pa.string()), ("v", _I64)] + cols
    return hash_join(j1.repartition(nparts), nodes_ds, on=("v",),
                     right_on=("id",), left_schema=j1_schema,
                     ).map_batches(_dst, batch_format="pyarrow",
                                   zero_copy_batch=True)


def edge_support(edges_ds, out_dir: str | None = None
                 ) -> "pa.Table | None":
    """Per-edge triangle support + exact-integer neighborhood Jaccard
    over the undirected simple graph of ``edges_ds`` (src, dst name
    pairs; duplicates and self-loops dropped).

    Returns (src, dst, common_cnt, union_cnt) — one row per deduped
    undirected edge with src < dst, sorted by (src, dst).
    jaccard = common_cnt / union_cnt (left to the caller: keeping the
    two integers exact makes the result hashable across engines).
    ``out_dir``: write sharded parquet worker-side instead (sink
    commit discipline) and return None.
    """
    nodes_ds, n, und, nparts = _encode_undirected(edges_ds)
    und = und.materialize()
    # each materialize below caps the number of CONCURRENTLY
    # instantiated hash-shuffle aggregator pools (support: 4, degree
    # joins: 2, name joins: 2) — one lazy graph with all ~9 pools
    # starves its own map tasks on small clusters
    sup = support_ds(und, n, nparts).materialize()

    # union_cnt needs both endpoint degrees: two more hash joins
    deg_ds = _vertex_degrees(und)
    deg_schema = [("vertex", _I64), ("count()", _I64)]

    def _du(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], _I64),
                             "v": pa.array([], _I64),
                             "support": pa.array([], _I64),
                             "du": pa.array([], _I64)})
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "support": t.column("support"),
                         "du": t.column("count()").cast(_I64)})

    def _jacc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], _I64),
                             "v": pa.array([], _I64),
                             "support": pa.array([], _I64),
                             "union_cnt": pa.array([], _I64)})
        s = t.column("support").to_numpy().astype(np.int64)
        du = t.column("du").to_numpy().astype(np.int64)
        dv = t.column("count()").to_numpy().astype(np.int64)
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "support": t.column("support"),
                         "union_cnt": pa.array(du + dv - 2 - s)})

    with_du = hash_join(
        sup, deg_ds, on=("u",), right_on=("vertex",),
        left_schema=[("u", _I64), ("v", _I64), ("support", _I64)],
        right_schema=deg_schema,
    ).map_batches(_du, batch_format="pyarrow", zero_copy_batch=True)
    with_dv = hash_join(
        with_du.repartition(nparts), deg_ds, on=("v",),
        right_on=("vertex",),
        left_schema=[("u", _I64), ("v", _I64), ("support", _I64),
                     ("du", _I64)],
        right_schema=deg_schema,
    ).map_batches(_jacc, batch_format="pyarrow",
                  zero_copy_batch=True).materialize()

    named = _name_edges(with_dv, nodes_ds, nparts,
                        extra_cols=("union_cnt",))

    def contract_cols(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "common_cnt": pa.array([], _I64),
                             "union_cnt": pa.array([], _I64)})
        return pa.table({"src": t.column("src"),
                         "dst": t.column("dst"),
                         "common_cnt": t.column("support"),
                         "union_cnt": t.column("union_cnt")})

    out = named.map_batches(contract_cols, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string()),
                      "common_cnt": pa.array([], _I64),
                      "union_cnt": pa.array([], _I64)})
    if out.count() == 0:
        # Ray never runs UDFs on empty blocks, so an edgeless simple
        # graph leaves schema-less blocks — substitute the typed table
        if out_dir is not None:
            from .sink import sink_dataset
            import ray.data as rd
            sink_dataset(rd.from_arrow(empty), out_dir)
            return None
        return empty
    if out_dir is not None:
        from .sink import sink_dataset
        sink_dataset(out, out_dir)
        return None
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return tbl.sort_by([("src", "ascending"), ("dst", "ascending")])


def ktruss_edges(edges_ds, k: int, max_rounds: int = 50,
                 return_rounds: bool = False,
                 out_dir: str | None = None):
    """Maximal k-truss of the undirected simple graph: the edges
    whose within-subgraph triangle support is >= k-2 after iterated
    peeling. Returns (src, dst, support) for surviving edges —
    support measured WITHIN the truss (the fixpoint recompute),
    sorted by (src, dst). ``return_rounds`` appends the number of
    peel rounds run (fixpoint check included), for oracle unroll
    guards. Raises RuntimeError if max_rounds is exhausted before
    the fixpoint (a truncated peel is not a k-truss).
    """
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k-2 >= 1)")
    nodes_ds, n, cur, nparts = _encode_undirected(edges_ds)
    cur = cur.materialize()
    m = cur.count()
    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string()),
                      "support": pa.array([], _I64)})
    thresh = k - 2
    final = None
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        if m == 0:
            final = None
            break
        sup = support_ds(cur, n, nparts).materialize()

        def survivors(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"u": pa.array([], _I64),
                                 "v": pa.array([], _I64),
                                 "support": pa.array([], _I64)})
            return t.filter(
                pc.greater_equal(t.column("support"), thresh))

        surv = sup.map_batches(survivors, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
        nm = surv.count()
        if nm == m:
            final = surv
            break
        m = nm
        cur = surv.map_batches(
            lambda t: t.select(["u", "v"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
    else:
        raise RuntimeError(
            f"k-truss peel did not reach a fixpoint in {max_rounds} "
            f"rounds — raise max_rounds")

    if final is None or m == 0:
        if out_dir is not None:
            from .sink import sink_dataset
            import ray.data as rd
            sink_dataset(rd.from_arrow(empty), out_dir)
            return (None, rounds) if return_rounds else None
        return (empty, rounds) if return_rounds else empty

    named = _name_edges(final, nodes_ds, nparts)

    def contract_cols(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty.slice(0, 0)
        return pa.table({"src": t.column("src"),
                         "dst": t.column("dst"),
                         "support": t.column("support")})

    out = named.map_batches(contract_cols, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    if out.count() == 0:
        # see edge_support: schema-less blocks on the empty result
        if out_dir is not None:
            from .sink import sink_dataset
            import ray.data as rd
            sink_dataset(rd.from_arrow(empty), out_dir)
            return (None, rounds) if return_rounds else None
        return (empty, rounds) if return_rounds else empty
    if out_dir is not None:
        from .sink import sink_dataset
        sink_dataset(out, out_dir)
        return (None, rounds) if return_rounds else None
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    tbl = tbl.sort_by([("src", "ascending"), ("dst", "ascending")])
    return (tbl, rounds) if return_rounds else tbl
