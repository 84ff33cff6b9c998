"""Per-vertex triangle counting (SURVEY.md §2.8).

Dataset-composed node-iterator algorithm with DEGREE ORIENTATION to
tame skew (the classic trick: orient every undirected edge from its
lower-(degree, id) endpoint to the higher one; every triangle is then
counted exactly once as an oriented wedge a->b, a->c closed by b->c,
and per-node oriented out-degree is O(sqrt(m)) so hub vertices cannot
explode the wedge stage).

Stages (each a Ray Data op; shuffles are the groupbys):
  1. canonicalize + dedup undirected edges      [groupby (u,v)]
  2. vertex degrees                              [groupby vertex]
  3. orient by (degree, id) — dense degree broadcast on the small-
     graph path; two partitioned degree joins on the scale path
  4. wedges per source a: partitioned SELF-JOIN on a, kb<kb2 filter
  5. close wedges against oriented edges: partitioned hash join (b,c)
  6. per-vertex counts (3 emits per triangle)    [groupby vertex]

Counts match the brute-force oracle exactly (FIXTURES.md F5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..stages import encode as enc
from ..stages.join import default_join_partitions, hash_join


def triangle_counts(edges_ds, broadcast_threshold: int = 2_000_000,
                    return_degrees: bool = False,
                    out_dir: str | None = None
                    ) -> "pa.Table | tuple[pa.Table, pa.Table] | None":
    """edges_ds: (src, dst) strings. Returns (node, tri_count) for every
    node, zero-count nodes included, sorted by node.

    ``return_degrees=True`` also returns the (node, deg) table of
    simple-graph distinct-neighbor degrees — computed internally
    anyway for the orientation, so compositions (e.g. the clustering
    coefficient) don't re-canonicalize and re-dedup the edge set.

    ``out_dir``: when set, the (node, tri_count) result is written as
    sharded parquet straight from the final join's output blocks
    (stale files wiped first — the sink discipline) and None is
    returned; on the partitioned path the O(n)-row result never
    lands on the driver. Mutually exclusive with return_degrees.

    Two end-to-end strategies, selected by the raw edge count:

    * **broadcast** (< ``broadcast_threshold`` edges): the dictionary
      collects to the driver, encode is a broadcast ``index_in``, and
      wedges close against a ray.put sorted packed-key array with a
      vectorized searchsorted — no second shuffle. Driver-safe by
      construction (the edge set bounds the node count).
    * **partitioned** (the scale path): the dictionary NEVER touches
      the driver — distinct names stay a Dataset, ids come from
      ``assign_ids_sorted`` (block-metadata offsets), edges encode via
      two partitioned hash joins, degrees attach via joins, wedges
      close via a partitioned (b, c) hash join, and the per-vertex
      count table is assembled by a union + groupby + name join (no
      dense O(n) driver array).
    """
    if out_dir is not None and return_degrees:
        raise ValueError("out_dir and return_degrees are mutually "
                         "exclusive — compose via "
                         "clustering_coefficients instead")
    edges_ds = edges_ds.materialize()
    if edges_ds.count() > broadcast_threshold:
        if out_dir is not None:
            from .sink import sink_dataset
            tri_ds, _ = _partitioned_datasets(edges_ds, want_deg=False)
            sink_dataset(tri_ds, out_dir)
            return None
        return _triangle_counts_partitioned(edges_ds, return_degrees)
    names = enc.distinct_nodes(edges_ds)
    n = len(names)
    encoded = enc.encode_edges(edges_ds, names)

    undirected = _undirected_dedup(encoded)
    deg_ds = _vertex_degrees(undirected)

    # dense degree array broadcast once via ray.put (driver-safe: the
    # edge count bound on this path bounds the node count)
    deg = np.zeros(n, dtype=np.int64)
    for r in deg_ds.take_all():
        deg[r["vertex"]] = r["count()"]
    deg_ref = ray.put(deg)
    deg_tbl = pa.table({"node": names, "deg": pa.array(deg)}) \
        if return_degrees else None

    class Orient:
        def __init__(self, deg_ref):
            self.deg = ray.get(deg_ref) if isinstance(
                deg_ref, ray.ObjectRef) else deg_ref

        def __call__(self, t: pa.Table) -> pa.Table:
            u = t.column("u").to_numpy()
            v = t.column("v").to_numpy()
            return _orient(u, v, self.deg[u], self.deg[v], n)

    oriented = undirected.map_batches(
        Orient, fn_constructor_args=(deg_ref,),
        batch_format="pyarrow", concurrency=(1, 4)).materialize()
    out = _close_broadcast(oriented, names, n)
    if out_dir is not None:
        # broadcast path is driver-safe by construction; write the
        # same way for interface parity
        from .sink import sink_dataset
        sink_dataset(out, out_dir)
        return None
    return (out, deg_tbl) if return_degrees else out


def _undirected_dedup(encoded):
    """(src_id, dst_id) -> deduped undirected (u < v) edges, self-loops
    dropped; materialized so degrees + orientation + wedges reuse it."""

    def canonical(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty-schema block from an upstream join
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        s = t.column("src_id").to_numpy()
        d = t.column("dst_id").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.minimum(s, d)),
                         "v": pa.array(np.maximum(s, d))})

    return (encoded.map_batches(canonical, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby(["u", "v"]).count()
            .select_columns(["u", "v"])
            .materialize())


def _vertex_degrees(undirected):
    def emit_verts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty-schema block from the dedup groupby
            return pa.table({"vertex": pa.array([], pa.int64())})
        both = np.concatenate([t.column("u").to_numpy(),
                               t.column("v").to_numpy()])
        return pa.table({"vertex": pa.array(both)})

    return (undirected.map_batches(emit_verts, batch_format="pyarrow")
            .groupby("vertex").count())


def _orient(u, v, du, dv, n):
    """Orient each edge from lower (deg, id) to higher (deg, id);
    kb = total-order key of the head endpoint — wedge pairs must
    be ordered by the SAME (deg, id) order the orientation uses,
    or closing edges are looked up in the wrong direction.
    Key packing bound: deg*(n+1)+id needs n^2 < 2^63."""
    u_first = (du < dv) | ((du == dv) & (u < v))
    a = np.where(u_first, u, v)
    b = np.where(u_first, v, u)
    db = np.where(u_first, dv, du)
    kb = db * np.int64(n + 1) + b
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "kb": pa.array(kb)})


def _triangle_counts_partitioned(edges_ds,
                                 return_degrees: bool = False):
    """The scale path as DRIVER tables (the query-contract form):
    everything up to the final result stays distributed
    (_partitioned_datasets); only the (node, tri_count) result itself
    is collected. Scale callers use triangle_counts(out_dir=) /
    clustering_coefficients(out_dir=) instead, which write the same
    Datasets as sharded parquet without any driver collect."""
    tri_ds, deg_out = _partitioned_datasets(edges_ds,
                                            want_deg=return_degrees)
    tbl = pa.Table.from_pandas(tri_ds.to_pandas(), preserve_index=False)
    tbl = tbl.sort_by([("node", "ascending")])
    if not return_degrees:
        return tbl
    dtbl = pa.Table.from_pandas(deg_out.to_pandas(),
                                preserve_index=False)
    return tbl, dtbl.sort_by([("node", "ascending")])


def closed_triangles(undirected, deg_ds, n: int, nparts: int):
    """The oriented-wedge core shared by node counts (this module)
    and edge supports (graph/truss.py): deduped undirected id-edges +
    their distinct-neighbor degrees -> a Dataset with ONE ROW PER
    TRIANGLE, columns (a, wb, wc) = the triangle's vertex ids in the
    orientation's (deg, id) total order.

    Degrees attach via two partitioned hash joins (a dense degree
    broadcast is O(n) per worker — unusable at billion-node scale),
    then orientation is a vectorized map. Every join below passes
    left/right schemas: on degenerate graphs (all self-loops, no
    triangles) whole intermediate datasets are empty and only the
    hash_join sentinel keeps the shuffle typed (stages/join.py).
    """
    i64 = pa.int64()

    def _d2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vertex2": pa.array([], i64),
                             "cnt2": pa.array([], i64)})
        return pa.table({"vertex2": t.column("vertex"),
                         "cnt2": t.column("count()").cast(i64)})

    def _with_du(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], i64),
                             "v": pa.array([], i64),
                             "du": pa.array([], i64)})
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "du": t.column("count()").cast(i64)})

    d2 = deg_ds.map_batches(_d2, batch_format="pyarrow",
                            zero_copy_batch=True)
    deg_schema = [("vertex", i64), ("count()", i64)]
    with_du = hash_join(
        undirected, deg_ds, on=("u",), right_on=("vertex",),
        left_schema=[("u", i64), ("v", i64)], right_schema=deg_schema,
    ).map_batches(_with_du, batch_format="pyarrow", zero_copy_batch=True)
    with_dv = hash_join(
        with_du.repartition(nparts), d2, on=("v",),
        right_on=("vertex2",),
        left_schema=[("u", i64), ("v", i64), ("du", i64)],
        right_schema=[("vertex2", i64), ("cnt2", i64)])

    def _oriented(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], i64),
                             "b": pa.array([], i64),
                             "kb": pa.array([], i64)})
        return _orient(t.column("u").to_numpy(),
                       t.column("v").to_numpy(),
                       t.column("du").to_numpy().astype(np.int64),
                       t.column("cnt2").to_numpy().astype(np.int64),
                       n)

    oriented = with_dv.map_batches(
        _oriented, batch_format="pyarrow",
        zero_copy_batch=True).repartition(nparts).materialize()
    ori_schema = [("a", i64), ("b", i64), ("kb", i64)]

    # wedges: all out-neighbor pairs of each a, ordered by the
    # orientation's (deg, id) total order (kb), so the closing edge
    # (b -> c) exists in the oriented set iff the triangle exists.
    # Expressed as a partitioned SELF-JOIN on a (not per-a map_groups
    # — that was one Python call per vertex) with the kb < kb2 filter
    # selecting each unordered pair exactly once, correctly oriented.
    def _wedges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], i64),
                             "wb": pa.array([], i64),
                             "wc": pa.array([], i64)})
        return pa.table({
            "a": t.column("a"), "wb": t.column("b"),
            "wc": t.column("b2")}).filter(
                pc.less(t.column("kb"), t.column("kb2")))

    wedge_ds = hash_join(
        oriented, oriented.map_batches(
            lambda t: t.rename_columns(["a2", "b2", "kb2"]),
            batch_format="pyarrow", zero_copy_batch=True),
        on=("a",), right_on=("a2",),
        left_schema=ori_schema,
        right_schema=[("a2", i64), ("b2", i64), ("kb2", i64)],
    ).map_batches(_wedges, batch_format="pyarrow", zero_copy_batch=True)

    # close: partitioned hash join of wedges against oriented edges on
    # (b, c) — fully vectorized, no per-pair Python
    edge_keys = oriented.map_batches(
        lambda t: pa.table({"eb": t.column("a"), "ec": t.column("b")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return hash_join(wedge_ds.repartition(nparts), edge_keys,
                     on=("wb", "wc"), right_on=("eb", "ec"),
                     left_schema=[("a", i64), ("wb", i64), ("wc", i64)],
                     right_schema=[("eb", i64), ("ec", i64)])


def _partitioned_datasets(edges_ds, want_deg: bool = False):
    """The partitioned pipeline as LAZY Datasets: returns
    (tri_ds, deg_ds) with schemas (node, tri_count) / (node, deg)
    (deg_ds None unless want_deg). Dictionary, degrees, wedges,
    closing and the result assembly all stay distributed — nothing
    O(n) touches the driver."""
    nparts = default_join_partitions()
    nodes_ds = enc.assign_ids_sorted(
        enc.distinct_nodes_dataset(edges_ds)).materialize()
    n = nodes_ds.count()
    encoded = enc.encode_edges_partitioned(edges_ds, nodes_ds)
    undirected = _undirected_dedup(encoded)
    deg_ds = _vertex_degrees(undirected)
    closed = closed_triangles(undirected, deg_ds, n, nparts)
    i64 = pa.int64()

    def emit_tri_verts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64())})
        return pa.table({"vertex": pa.concat_arrays([
            t.column(c).combine_chunks().cast(pa.int64())
            for c in ("a", "wb", "wc")])})

    counts = (closed.map_batches(emit_tri_verts, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .groupby("vertex").count())

    # zero-fill + names WITHOUT a dense driver array: union a zero row
    # per node with the counts, groupby-sum, then join names back on
    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": t.column("id").cast(pa.int64()),
            "c": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        })

    def count_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({
            "vertex": t.column("vertex").cast(pa.int64()),
            "c": t.column("count()").cast(pa.int64()),
        })

    zeros = nodes_ds.map_batches(zero_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
    cnts = counts.map_batches(count_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    total = (zeros.union(cnts).groupby("vertex").sum("c")
             .repartition(nparts))
    # total is lazy (groupby output) so _sanitize can't probe it;
    # nodes_ds is materialized and auto-probes
    named = hash_join(total, nodes_ds, on=("vertex",), right_on=("id",),
                      left_schema=[("vertex", i64), ("sum(c)", i64)])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "tri_count": pa.array([], pa.int64())})
        return pa.table({"node": t.column("node"),
                         "tri_count": t.column("sum(c)").cast(pa.int64())})

    out = named.map_batches(finish, batch_format="pyarrow",
                            zero_copy_batch=True)
    if not want_deg:
        return out, None
    # (node, deg) via one name join on the already-computed degree
    # table; zero-degree nodes (self-loop-only) filled like tri_count
    dz = nodes_ds.map_batches(zero_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    dc = deg_ds.map_batches(count_rows, batch_format="pyarrow",
                            zero_copy_batch=True)
    dtot = (dz.union(dc).groupby("vertex").sum("c")
            .repartition(nparts))
    dnamed = hash_join(dtot, nodes_ds, on=("vertex",), right_on=("id",),
                       left_schema=[("vertex", i64), ("sum(c)", i64)])

    def dfinish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "deg": pa.array([], pa.int64())})
        return pa.table({"node": t.column("node"),
                         "deg": t.column("sum(c)").cast(pa.int64())})

    dout = dnamed.map_batches(dfinish, batch_format="pyarrow",
                              zero_copy_batch=True)
    return out, dout


def _ppm_from_arrays(tric: np.ndarray, deg: np.ndarray) -> np.ndarray:
    """coeff_ppm = (2e6 · tri) // (deg·(deg−1)), deg>=2 — exact
    int64 floor division (no float rounding boundary), the same
    formula the SQL oracle replays."""
    ppm = np.zeros(len(tric), np.int64)
    m = deg >= 2
    ppm[m] = (2_000_000 * tric[m]) // (deg[m] * (deg[m] - 1))
    return ppm


def clustering_coefficients(edges_ds,
                            broadcast_threshold: int = 2_000_000,
                            out_dir: str | None = None
                            ) -> "pa.Table | None":
    """Local clustering coefficient per node — a COMPOSITION of the
    triangle counter's own outputs (per-vertex triangles ÷
    simple-graph distinct-neighbor degree pairs), emitted as exact
    integer ppm for cross-engine hash parity. Returns
    (node, deg, tri_count, coeff_ppm) sorted by node.

    Broadcast path (small edge sets): the driver tables from
    triangle_counts(return_degrees=True) align row-for-row — the ppm
    math is a vectorized driver step on the query result itself.
    Partitioned path: tri and deg stay DATASETS, join on node, and
    the ppm math is a map over the join — the O(n)-row table never
    lands on the driver when ``out_dir`` is set (sharded parquet,
    sink wipe discipline; returns None).
    """
    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= broadcast_threshold:
        tri, deg_tbl = triangle_counts(
            edges_ds, broadcast_threshold=broadcast_threshold,
            return_degrees=True)
        # both tables are sorted by node over the same node set
        assert tri.column("node").combine_chunks().equals(
            deg_tbl.column("node").combine_chunks())
        tric = tri.column("tri_count").to_numpy()
        deg = deg_tbl.column("deg").to_numpy().astype(np.int64)
        out_tbl = pa.table({
            "node": tri.column("node"),
            "deg": pa.array(deg),
            "tri_count": tri.column("tri_count"),
            "coeff_ppm": pa.array(_ppm_from_arrays(tric, deg)),
        })
        if out_dir is not None:
            from .sink import sink_dataset
            sink_dataset(out_tbl, out_dir)
            return None
        return out_tbl

    s = pa.string()
    i64 = pa.int64()
    tri_ds, deg_ds = _partitioned_datasets(edges_ds, want_deg=True)
    # materialize BOTH sides before the final join (object store, not
    # driver): chaining the whole tri DAG (3 join pools) + deg DAG +
    # this join into one execution graph overlaps 5 aggregator pools,
    # which stalls on small clusters — and the inputs are the O(n)-row
    # RESULTS, the cheapest point to cut the graph
    tri_ds = tri_ds.repartition(
        default_join_partitions()).materialize()
    d2 = deg_ds.map_batches(
        lambda t: t.rename_columns(["node2", "deg"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    joined = hash_join(
        tri_ds, d2,
        on=("node",), right_on=("node2",),
        left_schema=[("node", s), ("tri_count", i64)],
        right_schema=[("node2", s), ("deg", i64)])

    def ppm_map(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], s),
                             "deg": pa.array([], i64),
                             "tri_count": pa.array([], i64),
                             "coeff_ppm": pa.array([], i64)})
        tric = t.column("tri_count").to_numpy().astype(np.int64)
        deg = t.column("deg").to_numpy().astype(np.int64)
        return pa.table({
            "node": t.column("node"),
            "deg": pa.array(deg),
            "tri_count": pa.array(tric),
            "coeff_ppm": pa.array(_ppm_from_arrays(tric, deg)),
        })

    out = joined.map_batches(ppm_map, batch_format="pyarrow",
                             zero_copy_batch=True)
    if out_dir is not None:
        from .sink import sink_dataset
        sink_dataset(out, out_dir)
        return None
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return tbl.sort_by([("node", "ascending")])


@ray.remote
def _close_chunk(a: np.ndarray, b: np.ndarray, kb: np.ndarray,
                 keys, n: int) -> np.ndarray:
    """Close wedges for a chunk of oriented edges (complete a-groups):
    per-a neighbor pairs ordered by kb, one vectorized searchsorted
    membership test against the broadcast sorted key set; returns a
    dense per-vertex triangle-count partial."""
    keys = ray.get(keys) if isinstance(keys, ray.ObjectRef) else keys
    order = np.lexsort((kb, a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.concatenate(([True], a[1:] != a[:-1])))
    ends = np.concatenate((starts[1:], [len(a)]))
    tri = np.zeros(n, dtype=np.int64)
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2:
            continue
        nb = b[s:e]
        iu, ju = np.triu_indices(k, k=1)
        wk = nb[iu] * np.int64(n) + nb[ju]
        pos = np.searchsorted(keys, wk)
        pos[pos >= len(keys)] = len(keys) - 1
        hit = keys[pos] == wk
        if hit.any():
            tri[a[s]] += int(hit.sum())
            np.add.at(tri, nb[iu][hit], 1)
            np.add.at(tri, nb[ju][hit], 1)
    return tri


def _close_broadcast(oriented, names, n: int,
                     num_tasks: int = 16) -> pa.Table:
    """Broadcast-closing fast path (edge set <= threshold, so it is
    driver-safe by construction): ship the sorted packed-key (a*n+b)
    edge set once via ray.put, fan the wedge generation out as Ray
    tasks over a-boundary-aligned chunks, merge dense partials."""
    df = oriented.select_columns(["a", "b", "kb"]).to_pandas()
    if len(df) == 0:  # edgeless after dedup (e.g. only self-loops)
        return pa.table({"node": names,
                         "tri_count": pa.array(
                             np.zeros(n, dtype=np.int64))})
    df = df.sort_values("a", kind="stable")
    ea = df["a"].to_numpy()
    eb = df["b"].to_numpy()
    ekb = df["kb"].to_numpy()
    keys_ref = ray.put(np.sort(ea * np.int64(n) + eb))

    # chunk on a-boundaries so every a-group stays whole
    bounds = [0]
    for cut in np.linspace(0, len(ea), num_tasks + 1).astype(int)[1:-1]:
        cut = int(np.searchsorted(ea, ea[min(cut, len(ea) - 1)]))
        if cut > bounds[-1]:
            bounds.append(cut)
    bounds.append(len(ea))
    refs = [_close_chunk.remote(ea[s:e], eb[s:e], ekb[s:e], keys_ref, n)
            for s, e in zip(bounds[:-1], bounds[1:]) if e > s]
    tri = np.zeros(n, dtype=np.int64)
    for p in ray.get(refs):
        tri += p
    return pa.table({"node": names, "tri_count": pa.array(tri)})
