"""Partitioned link-graph build (SURVEY.md §7 step 2, north_rule).

Takes a (src, dst) string edge Dataset and materializes the resumable
on-disk graph layout consumed by the CSR shard actors:

    graph_dir/
      meta.json                  n, num_parts, num_edges, options
      nodes/part=<j>/*.parquet   (node: string, id: int64), id % P == j
      edges/part=<j>/*.parquet   (src_id, dst_id) where src_id % P == j

(legacy layout with a single ``nodes.parquet`` is still readable)

Partitioning key: ``src_id % num_parts``. ALL out-edges of a node land
in its own shard, so out-degree / edge weights and the dangling
indicator are shard-LOCAL (no global shuffle needed for A2/A3); node
ids and rank-vector slices use the same key (part(id) = id % P,
local(id) = id // P), so rank blocks stay aligned with CSR shards
across iterations — the alignment SURVEY.md §4.2(1) calls for.

``num_parts`` is a property of the GRAPH, not the cluster: it is fixed
at build time so float reduction order — and therefore every rank
value — is bit-identical across cluster sizes.

Pipeline (streaming; the only materialized artifacts are the node
dictionary — distributed, in the object store — and the partitioned
parquet):
  M1 url filter (opt) -> distinct node dict [shuffle #1]
  -> J2 in-link-ratio filter (opt; broadcast heavy list, A1 groupby)
  -> encode to ids (broadcast join below ``broadcast_threshold``
     names, two partitioned hash joins above it — the 100-TB path)
  -> write partitioned parquet [shuffle #2]
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..stages import encode as enc
from ..stages import filters as flt


def build_graph(
    edges_ds,
    graph_dir: str,
    num_parts: int = 8,
    apply_url_filter: bool = False,
    filter_ratio: float | None = None,
    undirected: bool = False,
    encode_mode: str = "auto",
    broadcast_threshold: int = 2_000_000,
    join_partitions: int | None = None,
) -> dict:
    """Build the partitioned graph; returns the meta dict.

    ``undirected=True`` symmetrizes edges (each (s,d) also contributes
    (d,s)) — used by connected components / LPA / triangles which are
    defined on the undirected graph.

    ``encode_mode``: "broadcast" pins the small-dictionary fast path
    (collect sorted names to the driver, ``ray.put`` once, vectorized
    ``index_in`` per batch); "partitioned" forces the scale path (the
    dictionary stays a Dataset end-to-end — distributed id assignment
    + two hash joins); "auto" picks by dictionary size against
    ``broadcast_threshold``. Both paths assign the SAME ids (dense
    0..n-1 in sorted-name order), so outputs are identical.
    """
    if apply_url_filter:
        edges_ds = flt.url_filter(edges_ds)

    # The edge stream is consumed 2-3x below (distinct, optional
    # heavy-target counts, encode+write); materialize once so the
    # upstream extraction/derivation isn't recomputed per pass.
    # Blocks live in the object store and spill to disk beyond memory
    # — at 100 TB you'd instead checkpoint the raw edge table to
    # parquet here (same cost, durable), which this layout supports.
    edges_ds = edges_ds.materialize()

    # Coalesce tiny-block floods (a sorted/stitched upstream like
    # edges_from_events yields hundreds of KB-sized blocks): the
    # partitioned write below splits EVERY block by part — O(blocks
    # x parts) files — and each downstream shard load then pays
    # per-file costs. Repartition only when blocks are far smaller
    # than the ~2M-row write granularity; at real scale blocks arrive
    # big and this is a no-op.
    nrows = edges_ds.count()
    nblocks = edges_ds.num_blocks()
    avail = int(ray.cluster_resources().get("CPU", 8))
    tgt = max(avail, -(-nrows // 2_000_000))
    if nblocks > 4 * tgt:
        edges_ds = edges_ds.repartition(tgt).materialize()

    nodes_distinct = enc.distinct_nodes_dataset(edges_ds).materialize()
    n = nodes_distinct.count()
    if n == 0:
        # fail HERE with a clear message instead of letting shard
        # actors crash on a missing nodes layout downstream
        raise ValueError(
            "build_graph: no nodes survive the input/filter chain "
            "(empty edge stream, or every edge removed by the URL "
            "filter — e.g. a source-code corpus run with "
            "apply_url_filter=True)")
    use_broadcast = encode_mode == "broadcast" or (
        encode_mode == "auto" and n <= broadcast_threshold)

    if filter_ratio is not None:
        edges_ds = flt.inlink_ratio_filter(edges_ds, filter_ratio, n)

    nodes_ids_ds = None
    if use_broadcast:
        col = enc.collect_column(nodes_distinct, "node")
        names = col.take(pc.sort_indices(col))
        encoded = enc.encode_edges(edges_ds, names)
    else:
        names = None
        nodes_ids_ds = enc.assign_ids_sorted(nodes_distinct).materialize()
        encoded = enc.encode_edges_partitioned(
            edges_ds, nodes_ids_ds, num_partitions=join_partitions)

    if undirected:
        def symmetrize(t: pa.Table) -> pa.Table:
            return pa.table({
                "src_id": pa.concat_arrays(
                    [t.column("src_id").combine_chunks(),
                     t.column("dst_id").combine_chunks()]),
                "dst_id": pa.concat_arrays(
                    [t.column("dst_id").combine_chunks(),
                     t.column("src_id").combine_chunks()]),
            })
        encoded = encoded.map_batches(symmetrize, batch_format="pyarrow",
                                      zero_copy_batch=True)

    def add_part(t: pa.Table) -> pa.Table:
        part = (t.column("src_id").to_numpy() % num_parts).astype(np.int32)
        return t.append_column("part", pa.array(part))

    partitioned = encoded.map_batches(add_part, batch_format="pyarrow",
                                      zero_copy_batch=True)

    os.makedirs(graph_dir, exist_ok=True)
    edges_dir = os.path.join(graph_dir, "edges")
    # clean any previous build: write_parquet ADDS uniquely-named files,
    # so a rebuild into a reused dir would silently merge stale edges
    shutil.rmtree(edges_dir, ignore_errors=True)
    shutil.rmtree(os.path.join(graph_dir, "nodes"), ignore_errors=True)
    for f in ("nodes.parquet", "meta.json"):
        try:
            os.remove(os.path.join(graph_dir, f))
        except FileNotFoundError:
            pass
    partitioned.write_parquet(edges_dir, partition_cols=["part"])

    if use_broadcast:
        _write_nodes_partitioned(enc.nodes_table(names), graph_dir,
                                 num_parts)
    else:
        def add_node_part(t: pa.Table) -> pa.Table:
            part = (t.column("id").to_numpy() % num_parts).astype(np.int32)
            return t.append_column("part", pa.array(part))
        nodes_ids_ds.map_batches(
            add_node_part, batch_format="pyarrow", zero_copy_batch=True,
        ).write_parquet(os.path.join(graph_dir, "nodes"),
                        partition_cols=["part"])

    num_edges = sum(
        pq.read_metadata(os.path.join(root, f)).num_rows
        for root, _, fs in os.walk(edges_dir)
        for f in fs if f.endswith(".parquet"))
    meta = {
        "n": n,
        "num_parts": num_parts,
        "num_edges": num_edges,
        "undirected": undirected,
        "apply_url_filter": apply_url_filter,
        "filter_ratio": filter_ratio,
    }
    _atomic_write_json(os.path.join(graph_dir, "meta.json"), meta)
    return meta


def build_graph_from_ids(
    src_ids: "np.ndarray",
    dst_ids: "np.ndarray",
    graph_dir: str,
    num_parts: int = 32,
    node_names: "np.ndarray | None" = None,
    undirected: bool = False,
) -> dict:
    """Fast-path build for ALREADY-ENCODED integer edges (bench / re-ingest).

    At 100 TB you dictionary-encode once and keep the encoded edge
    table; re-partitioning it must not pay the string pipeline again.
    Writes the same layout as build_graph. ``node_names`` defaults to
    stringified ids.
    """
    n = int(max(src_ids.max(), dst_ids.max())) + 1 if len(src_ids) else 0
    if undirected:
        src_ids, dst_ids = (np.concatenate([src_ids, dst_ids]),
                            np.concatenate([dst_ids, src_ids]))
    os.makedirs(graph_dir, exist_ok=True)
    edges_dir = os.path.join(graph_dir, "edges")
    shutil.rmtree(edges_dir, ignore_errors=True)  # no stale-part merges
    shutil.rmtree(os.path.join(graph_dir, "nodes"), ignore_errors=True)
    part = (src_ids % num_parts).astype(np.int32)
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(num_parts + 1))
    for j in range(num_parts):
        sl = order[bounds[j]:bounds[j + 1]]
        if len(sl) == 0:
            continue
        d = os.path.join(edges_dir, f"part={j}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"src_id": pa.array(src_ids[sl]),
                      "dst_id": pa.array(dst_ids[sl])}),
            os.path.join(d, "part-00000.parquet"))
    if node_names is None:
        names = pc.cast(pa.array(np.arange(n, dtype=np.int64)), pa.string())
    else:
        names = pa.array(node_names)
    _write_nodes_partitioned(pa.table({
        "node": names,
        "id": pa.array(np.arange(n, dtype=np.int64)),
    }), graph_dir, num_parts)
    meta = {
        "n": n,
        "num_parts": num_parts,
        "num_edges": int(len(src_ids)),
        "undirected": undirected,
        "apply_url_filter": False,
        "filter_ratio": None,
        "ids_sorted_by_name": False,
    }
    _atomic_write_json(os.path.join(graph_dir, "meta.json"), meta)
    return meta


def read_meta(graph_dir: str) -> dict:
    with open(os.path.join(graph_dir, "meta.json")) as f:
        return json.load(f)


def load_part_edges(graph_dir: str, part: int) -> tuple[np.ndarray, np.ndarray]:
    """Load one shard's (src_id, dst_id) arrays (missing dir = no edges)."""
    d = os.path.join(graph_dir, "edges", f"part={part}")
    if not os.path.isdir(d):
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    tables = [pq.read_table(os.path.join(d, f),
                            columns=["src_id", "dst_id"])
              for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not tables:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    t = pa.concat_tables(tables)
    return (t.column("src_id").to_numpy().astype(np.int64),
            t.column("dst_id").to_numpy().astype(np.int64))


def _write_nodes_partitioned(nodes: pa.Table, graph_dir: str,
                             num_parts: int) -> None:
    """Write the node dictionary as nodes/part=<j>/ keyed on id % P.

    Each shard actor then reads ONLY its own slice (1/P of the names)
    instead of the full dictionary — P full reads per pool build was
    the round-1 defect (VERDICT "What's wrong" #8).
    """
    nodes_dir = os.path.join(graph_dir, "nodes")
    shutil.rmtree(nodes_dir, ignore_errors=True)
    ids = nodes.column("id").to_numpy()
    part = ids % num_parts
    for j in range(num_parts):
        sel = np.flatnonzero(part == j)
        if len(sel) == 0:
            continue
        d = os.path.join(nodes_dir, f"part={j}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(nodes.take(pa.array(sel)),
                       os.path.join(d, "part-00000.parquet"))


def _read_part_dir(d: str, columns: list[str]) -> pa.Table | None:
    if not os.path.isdir(d):
        return None
    tables = [pq.read_table(os.path.join(d, f), columns=columns)
              for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    return pa.concat_tables(tables) if tables else None


def load_part_names(graph_dir: str, part: int, num_parts: int) -> np.ndarray:
    """Node names for ids with id % P == part, ordered by local index."""
    nodes_dir = os.path.join(graph_dir, "nodes")
    if os.path.isdir(nodes_dir):
        t = _read_part_dir(os.path.join(nodes_dir, f"part={part}"),
                           ["node", "id"])
        if t is None:  # no ids hash to this part (tiny graphs)
            return np.empty(0, dtype=object)
        # order by id == local-index order (local = id // P increasing);
        # within-file order is NOT relied on (hash-join builds shuffle it)
        order = np.argsort(t.column("id").to_numpy())
        return np.asarray(
            t.column("node").to_numpy(zero_copy_only=False)[order])
    # legacy single-file layout
    t = pq.read_table(os.path.join(graph_dir, "nodes.parquet"))
    ids = t.column("id").to_numpy()
    mask = (ids % num_parts) == part
    # legacy nodes.parquet is sorted by node == sorted by id, so masked
    # order is already local-index order.
    return np.asarray(t.column("node").to_numpy(zero_copy_only=False)[mask])


def load_nodes(graph_dir: str) -> pa.Table:
    """Full (node, id) dictionary, sorted by id."""
    nodes_dir = os.path.join(graph_dir, "nodes")
    if os.path.isdir(nodes_dir):
        parts = [_read_part_dir(os.path.join(nodes_dir, d), ["node", "id"])
                 for d in sorted(os.listdir(nodes_dir))]
        t = pa.concat_tables([p for p in parts if p is not None])
        return t.take(pc.sort_indices(t.column("id")))
    return pq.read_table(os.path.join(graph_dir, "nodes.parquet"))


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)
