"""Distributed dictionary encoding of node names (SURVEY.md M2/M3/A7).

Replaces the reference's driver-resident mutable dict
(/root/reference/pagerank.py:30,81-87) with a shuffle + broadcast:

1. distinct node names = per-batch partial distinct inside map_batches
   over src ∪ dst, then a groupby-count (the distributed distinct /
   shuffle #1 of ingest);
2. ids assigned in SORTED order (dense 0..n-1) — deterministic across
   runs and cluster sizes, unlike the reference's first-seen order
   (an artifact of single-threaded loading; conformance compares ranks
   joined back to node names, never raw id order);
3. the (sorted) name array is broadcast once with ray.put and each
   encode task maps names -> ids with a vectorized Arrow ``index_in``
   (hash lookup) — a broadcast join, no per-batch reshipping.

Two encode paths, selected by dictionary size (``build_graph``'s
``encode_mode="auto"``):

* **broadcast** (small dictionaries): the sorted name array is
  ``ray.put`` once and each encode task maps names -> ids with a
  vectorized Arrow ``index_in`` (a broadcast join, no per-batch
  reshipping).
* **partitioned** (the 100-TB path): the dictionary NEVER touches the
  driver. ``distinct_nodes_dataset`` keeps the distinct set as a
  Dataset; ``assign_ids_sorted`` sorts it (range shuffle) and assigns
  dense ids 0..n-1 by per-block offsets computed from BLOCK METADATA
  ONLY (one int per block crosses to the driver); the edge table is
  encoded with two partitioned hash joins (``Dataset.join``) keyed on
  src / dst.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _partial_distinct(batch: pa.Table) -> pa.Table:
    both = pa.concat_arrays([
        batch.column("src").combine_chunks(),
        batch.column("dst").combine_chunks(),
    ])
    return pa.table({"node": pc.unique(both)})


def distinct_nodes_dataset(edges_ds):
    """Distinct node names over src ∪ dst as a DATASET (never driver-side).

    Per-batch partial distinct inside map_batches (the combiner), then
    a groupby shuffle for the global distinct.
    """
    return (
        edges_ds.map_batches(_partial_distinct, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("node")
        .count()
        .select_columns(["node"])
    )


def collect_column(ds, column: str) -> pa.Array:
    """Collect one column of a Dataset to the driver, dropping the
    EMPTY-SCHEMA blocks that shuffle stages emit for empty partitions
    (concat_tables rejects them — race-dependent on tiny inputs)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tables:
        return pa.array([], pa.string())
    return pa.concat_tables(tables).column(column).combine_chunks()


def distinct_nodes(edges_ds) -> pa.Array:
    """Sorted distinct node names collected to the driver.

    Collecting is the POINT here (this backs the `distinct_nodes`
    query, whose result IS the node list, and the broadcast encode
    fast path); graph builds above ``broadcast_threshold`` names use
    ``distinct_nodes_dataset`` + ``assign_ids_sorted`` instead.
    """
    col = collect_column(distinct_nodes_dataset(edges_ds), "node")
    return col.take(pc.sort_indices(col))


@ray.remote
def _append_id_block(block: pa.Table, offset: int) -> pa.Table:
    if block.num_rows == 0:
        # sort emits SCHEMA-LESS empty blocks on small inputs; left
        # as-is they poison the Dataset's unified schema (['id'] vs
        # ['node', 'id']) and downstream hash-join sentinels get
        # typed from the broken probe -> KeyError in the shuffle
        return pa.table({"node": pa.array([], pa.string()),
                         "id": pa.array([], pa.int64())})
    ids = np.arange(offset, offset + block.num_rows, dtype=np.int64)
    return block.append_column("id", pa.array(ids))


def assign_ids_sorted(nodes_ds):
    """Dense ids 0..n-1 in sorted-name order, assigned DISTRIBUTEDLY.

    Sorts the distinct-name Dataset (range shuffle -> globally ordered
    blocks), reads per-block row counts from block METADATA (one int
    per block on the driver), prefix-sums them into block offsets, and
    appends the id column block-parallel. Returns a Dataset with
    columns (node: string, id: int64). The name data itself never
    lands on the driver.
    """
    sorted_ds = nodes_ds.sort("node").materialize()
    blocks = [(ref, md.num_rows)
              for bundle in sorted_ds.iter_internal_ref_bundles()
              for ref, md in bundle.blocks]
    counts = [nr if nr is not None else ray.get(_block_rows.remote(ref))
              for ref, nr in blocks]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    refs = [_append_id_block.remote(ref, int(offsets[i]))
            for i, (ref, _) in enumerate(blocks)]
    return ray.data.from_arrow_refs(refs)


@ray.remote
def _block_rows(block: pa.Table) -> int:
    return block.num_rows


def encode_edges_partitioned(edges_ds, nodes_ds,
                             num_partitions: int | None = None):
    """(src, dst) -> (src_id, dst_id) via two partitioned hash joins.

    The scale path: both sides hash-shuffle on the join key, so no
    single process ever holds the dictionary. ``nodes_ds`` is the
    (node, id) Dataset from ``assign_ids_sorted``.

    Partition sizing / aggregator reservations: see stages/join.py.
    """
    from .join import default_join_partitions, hash_join

    def _rename_src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # joins emit EMPTY-SCHEMA blocks for
            #                  empty hash partitions — normalize them
            return pa.table({"dst": pa.array([], pa.string()),
                             "src_id": pa.array([], pa.int64())})
        return pa.table({
            "dst": t.column("dst"),
            "src_id": pc.cast(t.column("id"), pa.int64()),
        })

    def _rename_dst(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src_id": pa.array([], pa.int64()),
                             "dst_id": pa.array([], pa.int64())})
        return pa.table({
            "src_id": t.column("src_id"),
            "dst_id": pc.cast(t.column("id"), pa.int64()),
        })

    half = hash_join(
        edges_ds, nodes_ds, on=("src",), right_on=("node",),
        num_partitions=num_partitions,
    ).map_batches(_rename_src, batch_format="pyarrow", zero_copy_batch=True)
    # coalesce between chained joins: a join emits EMPTY-SCHEMA blocks
    # for empty hash partitions, which break the second join's FieldRef
    # resolution (same guard as _attach_pair_sizes / triangles)
    half = half.repartition(num_partitions or default_join_partitions())
    return hash_join(
        half, nodes_ds, on=("dst",), right_on=("node",),
        num_partitions=num_partitions,
        # half is lazy (downstream of a join) so _sanitize can't probe
        # its schema — pass it so the null-row seeding stays typed even
        # when a hash partition of the first join came out empty
        left_schema=[("dst", pa.string()), ("src_id", pa.int64())],
    ).map_batches(_rename_dst, batch_format="pyarrow", zero_copy_batch=True)


class EdgeEncoder:
    """Vectorized name->id encode against the broadcast sorted dictionary."""

    def __init__(self, names_ref):
        names = ray.get(names_ref) if isinstance(
            names_ref, ray.ObjectRef) else names_ref
        self._names = names if isinstance(names, pa.Array) else pa.array(names)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_id = pc.index_in(batch.column("src"), value_set=self._names)
        dst_id = pc.index_in(batch.column("dst"), value_set=self._names)
        return pa.table({
            "src_id": pc.cast(src_id, pa.int64()),
            "dst_id": pc.cast(dst_id, pa.int64()),
        })


def encode_edges(edges_ds, names: pa.Array):
    """(src, dst) string edges -> (src_id, dst_id) int64 edges."""
    names_ref = ray.put(names)
    return edges_ds.map_batches(
        EdgeEncoder, fn_constructor_args=(names_ref,),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    )


def nodes_table(names: pa.Array) -> pa.Table:
    """The `nodes` dictionary table: (node: string, id: int64)."""
    return pa.table({
        "node": names,
        "id": pa.array(np.arange(len(names), dtype=np.int64)),
    })
