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

Scale note: the dictionary is O(#nodes) strings — orders of magnitude
smaller than the edge table (25k nodes vs 1.6M edges in the reference
corpus). At 10^12-file scale where even the dictionary outgrows one
worker heap, the same pipeline swaps step 3 for a sorted-range
partitioned hash join keyed on ``node`` without touching the callers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def distinct_nodes(edges_ds) -> pa.Array:
    """Sorted distinct node names over src ∪ dst (driver-side array)."""

    def partial_distinct(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            batch.column("src").combine_chunks(),
            batch.column("dst").combine_chunks(),
        ])
        return pa.table({"node": pc.unique(both)})

    nodes_ds = (
        edges_ds.map_batches(partial_distinct, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("node")
        .count()
    )
    tbl = pa.Table.from_pandas(nodes_ds.to_pandas())
    names = pc.sort_indices(tbl.column("node"))
    return tbl.column("node").take(names).combine_chunks()


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
