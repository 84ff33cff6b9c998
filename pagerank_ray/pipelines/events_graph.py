"""Derive a deterministic link graph from the ``events`` table.

Edge rule (FIXTURES.md F6): within each event_type, order events by
(ts, event_id); each event's user links to the NEXT event's user of
the same type: user_id -> next user_id. SQL-expressible with a lead()
window, which is the DuckDB oracle for the driver contract.

Node names are stringified user ids so the graph layer's string node
model applies unchanged.

Scale shape — distributed lead(): one range-partitioned SORT by
(event_type, ts, event_id), then a VECTORIZED per-block pass emitting
consecutive-pair edges where the type doesn't change, then a stitch
pass joining each block's last row to the next block's first row
(same type only). Per-block boundary rows are one row per block —
metadata-scale — so no per-group Python calls anywhere (the round-1
version funneled each event_type through one unbounded pandas group;
the round-2a version made one Python call per (type, hour) bucket).
The sort key is a total order (event_id is unique), so the output is
deterministic and identical across block layouts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


@ray.remote
def _block_edges(block: pa.Table):
    """Edges inside one sorted block + its (first, last) boundary rows.

    Returns (edge_table, first_type, first_user, last_type, last_user)
    — boundary info is O(1) per block."""
    et = block.column("event_type").to_numpy(zero_copy_only=False)
    u = block.column("user_id").to_numpy()
    if len(u) == 0:
        return (pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string())}),
                None, None, None, None)
    same = et[:-1] == et[1:]
    src = u[:-1][same]
    dst = u[1:][same]
    tbl = pa.table({
        "src": pa.array(src.astype(str), pa.string()),
        "dst": pa.array(dst.astype(str), pa.string()),
    })
    return (tbl, str(et[0]), int(u[0]), str(et[-1]), int(u[-1]))


def edges_from_events(sf_dir: str):
    """-> Dataset of (src, dst) string edges."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    # event_id is unique -> the sort key is a total order; Ray's sort
    # range-partitions into globally ordered blocks
    sorted_ds = ds.sort(["event_type", "ts", "event_id"]).materialize()
    block_refs = [ref for bundle in sorted_ds.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]
    results = [_block_edges.options(num_returns=5).remote(b)
               for b in block_refs]
    edge_refs = [r[0] for r in results]
    bounds = ray.get([x for r in results for x in r[1:]])

    # stitch: block i's last row -> block i+1's first row, same type
    # only (one candidate pair per block boundary — metadata-scale)
    src_out, dst_out = [], []
    prev_type = prev_user = None
    for i in range(0, len(bounds), 4):
        ft, fu, lt, lu = bounds[i:i + 4]
        if ft is None:
            continue  # empty block: carry prev through
        if prev_type is not None and prev_type == ft:
            src_out.append(str(prev_user))
            dst_out.append(str(fu))
        prev_type, prev_user = lt, lu
    boundary = rd.from_arrow(pa.table({
        "src": pa.array(src_out, pa.string()),
        "dst": pa.array(dst_out, pa.string())}))
    return rd.from_arrow_refs(edge_refs).union(boundary)


EDGES_FROM_EVENTS_SQL = """
SELECT CAST(user_id AS VARCHAR) AS src,
       CAST(next_user AS VARCHAR) AS dst
FROM (
    SELECT user_id,
           lead(user_id) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id) AS next_user
    FROM events
)
WHERE next_user IS NOT NULL
"""
